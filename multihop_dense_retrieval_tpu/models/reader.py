"""QA reader: ELECTRA encoder + span/rank/supporting-fact heads.

Re-design of mdr/qa/qa_model.py:27-109.  Heads:

  * qa_outputs Linear(h,2) → start/end logits, masked to the paragraph
    region (qa_model.py:59-63);
  * rank Linear(h,1) on a BERT-style pooler (ELECTRA has none, so the
    reference adds its own tanh pooler, qa_model.py:13-25,39-40);
  * sp Linear(h,1) over the hidden states at the `[unused1]` sentence-marker
    positions gathered by sent_offsets (qa_model.py:66-69).

Loss lives in train/qa.py (functional).  All logits returned in fp32.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import EncoderConfig
from .encoder import TransformerEncoder

NEG_INF = -1e30


class QAReader(nn.Module):
    config: EncoderConfig
    sp_pred: bool = True
    # rematerialize encoder layers in the backward pass: ELECTRA-large
    # fwd+bwd at 512 tokens needs it to fit one chip's HBM next to Adam
    # state (replaces the reference's fp16 + gradient_accumulation_steps=8
    # memory recipe, README.md:217-236).  Param tree is unchanged.
    remat: bool = False

    def setup(self):
        self.encoder = TransformerEncoder(self.config, remat=self.remat,
                                          name="encoder")
        self.pooler = nn.Dense(self.config.hidden_size, name="pooler",
                               dtype=jnp.float32)
        self.qa_outputs = nn.Dense(2, name="qa_outputs", dtype=jnp.float32)
        self.rank = nn.Dense(1, name="rank", dtype=jnp.float32)
        if self.sp_pred:
            self.sp = nn.Dense(1, name="sp", dtype=jnp.float32)

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        seq = self.encoder(batch["input_ids"], batch["attention_mask"],
                           batch.get("token_type_ids"))
        seq = seq.astype(jnp.float32)
        logits = self.qa_outputs(seq)                     # (B, L, 2)
        pmask = batch["paragraph_mask"].astype(bool)
        start_logits = jnp.where(pmask, logits[..., 0], NEG_INF)
        end_logits = jnp.where(pmask, logits[..., 1], NEG_INF)

        pooled = jnp.tanh(self.pooler(seq[:, 0]))
        rank_score = self.rank(pooled)                    # (B, 1)

        sp_score = None
        if self.sp_pred:
            offs = batch["sent_offsets"]                  # (B, S)
            gathered = jnp.take_along_axis(seq, offs[:, :, None], axis=1)
            sp_score = self.sp(gathered)[..., 0]          # (B, S)

        return {"start_logits": start_logits, "end_logits": end_logits,
                "rank_score": rank_score, "sp_score": sp_score}
