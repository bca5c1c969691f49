"""End-to-end QA batch/rank-width sweep on the real chip.

The measured e2e figures (PERF.md) run at batch=8 — small enough that
per-batch fixed costs (dispatch, hop-1 encode at 8 rows, top-k glue) may
dominate.  Batch is a quality-neutral knob (identical results per
question); rank_width is NOT (it truncates the rank pass) and is swept
for sensitivity information only.  Run: python scripts_dev/e2e_sweep.py
"""
import sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from bench import (_encoder_moment_factor, _make_tokens, _make_index,
                   _end2end_bench, measure_tunnel_overhead)
from multihop_dense_retrieval_tpu.core.config import (EncoderConfig,
                                                      SearchConfig)
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.data.tokenization import TokenizerSpec
from multihop_dense_retrieval_tpu.search.beam import BeamSearcher

N_DOCS = 5_242_880
D = 768
TEXT_LEN = 300
Q_WIDTH = 40
MAX_Q_SP = 350
CHUNK = 2048

cfg = EncoderConfig.roberta_base(num_layers=12,
                                 attention_scores_dtype="bfloat16")
model = MhopRetriever(cfg, cls_only=True)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.ones((1, 8), jnp.int32),
                    jnp.ones((1, 8), jnp.int32), method=model.encode_seq)
n_pad = -(-N_DOCS // CHUNK) * CHUNK
factor, rot = _encoder_moment_factor(model, params, cfg, D)
text_ids, text_lens, empty = _make_tokens(n_pad, TEXT_LEN, cfg.vocab_size)
spec = TokenizerSpec(cls_id=0, sep_id=2, pad_id=1,
                     vocab_size=cfg.vocab_size, roberta_style=True)
index = _make_index(n_pad, N_DOCS, D, "int8", factor, rot=rot)
tunnel_s = measure_tunnel_overhead()
print(f"# index built, tunnel {tunnel_s*1000:.1f} ms", file=sys.stderr,
      flush=True)

scfg = SearchConfig(beam_size_1=5, beam_size_2=5, topk=25,
                    max_q_len=Q_WIDTH, max_q_sp_len=MAX_Q_SP,
                    chunk_rows=CHUNK, use_pallas=True,
                    hop2_buckets=(), hop2_tile_fracs=(), use_pca=True)
s5 = BeamSearcher(
    encode_fn=lambda p, ids, mask, tt=None: model.apply(
        p, ids, mask, tt, method=model.encode_seq),
    params=params, index=index, text_ids=text_ids,
    text_lens=text_lens, empty=empty, spec=spec, config=scfg,
    mesh=None)

SWEEP = [
    ("b8_default", dict(batch=8)),                       # shipped baseline
    ("b16", dict(batch=16)),
    ("b32", dict(batch=32)),
    ("b16_rank128", dict(batch=16, rank_width=128)),     # sensitivity only
]

results = {}
for tag, kw in SWEEP:
    try:
        nprng = np.random.RandomState(23)
        res = _end2end_bench(s5, params, cfg, tunnel_s, nprng, **kw)
        results[tag] = res
        print(f"{tag}: {res}", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {e!r}", flush=True)
print("# done", results, flush=True)
