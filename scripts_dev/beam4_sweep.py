"""Beam-4 bucket/batch sweep on the real chip (VERDICT r2 item 7).

Builds the 5.2M covariance-matched int8+PCA index ONCE, then times the
beam-4 2-hop pipeline across batch sizes and hop-2 bucket configs using
bench.py's scan harness.  Buckets are multiples of 32 (PERF.md dead end:
odd 16-multiples lose 31%).  Run: python scripts_dev/beam4_sweep.py
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from bench import (_encoder_moment_factor, _make_tokens, _make_index,
                   _timed_search, measure_tunnel_overhead)
from multihop_dense_retrieval_tpu.core.config import (
    EncoderConfig, SearchConfig, HOP2_BUCKETS_5TILE, HOP2_TILE_FRACS_5TILE,
    HOP2_BUCKETS_6TILE, HOP2_TILE_FRACS_6TILE)
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.data.tokenization import TokenizerSpec
from multihop_dense_retrieval_tpu.search.beam import BeamSearcher

N_DOCS = 5_242_880
D = 768
TEXT_LEN = 300
Q_WIDTH = 40
MAX_Q_SP = 350
CHUNK = 2048
REPS = 8

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
print(f"# index built, tunnel {tunnel_s*1000:.1f} ms", file=sys.stderr)


def run(tag, batch, buckets, fracs, use_pca=True):
    scfg = SearchConfig(beam_size_1=4, beam_size_2=4, topk=4,
                        max_q_len=Q_WIDTH, max_q_sp_len=MAX_Q_SP,
                        chunk_rows=CHUNK, use_pallas=True,
                        hop2_buckets=buckets, hop2_tile_fracs=fracs,
                        use_pca=use_pca)
    s = BeamSearcher(
        encode_fn=lambda p, ids, mask, tt=None: model.apply(
            p, ids, mask, tt, method=model.encode_seq),
        params=params, index=index, text_ids=text_ids,
        text_lens=text_lens, empty=empty, spec=spec, config=scfg,
        mesh=None)
    nprng = np.random.RandomState(23)
    dt, c_s, cert = _timed_search(s, params, 4, batch, REPS, Q_WIDTH,
                                  cfg.vocab_size, nprng)
    dt -= tunnel_s
    qps = REPS * batch / dt
    print(f"{tag}: batch={batch} {dt/REPS*1000:.1f} ms/batch "
          f"{qps:.1f} q/s (compile {c_s:.0f}s, cert {cert})", flush=True)
    del s
    return qps


DEF_B, DEF_F = HOP2_BUCKETS_5TILE, HOP2_TILE_FRACS_5TILE

SWEEP = [
    ("A_default_b96", 96, DEF_B, DEF_F),
    ("B_default_b192", 192, DEF_B, DEF_F),
    ("C_6tile_b96", 96, HOP2_BUCKETS_6TILE, HOP2_TILE_FRACS_6TILE),
    ("D_6tile_b192", 192, HOP2_BUCKETS_6TILE, HOP2_TILE_FRACS_6TILE),
    ("E_downshift_b192", 192, (128, 160, 192, 224, 350),
     (.25, .25, .25, .125, .125)),
]

results = {}
for tag, batch, b, f in SWEEP:
    try:
        results[tag] = run(tag, batch, b, f)
    except Exception as e:
        print(f"{tag}: FAILED {e!r}", flush=True)
print("# done", results, flush=True)
