"""Token-cost diagnostic for the variable-hop stop cascade (r5).

The on-chip bench measured the cascade FLAT at stop-rate 30% and SLOWER
at 60% (unified_qps_stop{0,30,60} = 861/862/772, BENCH r5 run 1) even
though 30-60% of pass-2 rows skip encoding tile-wise.  Hypothesis: with
inactive rows sorted to the TAIL, the surviving long rows shift into
earlier (narrower) positional tiles, whose lax.cond then escalates to
the FULL-width branch — spending what the skipped tail tiles saved.

This script replays _encode_hop2's exact tile logic on the bench's
length distribution (synth_doc_lens lognormal) with a counting fake
encoder, printing Σ rows×width per stop rate for:
  * tail-sort (shipped r5.0)  — inactive rows sort past every length;
  * front-sort (candidate fix) — inactive rows sort BEFORE every length,
    so active rows shift to LOWER positional quantiles (never escalate)
    and the narrow leading tiles are the ones that skip.

Run: python scripts_dev/cascade_diag.py   (CPU, seconds)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def simulate(lens, buckets, fracs, active, front_sort):
    """Replicates search/beam.py::_encode_hop2's sort/tile/width logic,
    returning (executed_tokens, n_escalated_tiles, n_skipped_tiles)."""
    n, L = len(lens), 350
    sizes = [int(round(f * n)) for f in fracs]
    sizes[-1] = n - sum(sizes[:-1])
    bounds = np.cumsum([0] + sizes)
    key_inactive = -1 if front_sort else L + 1
    keys = np.where(active, lens, key_inactive)
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    tokens, escalated, skipped = 0, 0, 0
    for t in range(len(buckets)):
        lo, hi = bounds[t], bounds[t + 1]
        tile_keys = keys_s[lo:hi]
        real = tile_keys[(tile_keys >= 0) & (tile_keys <= L)]
        if real.size == 0:
            skipped += 1
            continue
        w = min(buckets[t], L)
        tile_max = int(real.max())
        if tile_max <= w:
            tokens += (hi - lo) * w
        else:
            tokens += (hi - lo) * L
            escalated += 1
    return tokens, escalated, skipped


def main():
    from bench import synth_doc_lens
    from multihop_dense_retrieval_tpu.core.config import default_hop2_tiling

    rng = np.random.RandomState(0)
    bsz, beam1 = 192, 4
    n_nt = bsz * (beam1 - 1)
    buckets, fracs = default_hop2_tiling(n_nt, 350)
    print(f"pass-2 rows {n_nt}, tiling {buckets} @ {fracs}")
    doc = np.asarray(synth_doc_lens(rng, n_nt))
    q = rng.randint(8, 40, size=bsz)
    lens = np.minimum(np.repeat(q, beam1 - 1) + doc + 3, 350)

    base = None
    for rate in (0.0, 0.3, 0.6):
        stopped = rng.rand(bsz) < rate
        active = ~np.repeat(stopped, beam1 - 1)
        row = {}
        for front in (False, True):
            tok, esc, skp = simulate(lens, buckets, fracs, active, front)
            row[front] = (tok, esc, skp)
        if base is None:
            base = row[False][0]
        print(f"stop {rate:.0%}: tail-sort {row[False][0]:7d} tok "
              f"({row[False][0]/base:.2f}x, esc {row[False][1]}, "
              f"skip {row[False][2]}) | front-sort {row[True][0]:7d} tok "
              f"({row[True][0]/base:.2f}x, esc {row[True][1]}, "
              f"skip {row[True][2]})")


if __name__ == "__main__":
    main()
