"""Fused short-sequence multi-head attention (Pallas, TPU).

Motivation (measured on the bench chip, see README "dead ends" notes): at
MDR serving shapes (W <= 350, head_dim 64) the XLA attention path spends
~0.7 ms/layer on HBM round-trips of the (B, nh, W, W) score tensor and on
the (B, W, nh, d) head relayouts — ~8 ms of a 59 ms 12-layer encode at
B=192/W=192, while the matmuls themselves run near peak.  Unlike stock
flash attention (jax.experimental.pallas.ops.tpu.flash_attention — measured
SLOWER than XLA here because its online-softmax tiling is built for long
sequences), this kernel exploits that the WHOLE sequence fits in VMEM:

  * q, k, v stay in the (B, W, nh*d) projection layout — no head transpose
    ever materializes; heads are static lane slices of the 768-wide rows;
  * the (W, W) per-head score matrix lives and dies in VMEM: one fp32
    softmax (single pass — no online rescaling needed at these lengths);
  * grid over the batch; per step the kernel unrolls the nh heads.

The contraction dim is head_dim=64 (half an MXU tile), but score FLOPs are
<10% of the layer, so the bandwidth win was expected to dominate.

MEASURED (v5e, 12-layer roberta-base encode, B=192):

  * v1 per-head kernel (64-lane slices): W=192 58.7 ms vs 46.5 XLA — the
    sub-128-lane slices relayout through registers.
  * v2 head-PAIR kernel (aligned 128-lane groups, one head's half of q
    zero-masked per matmul so the full-width contraction runs at full MXU
    rate): W=192 53.8 ms, W=40 13.6 — better, still behind XLA (46.2 /
    10.0).  The per-head dot→softmax→dot chains serialize MXU and VPU
    inside the kernel, while XLA's fusion pipeline overlaps them across
    the layer graph — at W<=350 that scheduling freedom is worth more
    than the score-matrix HBM traffic this kernel avoids.

Kept as a tested experimental impl (`attention_impl="fused"`, auto-picks
the pair kernel when 2*head_dim == 128); the serving default remains
"xla".

Supports q_len != kv_len for the retriever's cls_only last layer
(q_len == 1).

Replaces the reference's torch.nn.MultiheadAttention-equivalent inside HF
BERT (the reference never touches attention internals; this is a TPU-only
serving optimization).  Numerics: scores and softmax in fp32 — matches the
encoder's attention_scores_dtype="float32" path up to ulps, and is SAFER
than the bf16-scores serving default it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

VMEM_BUDGET = 12 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, nh: int, d: int,
                 scale: float, bb: int):
    """Per-head strategy (v1): 64-lane slices.  MEASURED SLOWER than XLA —
    Mosaic relayouts the sub-128-lane slices through registers.  Kept for
    head dims that don't pair to 128 lanes; see _attn_kernel_paired."""
    for b in range(bb):
        bias = bias_ref[b, 0].astype(jnp.float32).reshape(1, -1)  # (1, W)
        for h in range(nh):
            qh = q_ref[b, :, h * d:(h + 1) * d]                # (Wq, d)
            kh = k_ref[b, :, h * d:(h + 1) * d]                # (W, d)
            vh = v_ref[b, :, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (Wq, W)
            s = s * scale + bias
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(q_ref.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (Wq, d)
            o_ref[b, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _attn_kernel_paired(q_ref, k_ref, v_ref, bias_ref, o_ref, *, nh: int,
                        d: int, scale: float, bb: int):
    """Head-PAIR strategy (v2) for 2*d == 128: slice aligned 128-lane
    groups (no register relayout), zero one head's half of q so the full
    128-lane contraction yields a single head's scores at full MXU rate,
    and combine the two heads' p·v outputs with lane masks.  2x the
    attention-einsum FLOPs of the ideal 64-contraction, but the MXU runs
    128-contractions at 2x the rate, so matmul TIME is unchanged while the
    score matrix and all head handling stay in VMEM."""
    lanes = 2 * d
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    mlo = (lane_id < d)
    dt = q_ref.dtype
    for b in range(bb):
        bias = bias_ref[b, 0].astype(jnp.float32).reshape(1, -1)  # (1, W)
        for g in range(nh // 2):
            sl = slice(g * lanes, (g + 1) * lanes)
            qg = q_ref[b, :, sl]                                # (Wq, 128)
            kg = k_ref[b, :, sl]                                # (W, 128)
            vg = v_ref[b, :, sl]
            outs = []
            for lo in (True, False):
                qh = jnp.where(mlo if lo else ~mlo, qg, jnp.zeros_like(qg))
                s = jax.lax.dot_general(
                    qh, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (Wq, W)
                s = s * scale + bias
                m = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(dt), vg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (Wq, 128)
                outs.append(o)
            out = jnp.where(mlo, outs[0], outs[1])
            o_ref[b, :, sl] = out.astype(o_ref.dtype)


def _pick_block(batch: int, wq: int, w: int, h: int, itemsize: int) -> int:
    """Largest batch block whose q/k/v/out tiles + score scratch fit VMEM."""
    for bb in (8, 4, 2, 1):
        if batch % bb:
            continue
        need = bb * (wq + 2 * w) * h * itemsize   # q + k + v tiles
        need += bb * wq * h * itemsize            # out tile
        need *= 2                                 # double buffering
        need += wq * w * 4 * 2                    # fp32 scores + exp temps
        if need <= VMEM_BUDGET:
            return bb
    return 1


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "interpret", "block_b"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: jnp.ndarray, num_heads: int,
                    interpret: bool = False, block_b: int = 0):
    """q (B, Wq, H), k/v (B, W, H) in projection layout (heads = lane
    slices), mask (B, W) nonzero where attendable.  Returns (B, Wq, H) in
    q.dtype.  Softmax/scores in fp32; scale = 1/sqrt(head_dim).
    """
    b, wq, hsz = q.shape
    w = k.shape[1]
    d = hsz // num_heads
    scale = 1.0 / float(d) ** 0.5
    # (B, 1, W): the singleton middle dim keeps the bias block's trailing
    # dims equal to the array dims, satisfying Mosaic's tiling rule for any
    # batch block size
    bias = jnp.where(mask.astype(bool), 0.0, NEG_INF) \
        .astype(jnp.float32)[:, None, :]
    bb = block_b or _pick_block(b, wq, w, hsz, jnp.dtype(q.dtype).itemsize)
    if b % bb:
        # an explicit non-divisor block_b would floor the grid and leave
        # the last B % bb output rows UNWRITTEN (uninitialized memory, no
        # error); _pick_block only returns divisors
        raise ValueError(f"block_b={bb} does not divide batch {b}")

    # head-pair kernel when two heads tile exactly one 128-lane group;
    # fall back to the per-head kernel otherwise
    paired = (num_heads % 2 == 0 and 2 * d == 128)
    kernel = _attn_kernel_paired if paired else _attn_kernel

    grid_spec = pl.GridSpec(
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, wq, hsz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, w, hsz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, w, hsz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, wq, hsz), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(kernel, nh=num_heads, d=d, scale=scale, bb=bb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, wq, hsz), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_heads * wq * w * d * 2,
            bytes_accessed=(b * (wq + 2 * w) * hsz + b * wq * hsz)
            * jnp.dtype(q.dtype).itemsize,
            transcendentals=b * num_heads * wq * w,
        ),
        interpret=interpret,
    )(q, k, v, bias)
