"""Tensor-parallel sharding rules for the transformer encoder.

The reference has no tensor parallelism (SURVEY.md §2.11) — encoders are
small enough to replicate.  This module exists so the framework scales past
that: Megatron-style column/row sharding of attention heads and FFN over the
mesh `index` axis (reused as the model axis — retrieval serving wants all
chips on index rows, training can trade them for TP).  XLA inserts the
all-reduces; we only annotate.

Rules (hidden=H, heads=A, head_dim=d, ffn=F), axis := the TP mesh axis:
  attention q/k/v kernel (H, A, d)   → P(None, axis, None)   [column]
  attention q/k/v bias   (A, d)      → P(axis, None)
  attention out kernel   (A, d, H)   → P(axis, None, None)   [row]
  FFN intermediate kernel (H, F)     → P(None, axis)         [column]
  FFN intermediate bias   (F,)       → P(axis)
  FFN output kernel       (F, H)     → P(axis, None)         [row]
  everything else                    → replicated
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import INDEX_AXIS


def _spec_for_path(path, leaf, axis: str) -> P:
    names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    joined = "/".join(names)
    last = names[-1] if names else ""
    if "attention" in joined:
        if any(f"/{n}/" in joined + "/" for n in ("query", "key", "value")):
            return P(None, axis, None) if last == "kernel" else P(axis, None)
        if "/out/" in joined + "/":
            return P(axis, None, None) if last == "kernel" else P()
    if "intermediate" in joined:
        return P(None, axis) if last == "kernel" else P(axis)
    if names[-2:-1] == ["output"] and last == "kernel":
        return P(axis, None)
    return P()


def encoder_param_specs(params: Any, mesh: Mesh, axis: str = INDEX_AXIS):
    """PartitionSpec pytree matching `params` (NamedSharding leaves)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf, axis)),
        params)


def shard_params(params: Any, mesh: Mesh, axis: str = INDEX_AXIS):
    """device_put the params with TP sharding."""
    return jax.device_put(params, encoder_param_specs(params, mesh, axis))


def constrain_params(params: Any, mesh: Mesh, axis: str = INDEX_AXIS):
    """with_sharding_constraint version — usable inside jit; XLA propagates
    the layout through the whole step (grads and Adam moments follow)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, _spec_for_path(path, x, axis))),
        params)
