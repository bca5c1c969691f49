"""Checkpointing via orbax.

Covers both reference flavors (SURVEY.md §5):
  (a) best/last model params (train_mhop.py:207-224 torch.save state_dict)
  (b) full train state for preemption resume (mhop_trainer.py:41-78)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _path(d: str) -> str:
    return os.path.abspath(os.path.expanduser(d))


def save_pytree(directory: str, tree: Any, *, force: bool = True):
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_path(directory), tree, force=force)
    ckpt.wait_until_finished()


def restore_pytree(directory: str, template: Optional[Any] = None) -> Any:
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        template = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template) \
            if hasattr(ocp.utils, "to_shape_dtype_struct") else template
        return ckpt.restore(_path(directory), template)
    return ckpt.restore(_path(directory))


