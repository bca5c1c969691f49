"""Preemption-safe full-trainer-state checkpointing.

TPU-pod equivalent of the reference's submitit protocol
(mdr/retrieval/mhop_trainer.py:41-117): on preemption the trainer serializes
its complete state (params, optimizer, step, epoch, best metric, data-order
RNG) and a requeued process resumes exactly where it left off.  Here the
state is one orbax pytree + a small JSON sidecar; `maybe_restore` is called
at startup (mirrors _init_state reloading checkpoint.pth,
mhop_trainer.py:197-202).
"""

from __future__ import annotations

import json
import os
import signal
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from ..core import checkpoint as ckpt


class PreemptionCheckpointer:
    def __init__(self, directory: str):
        self.dir = directory
        self._preempted = False

    # -- signal-based preemption hook (SLURM sends SIGTERM/SIGUSR1) -------

    def install_signal_handler(self, signals=(signal.SIGTERM,)):
        for sig in signals:
            signal.signal(sig, self._on_signal)

    def _on_signal(self, signum, frame):
        self._preempted = True

    @property
    def preempted(self) -> bool:
        return self._preempted

    # -- state io ----------------------------------------------------------

    def save(self, state: Any, *, epoch: int, best_metric: float,
             rng_state: Optional[Dict] = None):
        os.makedirs(self.dir, exist_ok=True)
        # the orbax save is a COLLECTIVE (all pod processes join); the JSON
        # sidecar is plain file io — process 0 only, written atomically so a
        # kill mid-write can't leave a truncated file that crash-loops every
        # subsequent requeue (the exact failure this module exists to avoid)
        ckpt.save_pytree(os.path.join(self.dir, "trainer_state"), state)
        if jax.process_index() != 0:
            return
        meta_path = os.path.join(self.dir, "trainer_meta.json")
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch, "best_metric": best_metric,
                       "rng_state": rng_state}, f)
        os.replace(tmp, meta_path)

    def maybe_restore(self, state_template: Any):
        """Returns (state, meta) if a checkpoint exists, else (None, None)."""
        meta_path = os.path.join(self.dir, "trainer_meta.json")
        state_path = os.path.join(self.dir, "trainer_state")
        if not (os.path.exists(meta_path) and os.path.isdir(state_path)):
            return None, None
        with open(meta_path) as f:
            meta = json.load(f)
        state = ckpt.restore_pytree(state_path, state_template)
        return state, meta
