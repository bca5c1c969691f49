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
        import shutil

        os.makedirs(self.dir, exist_ok=True)
        state_path = os.path.join(self.dir, "trainer_state")
        new_path, old_path = state_path + ".new", state_path + ".old"
        # the orbax save is a COLLECTIVE (all pod processes join).  It
        # lands in a SIBLING dir first: orbax's own force=True rmtrees the
        # target before serializing, so saving in place would destroy the
        # only resumable checkpoint exactly during the SIGTERM grace
        # window this module exists for.  The previous state stays
        # restorable until the new one is fully on disk; each swap step
        # below is an atomic rename (maybe_restore falls back to .old for
        # the kill-between-renames window).
        ckpt.save_pytree(new_path, state)
        if jax.process_index() != 0:
            return
        # .old is only displaced when trainer_state exists to replace it:
        # after a crash between the two renames (state absent, .old = the
        # only restorable checkpoint) an unconditional leading rmtree plus
        # a kill before the promote below would leave NOTHING restorable
        if os.path.isdir(state_path):
            shutil.rmtree(old_path, ignore_errors=True)
            os.rename(state_path, old_path)
        os.rename(new_path, state_path)
        shutil.rmtree(old_path, ignore_errors=True)
        # the JSON sidecar is plain file io — process 0 only, written
        # atomically so a kill mid-write can't leave a truncated file that
        # crash-loops every subsequent requeue
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
        if not os.path.isdir(state_path):
            # killed between the two swap renames: the previous state sits
            # intact at .old — restore from it rather than starting over
            # (the next save cleans it up).  Failing that, .new: orbax
            # saves are atomic (tmp dir + rename), so a PRESENT .new dir is
            # a fully-written checkpoint — it covers the kill window after
            # save_pytree(new) but before the promote rename
            for cand in (state_path + ".old", state_path + ".new"):
                if os.path.isdir(cand):
                    state_path = cand
                    break
        if not (os.path.exists(meta_path) and os.path.isdir(state_path)):
            return None, None
        with open(meta_path) as f:
            meta = json.load(f)
        state = ckpt.restore_pytree(state_path, state_template)
        return state, meta
