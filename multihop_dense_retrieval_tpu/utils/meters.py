"""Metric smoothing + lightweight scalar logging.

AverageMeter mirrors utils/utils.py:63-79; MetricWriter wraps tensorboardX if
available (the reference logs batch_train_loss / smoothed_train_loss /
dev_mrr, train_mhop.py:193-217) and falls back to JSONL.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n


class MetricWriter:
    """TensorBoard scalars when tensorboardX is importable, else JSONL.

    Multi-process aware: on a pod (cli/pod.py), only process 0 writes —
    every other process gets a no-op writer, matching the reference's
    rank-0 SummaryWriter gating (train_mhop.py:108-110).
    """

    def __init__(self, log_dir: str):
        self._tb = None
        self._jsonl = None
        import jax

        if jax.process_index() != 0:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter  # optional

            self._tb = SummaryWriter(log_dir)
        except ImportError:
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        elif self._jsonl is not None:
            self._jsonl.close()
