"""Static-shape batch loader.

Replaces torch DataLoader + samplers (scripts/train_mhop.py:156-157).  Epochs
shuffle indices with a seeded RNG; partial trailing batches are dropped in
training (static shapes) and padded-by-repeat in eval (with a `valid` mask so
metrics ignore the padding).  Prefetches with a small thread pool — host-side
tokenization overlaps device compute.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator, Optional

import numpy as np


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: Optional[bool] = None, seed: int = 0,
                 num_workers: int = 8, collate=None):
        from .mhop_dataset import mhop_collate

        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.rng = np.random.RandomState(seed)
        self.num_workers = num_workers
        self.collate = collate or mhop_collate

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else -(-n // self.bs)

    # -- data-order RNG snapshot (preemption resume) ---------------------
    # JSON-serializable Mersenne state: a resumed run replays the SAME
    # shuffle sequence an uninterrupted run would have seen.

    def rng_state(self) -> dict:
        alg, keys, pos, has_gauss, cached = self.rng.get_state()
        return {"alg": alg, "keys": np.asarray(keys).tolist(),
                "pos": int(pos), "has_gauss": int(has_gauss),
                "cached": float(cached)}

    def set_rng_state(self, st: dict):
        self.rng.set_state((st["alg"], np.asarray(st["keys"], np.uint32),
                            st["pos"], st["has_gauss"], st["cached"]))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        batches = []
        for s in range(0, n, self.bs):
            chunk = order[s:s + self.bs]
            if len(chunk) < self.bs:
                if self.drop_last:
                    continue
                pad = np.resize(chunk, self.bs)  # repeat to fill
                valid = np.zeros(self.bs, bool)
                valid[:len(chunk)] = True
                batches.append((pad, valid))
            else:
                batches.append((chunk, np.ones(self.bs, bool)))

        def make(args):
            idxs, valid = args
            batch = self.collate([self.ds[int(i)] for i in idxs])
            batch["valid"] = valid
            return batch

        if self.num_workers <= 1:
            for b in batches:
                yield make(b)
            return
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for out in pool.map(make, batches):
                yield out
