"""Minimal multi-threaded batching loader (torch-free).

The reference uses torch ``DataLoader`` with worker subprocesses; on TPU
hosts the input work here is light (precomputed features, or PIL decode for
eval corpora), so a thread-pool map + one prefetch thread keeps the device
fed without torch.  Numpy leaves are stacked; everything else is collected
into lists.  ``None`` samples are dropped (the reference's fault-tolerant
``collate_fn``, src/data.py:124-131).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator, Optional, Sequence

import numpy as np


def default_collate(samples: Sequence[Any]):
    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(default_collate([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (int, np.integer)):
        return np.asarray(samples, np.int64)
    if isinstance(first, (float, np.floating)):
        return np.asarray(samples, np.float32)
    return list(samples)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 0,
        prefetch: int = 2,
        rank: int = 0,
        world_size: int = 1,
        collate=default_collate,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.rank = rank
        self.world_size = world_size
        self.collate = collate
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle per epoch (DistributedSampler.set_epoch
        semantics, reference src/data.py:711-715)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        if self.world_size > 1:
            # pad so all ranks see the same number of batches
            per = -(-n // self.world_size)
            pad = per * self.world_size - n
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.rank::self.world_size]
        return idx

    @property
    def num_batches(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def __len__(self) -> int:
        return self.num_batches

    def _fetch(self, pool: Optional[ThreadPoolExecutor], batch_idx) -> Any:
        if pool is not None:
            samples = list(pool.map(self.dataset.__getitem__, batch_idx))
        else:
            samples = [self.dataset[int(i)] for i in batch_idx]
        return self.collate(samples)

    def __iter__(self) -> Iterator:
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]
        pool = ThreadPoolExecutor(self.num_workers) if self.num_workers > 0 else None
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for b in batches:
                    q.put(self._fetch(pool, b))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if item is not None:
                    yield item
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
