"""Minimal batching loader (torch-free), threaded or process-backed.

The reference uses torch ``DataLoader`` with worker subprocesses
(``src/data.py:839-863``, 6 per GPU).  Default here is a thread-pool map +
one prefetch thread: PIL's libjpeg decode releases the GIL, and threads
avoid process startup/IPC.  For many-core TPU hosts where Python-side
transform work would serialize on the GIL, ``worker_processes=True`` runs
the same pool as spawned worker processes (datasets and transforms are
picklable).  Numpy leaves are stacked; everything else is collected into
lists.  ``None`` samples are dropped (the reference's fault-tolerant
``collate_fn``, src/data.py:124-131).
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Iterator, Optional, Sequence

import numpy as np

# Worker-process state: the dataset ships once per worker via the pool
# initializer (spawn context — fork is unsafe under a live JAX runtime).
_WORKER_DATASET = None


def _worker_init(dataset) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_getitem(i: int):
    return _WORKER_DATASET[int(i)]


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
        worker_processes: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.worker_processes = worker_processes
        self._proc_pool: Optional[ProcessPoolExecutor] = None
        self.prefetch = max(prefetch, 1)
        self.rank = rank
        self.world_size = world_size
        self.collate = collate
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle per epoch (DistributedSampler.set_epoch
        semantics, reference src/data.py:711-715)."""
        self.epoch = epoch

    def _full_indices(self) -> np.ndarray:
        """The epoch's SHARED sample order (identical on every rank: the
        shuffle rng keys on seed+epoch only), padded to a world_size
        multiple.  Rank r's feed is the ``[r::world_size]`` stride of it."""
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
        return idx

    def _indices(self) -> np.ndarray:
        """Rank-local sample order: per-step contiguous BLOCKS of the shared
        permutation (step t, rank r takes ``full[t*B*W + r*B : ... + B]``),
        not torch DistributedSampler's ``full[r::W]`` stride (documented
        deviation, PARITY.md).  Both hand every step the same global sample
        set ``full[t*B*W:(t+1)*B*W]``; blocks additionally make the
        ASSEMBLED global array (rank-major device order in
        make_array_from_process_local_data) identical to a single-process
        feed of that slice — so trajectories are process-topology-invariant
        (per-row PRNG use like dropout masks and neighbor shuffles keys on
        global row position) and 2-process runs pin against 1-process runs
        bit-comparably (tests/test_multihost.py)."""
        full = self._full_indices()
        if self.world_size == 1:
            return full
        gb = self.batch_size * self.world_size
        out = []
        for start in range(0, len(full), gb):
            g = full[start:start + gb]
            # len(g) is a world_size multiple: _full_indices pads to one,
            # and gb is one — so the ragged tail still splits evenly
            m = len(g) // self.world_size
            out.append(g[self.rank * m:(self.rank + 1) * m])
        return np.concatenate(out) if out else full

    def global_batch_indices(self) -> Iterator[np.ndarray]:
        """Per-step GLOBAL batch index arrays, rank-independent: the step-t
        global batch is the contiguous slice ``full[t*B*W:(t+1)*B*W]`` of
        the shared permutation (see ``_indices``).  Every rank can therefore
        compute per-step GLOBAL batch properties (e.g. the causal-prefix
        text bucket, which must be identical across ranks because it sets
        the local shard shape handed to make_array_from_process_local_data)
        from dataset metadata alone, with no cross-host communication.  Zip
        with ``__iter__`` after ``set_epoch`` — both derive from the same
        epoch-seeded order."""
        full = self._full_indices()
        gb = self.batch_size * self.world_size
        for t in range(self.num_batches):
            yield full[t * gb:(t + 1) * gb]

    @property
    def num_batches(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def __len__(self) -> int:
        return self.num_batches

    def _make_pool(self):
        if self.num_workers <= 0:
            return None
        if self.worker_processes:
            # One persistent pool per loader: spawned workers re-import only
            # light modules (datasets/transforms are jax-free) and hold the
            # dataset from the initializer.
            if self._proc_pool is None:
                self._proc_pool = ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=multiprocessing.get_context("spawn"),
                    initializer=_worker_init,
                    initargs=(self.dataset,),
                )
            return self._proc_pool
        return ThreadPoolExecutor(self.num_workers)

    def _fetch(self, pool, batch_idx) -> Any:
        if isinstance(pool, ProcessPoolExecutor):
            samples = list(pool.map(_worker_getitem, [int(i) for i in batch_idx]))
        elif pool is not None:
            samples = list(pool.map(self.dataset.__getitem__, batch_idx))
        else:
            samples = [self.dataset[int(i)] for i in batch_idx]
        return self.collate(samples)

    def __iter__(self) -> Iterator:
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]
        pool = self._make_pool()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()

        def put(item) -> bool:
            # A plain q.put blocks forever once the consumer stops pulling
            # (generator closed early, e.g. a steps_per_epoch-capped train
            # epoch) — the producer thread and its pool then leak per
            # early-exited iteration.  Poll the cancel flag instead.
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # Exceptions must reach the consumer: a swallowed fetch error
            # would silently truncate the epoch (every downstream consumer —
            # eval corpora, serving — would see a short dataset and produce
            # wrong results with exit code 0).
            try:
                for b in batches:
                    if not put(self._fetch(pool, b)):
                        return
                put(stop)
            except BaseException as e:  # noqa: BLE001 - relayed to consumer
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                if item is not None:
                    yield item
        finally:
            cancel.set()
            while True:  # unblock a producer mid-put
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)  # a fetch in flight finishes first; bounded
            # thread pools are per-iteration; the process pool persists so
            # repeated epochs don't respawn workers
            if pool is not None and not isinstance(pool, ProcessPoolExecutor):
                pool.shutdown(wait=False)

    def close(self) -> None:
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False)
            self._proc_pool = None

    def __del__(self):  # pragma: no cover - interpreter shutdown ordering
        try:
            self.close()
        except Exception:
            pass
