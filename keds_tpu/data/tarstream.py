"""Tar-shard streaming dataset (torch/webdataset-free).

Rebuild of the reference's WebDataset pipeline (``src/data.py:78-231,
875-953``): brace-expanded shard lists, shard + sample shuffling, grouping of
tar members into samples by key prefix (non-throwing, tolerating duplicate
suffixes across shard boundaries like the reference's
``group_by_keys_nothrow``), sample decoding with log-and-continue fault
tolerance, node/worker splitting, and fixed-size batching with a
``with_epoch``-style batch budget.

The reference feeds ``{00000..00331}.tar`` CC3M shards with an external
caption map (``cc3m_have*.pkl``); here the caption map is any
``{key: caption}`` mapping supplied by the caller.
"""

from __future__ import annotations

import io
import logging
import os
import random
import re
import tarfile
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np


def braceexpand(pattern: str) -> List[str]:
    """Expand one ``{00000..00099}`` (or ``{a,b,c}``) range in a shard URL."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if m:
        lo, hi = m.group(1), m.group(2)
        width = len(lo)
        return [
            pattern[: m.start()] + str(i).zfill(width) + pattern[m.end():]
            for i in range(int(lo), int(hi) + 1)
        ]
    m = re.search(r"\{([^{}]*,[^{}]*)\}", pattern)
    if m:
        return [
            pattern[: m.start()] + part + pattern[m.end():]
            for part in m.group(1).split(",")
        ]
    return [pattern]


def base_plus_ext(path: str):
    """Split 'dir/abc.image_byte' -> ('dir/abc', 'image_byte') (lowercased
    extension); None for hidden/invalid members."""
    m = re.match(r"^((?:.*/)?[^.]+)\.([^/]*)$", path)
    if not m:
        return None, None
    return m.group(1), m.group(2).lower()


def group_tar_samples(members: Iterable, handler=None) -> Iterator[Dict[str, bytes]]:
    """Group (name, bytes) pairs into {'__key__', suffix: bytes} samples.
    A repeated suffix starts a new sample instead of raising (the reference's
    nothrow grouping, src/data.py:88-120)."""
    current: Optional[Dict[str, object]] = None
    for fname, data in members:
        prefix, suffix = base_plus_ext(fname)
        if prefix is None:
            continue
        if current is None or prefix != current["__key__"] or suffix in current:
            if current is not None and len(current) > 1:
                yield current  # type: ignore[misc]
            current = {"__key__": prefix}
        current[suffix] = data
    if current is not None and len(current) > 1:
        yield current  # type: ignore[misc]


def iter_tar(path: str, handler=None) -> Iterator:
    try:
        with tarfile.open(path, mode="r|*") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                f = tf.extractfile(member)
                if f is None:
                    continue
                yield os.path.basename(member.name), f.read()
    except Exception as exn:  # log-and-continue (src/data.py:83-86)
        if handler is None or handler(exn):
            logging.warning("tar stream error in %s (%r); continuing", path, exn)
        else:
            raise


class ShuffleBuffer:
    """Streaming reservoir shuffle (webdataset-style bufsize/initial)."""

    def __init__(self, bufsize: int, initial: int, rng: random.Random):
        self.bufsize, self.initial, self.rng = bufsize, initial, rng

    def __call__(self, src: Iterable) -> Iterator:
        buf: List = []
        for sample in src:
            buf.append(sample)
            if len(buf) < max(self.initial, 1):
                continue
            if len(buf) >= self.bufsize:
                yield buf.pop(self.rng.randrange(len(buf)))
        self.rng.shuffle(buf)
        yield from buf


class TarShardDataset:
    """Iterable (image, caption-tokens) stream over tar shards.

    Mirrors the reference configuration (src/data.py:938-953):
    shard shuffle, sample shuffle buffer (5000), byte decode via
    ``decode_image``, caption lookup by ``__key__`` via ``caption_map``,
    drop-on-error, node/worker interleaving, fixed batch size, and an
    epoch budget (``num_batches``) derived from ``train_num_samples``.
    """

    def __init__(
        self,
        urls: str | Sequence[str],
        *,
        batch_size: int,
        decode_image: Callable[[bytes], Optional[np.ndarray]],
        caption_map: Optional[Dict[str, object]] = None,
        tokenize: Optional[Callable] = None,
        image_key: str = "image_byte",
        shuffle_shards: bool = True,
        shuffle_buffer: int = 5000,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        train_num_samples: int = 2_803_766,  # reference default, src/data.py:880
        partial_batches: bool = False,
        resampled: bool = False,
        upsampling_factors: Optional[str | Sequence[float]] = None,
        workers: int = 0,
        worker_processes: bool = False,
    ):
        """``urls`` may name several ``::``-separated sources (open_clip
        convention inherited by the reference flag surface).

        ``resampled`` (``--dataset-resampled``): instead of one shuffled
        pass over the shard list, shards are drawn i.i.d. WITH replacement,
        deterministically per (seed, rank, epoch) — so every epoch sees a
        fresh shard mixture and no shards-per-node divisibility constraint
        applies (reference src/data.py:884-920 drops the shard-count
        assertion in this mode).  ``upsampling_factors`` weights the draw
        per source (``--train-data-upsampling-factors "1::2"``) and
        requires ``resampled=True``.
        """
        if isinstance(urls, str):
            sources = [braceexpand(u) for u in urls.split("::")]
        else:
            sources = [list(urls)]
        self.shards = [s for src in sources for s in src]
        if upsampling_factors is not None and upsampling_factors != "":
            if isinstance(upsampling_factors, str):
                factors = [float(x) for x in upsampling_factors.split("::")]
            else:
                factors = [float(x) for x in upsampling_factors]
            if len(factors) != len(sources):
                raise ValueError(
                    f"--train-data-upsampling-factors has {len(factors)} "
                    f"entries but --train-data names {len(sources)} sources")
            if not resampled:
                raise ValueError(
                    "--train-data-upsampling-factors requires "
                    "--dataset-resampled (weights only apply to the "
                    "with-replacement shard draw)")
            self.shard_weights: Optional[List[float]] = [
                f for f, src in zip(factors, sources) for _ in src
            ]
        else:
            self.shard_weights = None
        self.resampled = resampled
        if world_size > 1 and not resampled and len(self.shards) < world_size:
            raise ValueError("number of shards must be >= number of nodes")
        self.batch_size = batch_size
        self.decode_image = decode_image
        self.caption_map = caption_map or {}
        self.tokenize = tokenize
        self.image_key = image_key
        self.shuffle_shards = shuffle_shards
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.partial_batches = partial_batches
        self.workers = workers
        self.worker_processes = worker_processes
        self.epoch = 0
        self._pool = None       # persistent decode pool (see _get_pool)
        self._pool_fn = None
        global_batch = batch_size * world_size
        self.num_batches = train_num_samples // global_batch
        self.num_samples = self.num_batches * global_batch

    def __getstate__(self):
        # spawned process workers receive a pickled copy of the dataset
        # (initargs); the executor itself must not ride along
        d = dict(self.__dict__)
        d["_pool"] = None
        d["_pool_fn"] = None
        return d

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _samples(self) -> Iterator[dict]:
        if self.resampled:
            # deterministic per (seed, rank, epoch): every rank draws its own
            # i.i.d. shard sequence; the epoch budget in __iter__ bounds it
            rng = random.Random(f"{self.seed}:{self.rank}:{self.epoch}")

            def shard_stream() -> Iterator[str]:
                while True:
                    yield rng.choices(self.shards, weights=self.shard_weights, k=1)[0]
        else:
            rng = random.Random(self.seed + self.epoch)
            shards = list(self.shards)
            if self.shuffle_shards:
                rng.shuffle(shards)
            shards = shards[self.rank::self.world_size]
            if self.world_size > 1 and not self.partial_batches:
                # Multi-rank training: `rank::world_size` hands ranks UNEQUAL
                # shard (and sample) counts, so a finite stream would end
                # early on the short ranks while every rank must produce the
                # same num_batches — the long rank then blocks forever in a
                # collective for a step the short rank never issues
                # (round-3 review finding).  Cycle the rank's shard list so
                # the epoch budget is always reachable — webdataset's
                # repeat()+with_epoch semantics (reference data.py:916-953);
                # some samples may repeat within an epoch on short ranks.
                def shard_stream() -> Iterator[str]:
                    while True:
                        yield from shards
            else:
                def shard_stream() -> Iterator[str]:
                    return iter(shards)

        def raw():
            for shard in shard_stream():
                yield from group_tar_samples(iter_tar(shard))

        yield from ShuffleBuffer(self.shuffle_buffer, self.shuffle_buffer // 5, rng)(raw())

    def _decode(self, sample: dict) -> Optional[tuple]:
        key = os.path.basename(str(sample["__key__"]))
        raw = sample.get(self.image_key)
        if raw is None:
            return None
        try:
            img = self.decode_image(raw)
        except Exception as exn:
            logging.warning("decode error for %s (%r); dropping", key, exn)
            return None
        if img is None:
            return None
        cap = self.caption_map.get(key)
        if cap is None:
            logging.warning("no caption for %s; dropping", key)
            return None
        if self.tokenize is not None:
            cap = self.tokenize([str(cap)])[0]
        return img, cap

    def _decoded(self) -> Iterator[Optional[tuple]]:
        """Decoded sample stream.  With ``workers`` > 0, decode runs in a
        thread (or, with ``worker_processes``, spawned-process) pool with a
        bounded order-preserving in-flight window — the analog of the
        reference's dataloader worker decode (src/data.py:839-863); serial
        decode would starve the jitted step ~7:1 at ViT-L raw-training
        rates."""
        if self.workers <= 0:
            for sample in self._samples():
                yield self._decode(sample)
            return
        import collections

        pool, fn = self._get_pool()
        window = max(2 * self.batch_size, 4 * self.workers)
        inflight: collections.deque = collections.deque()
        try:
            for sample in self._samples():
                inflight.append(pool.submit(fn, sample))
                if len(inflight) >= window:
                    yield inflight.popleft().result()
            while inflight:
                yield inflight.popleft().result()
        finally:
            # The consumer stops mid-stream at the epoch budget (always, in
            # resampled mode) — cancel the queued window but KEEP the pool:
            # spawning fresh process workers (and re-shipping the caption
            # map) every epoch costs seconds (round-3 review finding).
            for f in inflight:
                f.cancel()

    def _get_pool(self):
        """Lazily create — and reuse across epochs — the decode pool."""
        if self._pool is None:
            import multiprocessing
            from concurrent.futures import (ProcessPoolExecutor,
                                            ThreadPoolExecutor)

            if self.worker_processes:
                self._pool = ProcessPoolExecutor(
                    self.workers,
                    mp_context=multiprocessing.get_context("spawn"),
                    initializer=_tar_worker_init, initargs=(self,),
                )
                self._pool_fn = _tar_worker_decode
            else:
                self._pool = ThreadPoolExecutor(self.workers)
                self._pool_fn = self._decode
        return self._pool, self._pool_fn

    def close(self) -> None:
        """Shut the persistent decode pool down (idempotent)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # best-effort; explicit close() preferred
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator[tuple]:
        images: List = []
        caps: List = []
        produced = 0
        # No-progress guard: the multi-rank shard stream CYCLES so a short
        # rank can always reach the epoch budget — but if every sample on a
        # rank is undecodable (wrong caption map / image key), cycling
        # would spin forever.  Fail loudly after a long run of consecutive
        # drops instead.  NOT scaled by the full dataset (a CC3M-sized limit
        # burned ~12M failed decodes before raising — round-3 advisor
        # finding), but big enough to skip a few whole shards: one corrupt
        # tar in an otherwise healthy set must not abort the run mid-epoch.
        per_shard = self.num_samples // max(len(self.shards), 1)
        drop_limit = max(10_000, 8 * self.batch_size * max(self.workers, 1),
                         4 * per_shard)
        dropped_streak = 0
        for out in self._decoded():
            if produced >= self.num_batches:
                return
            if out is None:
                dropped_streak += 1
                if dropped_streak >= drop_limit:
                    raise RuntimeError(
                        f"{dropped_streak} consecutive samples dropped "
                        "without one valid decode — check --caption-map / "
                        "image key / shard contents")
                continue
            dropped_streak = 0
            images.append(out[0])
            caps.append(out[1])
            if len(images) == self.batch_size:
                yield np.stack(images), np.stack(caps)
                images, caps = [], []
                produced += 1
        if images and produced < self.num_batches and self.partial_batches:
            yield np.stack(images), np.stack(caps)


class _PilJpegDecoder:
    """Picklable byte -> array decoder (process decode workers receive the
    dataset — decoder included — via the pool initializer)."""

    def __init__(self, n_px: int, is_train: bool, normalize: bool):
        from keds_tpu.transforms import image_transform

        self.tf = image_transform(n_px, is_train=is_train, normalize=normalize)

    def __call__(self, raw: bytes):
        from PIL import Image

        return self.tf(Image.open(io.BytesIO(raw)))


def pil_jpeg_decoder(n_px: int = 224, is_train: bool = True,
                     normalize: bool = True) -> Callable:
    """Byte -> array decoder using the host PIL pipeline (reference
    my_decoder_kv, src/data.py:866-871).  ``normalize=False`` emits uint8
    for the device-preprocess wire format (normalization happens in-graph
    via transforms.device_normalize)."""
    return _PilJpegDecoder(n_px, is_train, normalize)


# Process-decode worker state (ships once per worker via the initializer;
# per-task pickling of the dataset would re-send the caption map each call).
_TAR_WORKER_DS = None


def _tar_worker_init(ds) -> None:
    global _TAR_WORKER_DS
    _TAR_WORKER_DS = ds


def _tar_worker_decode(sample):
    return _TAR_WORKER_DS._decode(sample)
