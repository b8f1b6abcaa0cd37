"""Device mesh bootstrap (the NCCL/DDP replacement).

The reference spawns one process per GPU and wires NCCL through
``torch.distributed`` (``src/main.py:113-119``).  JAX equivalents:

* single host: all local TPU chips on a 1-D ``data`` mesh axis;
* multi host: ``jax.distributed.initialize()`` (env-driven on TPU pods),
  then the same mesh over all global devices — collectives ride ICI within a
  slice and DCN across slices without code changes.

The workload's only model-state is 3 small heads (replicated); data
parallelism plus a row-sharded retrieval DB cover the reference's entire
distribution story (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import logging

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# The CLIs call maybe_init_distributed from both setup_experiment and
# setup_runtime; jax.distributed.initialize is single-shot (and once the
# backend exists, a repeat call raises a misleading 'must be called before
# any JAX calls' error), so we guard with a process-level flag.
_DIST_DONE = False


def maybe_init_distributed(cfg=None) -> None:
    """Initialize multi-host JAX if we're on a multi-host platform.  Safe to
    call unconditionally (and repeatedly) on any host.

    Two bring-up paths:

    * TPU-pod env (COORDINATOR_ADDRESS / MEGASCALE_*): auto-discovery,
    * explicit ``--distributed``: the reference's torch-style launch
      (``src/main.py:113-119`` init_process_group with ``--dist-url`` +
      RANK/WORLD_SIZE env) mapped onto ``jax.distributed.initialize``.
    """
    global _DIST_DONE
    if _DIST_DONE:
        return
    import os

    # NB: no jax.process_count()/jax.devices() probes before initialize —
    # they would eagerly create the local-only backend and poison the
    # distributed bring-up.
    def _init(**kwargs) -> bool:
        global _DIST_DONE
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            # someone else initialized first: jax raises 'should only be
            # called once' / '...already initialized' — treat as done
            msg = str(e).lower()
            if "already" not in msg and "only be called once" not in msg:
                raise
            _DIST_DONE = True
            return False
        _DIST_DONE = True
        return True

    if any(k in os.environ for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")):
        if _init():
            logging.info(
                "jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count(),
            )
        return
    if cfg is not None and cfg.distributed:
        num = int(os.environ.get("WORLD_SIZE", "1"))
        if num <= 1:
            logging.warning("--distributed set but WORLD_SIZE<=1; single-process")
            return
        pid = int(os.environ.get("RANK", "0"))
        addr = cfg.dist_url.split("//")[-1]  # tcp://host:port -> host:port
        if _init(coordinator_address=addr, num_processes=num, process_id=pid):
            logging.info(
                "jax.distributed initialized via --dist-url %s: process %d/%d",
                cfg.dist_url, jax.process_index(), jax.process_count(),
            )


def device_count() -> int:
    return jax.device_count()


def make_mesh(num_devices: int = 0, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over ``num_devices`` devices (0 = all).

    Multi-process: a request for fewer than all devices is satisfied with
    an EQUAL count per process — a global-prefix slice would hand some
    hosts zero local devices (their batch math divides by zero while the
    other hosts hang in collectives; round-3 review finding).  Oversized
    requests are clamped with a warning instead of silently truncating."""
    import numpy as np

    devs = jax.devices()
    if num_devices:
        if num_devices > len(devs):
            logging.warning("make_mesh: %d devices requested, %d available "
                            "— using all", num_devices, len(devs))
            num_devices = len(devs)
        n_proc = jax.process_count()
        if n_proc > 1:
            per, rem = divmod(num_devices, n_proc)
            if per == 0 or rem:
                raise ValueError(
                    f"--num-partitions {num_devices} must be a positive "
                    f"multiple of the process count ({n_proc}) so every "
                    "host keeps local mesh devices")
            by_proc: dict = {}
            for d in devs:
                by_proc.setdefault(d.process_index, []).append(d)
            short = {p: len(ds) for p, ds in by_proc.items() if len(ds) < per}
            if short:
                raise ValueError(
                    f"--num-partitions {num_devices} needs {per} devices on "
                    f"every process but some hosts have fewer: {short}")
            devs = [d for p in sorted(by_proc) for d in by_proc[p][:per]]
        else:
            devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def local_mesh_size(mesh: Mesh) -> int:
    """Number of this process's devices in the mesh (== mesh size on a
    single host)."""
    pid = jax.process_index()
    return sum(1 for d in mesh.devices.flat if d.process_index == pid)


def shard_batch(mesh: Mesh, x, axis_name: str = "data", allow_pad: bool = True):
    """Place a batch sharded over the mesh axis; returns (array, real_count).

    Single process: pad to a multiple of the axis (repeating the last row)
    and ``device_put`` onto the global sharding; ``real_count`` is the
    pre-padding row count.  Padding is only sound for callers that trim
    ``[:real_count]`` after the computation (the eval/serve feed,
    :func:`shard_global_batch`); a TRAINING loss has no trim point — pad
    rows would enter the InfoNCE matrix as duplicate negatives and silently
    bend the trajectory — so the train feed passes ``allow_pad=False`` to
    get the same loud refusal the multi-process branch already gives.

    Multi process: ``x`` is this process's LOCAL batch (the reference feeds
    one per-rank batch under DDP, src/main.py:483-486 + DistributedSampler
    src/data.py:797); the global array is assembled with
    ``jax.make_array_from_process_local_data`` — ``device_put`` onto a
    sharding spanning non-addressable devices cannot work.  Because padding
    rows would land at each process tail (not the global tail, where callers
    trim), the local batch must divide the local device count exactly;
    ``real_count`` is the exact global row count.
    """
    import jax.numpy as jnp

    n = x.shape[0]
    if jax.process_count() == 1:
        w = mesh.shape[axis_name]
        pad = (-n) % w
        if pad:
            if not allow_pad:
                raise ValueError(
                    f"batch of {n} rows does not divide the mesh axis "
                    f"({w} devices) and this caller cannot trim padding "
                    f"rows — size batches as a multiple of the mesh "
                    f"(drop_last) or pass allow_pad=True and trim "
                    f"[:real_count]")
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return jax.device_put(x, NamedSharding(mesh, P(axis_name))), n
    import numpy as np

    local = local_mesh_size(mesh)
    if n % local:
        raise ValueError(
            f"multi-process batches must divide the local device count "
            f"({n} rows, {local} local devices) — padding would interleave "
            f"into the global array where callers cannot trim it")
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis_name)), np.asarray(x))
    return arr, n * jax.process_count()


def shard_global_batch(mesh: Mesh, x, axis_name: str = "data"):
    """Place a batch sharded over the mesh axis when EVERY process holds the
    SAME full global batch; returns (array, real_count).

    This is the eval/serving feed: corpus and query loaders iterate the full
    dataset identically on each host (decode is duplicated, device compute
    is split), so rows keep their global order and host-side ``names`` lists
    stay aligned.  Padding (last-row repeat) lands at the global tail where
    callers trim ``[:real_count]``.  Contrast :func:`shard_batch`, the
    training feed, where each process supplies only its own per-rank rows
    (the reference's DDP DistributedSampler model, src/data.py:797).

    Single process: identical to :func:`shard_batch`.  Multi process: the
    array is assembled with ``make_array_from_callback`` — every process can
    serve any of its addressable shards from the replicated host batch, so
    no assumption about device order in the mesh is needed.
    """
    import numpy as np

    n = x.shape[0]
    if jax.process_count() == 1:
        return shard_batch(mesh, x, axis_name)
    xn = np.asarray(x)
    w = mesh.shape[axis_name]
    pad = (-n) % w
    if pad:
        xn = np.concatenate([xn, np.repeat(xn[-1:], pad, axis=0)])
    arr = jax.make_array_from_callback(
        xn.shape, NamedSharding(mesh, P(axis_name)), lambda idx: xn[idx])
    return arr, n


def fetch_global(x) -> "object":
    """Device array -> host numpy, across processes.  Fully-addressable
    arrays (single host) fetch directly; globally-sharded ones are gathered
    with ``multihost_utils.process_allgather`` so every host sees the full
    array (eval corpus passes, metric inputs)."""
    import numpy as np

    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
