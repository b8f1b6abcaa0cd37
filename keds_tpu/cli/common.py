"""Shared CLI plumbing: experiment naming/dirs, logging, writers, DB/mesh
setup (reference boilerplate from src/main.py:360-442 / eval_retrieval.py)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import List

import jax

from keds_tpu.config import Config
from keds_tpu.logging_utils import dump_params, setup_logging
from keds_tpu.parallel.mesh import make_mesh, maybe_init_distributed


def experiment_name(cfg: Config) -> str:
    if cfg.name:
        return cfg.name
    name = (f"lr={cfg.lr}_wd={cfg.wd}_agg={cfg.aggregate}_model={cfg.model}"
            f"_batchsize={cfg.batch_size}_workers={cfg.workers}")
    if cfg.time_suffix:
        name += time.strftime("_date=%Y-%m-%d-%H-%M-%S", time.gmtime())
    return name.replace("/", "-")


def setup_experiment(cfg: Config, require_fresh: bool = True) -> Config:
    # Multi-host bring-up MUST precede the first jax.process_index() below —
    # any backend probe before jax.distributed.initialize() poisons it.
    maybe_init_distributed(cfg)
    cfg.name = experiment_name(cfg)
    log_dir = os.path.join(cfg.logs, cfg.name)
    cfg.log_path = os.path.join(log_dir, "out.log")  # type: ignore[attr-defined]
    cfg.checkpoint_path = os.path.join(log_dir, "checkpoints")  # type: ignore[attr-defined]
    cfg.tensorboard_path = os.path.join(log_dir, "tensorboard")  # type: ignore[attr-defined]
    # Rank 0 owns the freshness check, and every other rank must WAIT for it
    # before creating out.log — any rank's setup_logging makes the file, so
    # without the barrier peers race each other into a false "already
    # exists" (rank-N's just-created log is indistinguishable from a stale
    # one).  The reference checks once in the launcher before spawning
    # workers (src/main.py:414-418); rank-0-check + barrier is the
    # multi-host equivalent.
    if require_fresh and cfg.resume is None:
        if jax.process_index() == 0 and os.path.exists(cfg.log_path):
            raise SystemExit(
                f"Error. Experiment already exists at {log_dir}. Use --name for a new one."
            )
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("keds_experiment_fresh_check")
    os.makedirs(cfg.checkpoint_path, exist_ok=True)
    level = logging.DEBUG if cfg.debug else logging.INFO
    setup_logging(cfg.log_path, level, rank=jax.process_index())
    dump_params(cfg, os.path.join(log_dir, "params.txt"))
    return cfg


def setup_runtime(cfg: Config):
    """Distributed init + mesh + precision config."""
    from keds_tpu.runtime import setup_jax

    setup_jax(cfg.precision)
    maybe_init_distributed(cfg)
    mesh = make_mesh(cfg.num_partitions)
    cfg.world_size = mesh.devices.size
    logging.info("mesh: %d device(s) on axis 'data' (%s)", mesh.devices.size,
                 jax.default_backend())
    return mesh


def pad_batch(arr, n: int):
    """Pad the leading dim up to ``n`` by repeating the last row — ragged
    tail batches would otherwise compile a fresh program per shape
    (~minutes each through a remote-compile tunnel; CLAUDE.md rule 6).
    Shared by the serve and demo CLIs; callers slice results back to the
    true row count."""
    import numpy as np

    arr = np.asarray(arr)
    if arr.shape[0] >= n:
        return arr
    reps = np.repeat(arr[-1:], n - arr.shape[0], axis=0)
    return np.concatenate([arr, reps], axis=0)


def compute_dtype(cfg: Config):
    import jax.numpy as jnp

    # amp/fp16 both map to bf16 on TPU (no GradScaler needed, PARITY.md).
    return jnp.float32 if cfg.precision == "fp32" else jnp.bfloat16


class ScalarWriters:
    """Fan-out scalar logging: JSONL always; TensorBoard/wandb when available
    and requested (reference src/main.py:295-314)."""

    def __init__(self, cfg: Config):
        self.sinks: List = []
        log_dir = os.path.join(cfg.logs, cfg.name)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        report = cfg.report_to or ""
        if ("tensorboard" in report or "all" in report):
            try:
                from torch.utils.tensorboard import SummaryWriter

                tb = SummaryWriter(cfg.tensorboard_path)
                self.sinks.append(lambda s, step: [tb.add_scalar(k, v, step) for k, v in s.items()])
            except Exception as e:  # pragma: no cover
                logging.warning("tensorboard unavailable: %s", e)
        if ("wandb" in report or "all" in report):
            try:
                import wandb

                wandb.init(project="zcomp", notes=cfg.wandb_notes, config=vars(cfg))
                self.sinks.append(lambda s, step: wandb.log({**s, "step": step}))
            except Exception as e:  # pragma: no cover
                logging.warning("wandb unavailable: %s", e)

    def __call__(self, scalars: dict, step: int) -> None:
        self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
        self._jsonl.flush()
        for sink in self.sinks:
            sink(scalars, step)


def load_database(cfg: Config, mesh=None):
    """Load the knowledge DB and wrap a Retriever per the distribution flags."""
    import jax.numpy as jnp

    from keds_tpu.retrieval.database import KnowledgeDB, Retriever

    dtype = jnp.float32 if cfg.precision == "fp32" else jnp.bfloat16
    db = KnowledgeDB.from_config(cfg, dtype=dtype)
    sharded = bool(cfg.db_shard and mesh is not None and mesh.devices.size > 1)
    if sharded:
        db = db.shard_over(mesh)
    backend = cfg.retrieval_backend
    if backend == "auto":
        # Round-2 sweep (BENCH_NOTES.md): XLA's matmul + TopK custom call
        # wins at every measured size (4.3 vs 6.1 ms at 0.5M, 2.5 vs 3.0 ms
        # at 50k, b32), and the kernel's tile-local lax.top_k merge cannot
        # lower on this stack.  The Pallas path stays selectable.
        backend = "xla"
    return Retriever(db, backend=backend, mesh=mesh, sharded=sharded)
