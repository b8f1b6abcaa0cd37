"""Pallas TPU kernel: fused matmul + running top-k MIPS search.

This is the TPU-native replacement for the reference's Faiss-GPU exhaustive
scan (``faiss.IndexFlatL2(768).search``, ``src/main.py:74-101``,
``src/trainer.py:213``).  The unfused XLA formulation materializes a (B, N)
score matrix in HBM (256 MB for B=128, N=0.5M) — at HBM-bandwidth-bound
sizes that round trip dominates.  Here each (block_q, block_n) score tile is
produced on the MXU and immediately folded into a per-query running top-k held
in VMEM scratch, so only (B, k) values/indices ever reach HBM.

Grid: (query_tiles, db_tiles), db minor — TPU grids execute sequentially, so
VMEM scratch persists across the db sweep for a given query tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _kernel(q_ref, db_ref, vals_ref, idx_ref, svals, sidx, *, k: int, block_n: int, n_rows: int):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        svals[:] = jnp.full_like(svals, _NEG_INF)
        sidx[:] = jnp.full_like(sidx, -1)

    # (TQ, TN) score tile on the MXU; contraction over the feature dim.
    scores = jax.lax.dot_general(
        q_ref[:], db_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tq = scores.shape[0]
    row_base = j * block_n
    col_ids = row_base + jax.lax.broadcasted_iota(jnp.int32, (tq, block_n), 1)
    # Mask padding rows (db padded up to a multiple of block_n).
    scores = jnp.where(col_ids < n_rows, scores, _NEG_INF)

    # Fold the tile into the running top-k: k rounds of masked argmax over
    # the (running ∪ tile) candidate set.
    cand_vals = jnp.concatenate([svals[:], scores], axis=1)          # (TQ, k+TN)
    cand_idx = jnp.concatenate([sidx[:], col_ids], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, cand_vals.shape, 1)
    for t in range(k):
        best = jnp.max(cand_vals, axis=1)                             # (TQ,)
        am = jnp.argmax(cand_vals, axis=1).astype(jnp.int32)          # (TQ,)
        hit = pos == am[:, None]
        best_idx = jnp.sum(jnp.where(hit, cand_idx, 0), axis=1)
        svals[:, t] = best
        sidx[:, t] = best_idx
        cand_vals = jnp.where(hit, _NEG_INF, cand_vals)

    @pl.when(j == n_j - 1)
    def _flush():
        vals_ref[:] = svals[:]
        idx_ref[:] = sidx[:]


@functools.partial(jax.jit, static_argnames=("k", "block_q", "block_n", "interpret"))
def mips_topk_pallas(
    queries: jax.Array,
    db: jax.Array,
    k: int,
    block_q: int = 128,
    block_n: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k by inner product, fused.  queries (B, D), db (N, D) ->
    (values (B, k) f32, indices (B, k) i32).  B is padded to block_q and N to
    block_n internally."""
    B, D = queries.shape
    N = db.shape[0]
    Bp = -(-B // block_q) * block_q
    Np = -(-N // block_n) * block_n
    if Bp != B:
        queries = jnp.pad(queries, ((0, Bp - B), (0, 0)))
    if Np != N:
        db = jnp.pad(db, ((0, Np - N), (0, 0)))

    grid = (Bp // block_q, Np // block_n)
    kernel = functools.partial(_kernel, k=k, block_n=block_n, n_rows=N)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, D), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, D), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, k), jnp.float32),
            jax.ShapeDtypeStruct((Bp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, k), jnp.float32),
            pltpu.VMEM((block_q, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, db)
    return vals[:B], idx[:B]
