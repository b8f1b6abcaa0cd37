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


def _iterative_topk(cand_vals, cand_idx, k):
    """k rounds of masked argmax (works everywhere; ~3 VPU passes per round:
    argmax, one-hot gather of value+index, mask)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, cand_vals.shape, 1)
    out_vals, out_idx = [], []
    for _ in range(k):
        am = jnp.argmax(cand_vals, axis=1).astype(jnp.int32)
        hit = pos == am[:, None]
        # exactly one hit per row -> masked sums recover value and index
        out_vals.append(jnp.sum(jnp.where(hit, cand_vals, 0.0), axis=1))
        out_idx.append(jnp.sum(jnp.where(hit, cand_idx, 0), axis=1))
        cand_vals = jnp.where(hit, _NEG_INF, cand_vals)
    return (jnp.stack(out_vals, axis=1), jnp.stack(out_idx, axis=1))


def _kernel(q_ref, db_ref, vals_ref, idx_ref, svals, sidx, *, k: int,
            block_n: int, n_rows: int, use_lax_topk: bool):
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

    if use_lax_topk:
        # Tile-local top-k in one fused op, then a cheap (2k-wide) merge with
        # the running set.  NB: lax.top_k is an unimplemented Pallas-TPU
        # primitive on the current jax/libtpu (fails at lowering; round-2
        # sweep, BENCH_NOTES.md) — this path works in interpret mode / future
        # stacks only.
        tile_vals, tile_pos = jax.lax.top_k(scores, k)                # (TQ, k)
        tile_idx = row_base + tile_pos.astype(jnp.int32)
        cand_vals = jnp.concatenate([svals[:], tile_vals], axis=1)    # (TQ, 2k)
        cand_idx = jnp.concatenate([sidx[:], tile_idx], axis=1)
        mvals, mpos = jax.lax.top_k(cand_vals, k)
        midx = jnp.take_along_axis(cand_idx, mpos, axis=1)
        svals[:] = mvals
        sidx[:] = midx
    else:
        cand_vals = jnp.concatenate([svals[:], scores], axis=1)       # (TQ, k+TN)
        cand_idx = jnp.concatenate([sidx[:], col_ids], axis=1)
        mvals, midx = _iterative_topk(cand_vals, cand_idx, k)
        svals[:] = mvals
        sidx[:] = midx

    @pl.when(j == n_j - 1)
    def _flush():
        vals_ref[:] = svals[:]
        idx_ref[:] = sidx[:]


@functools.partial(jax.jit, static_argnames=("k", "block_q", "block_n",
                                              "interpret", "use_lax_topk"))
def mips_topk_pallas(
    queries: jax.Array,
    db: jax.Array,
    k: int,
    block_q: int = 128,
    block_n: int = 2048,
    interpret: bool = False,
    use_lax_topk: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k by inner product, fused.  queries (B, D), db (N, D) ->
    (values (B, k) f32, indices (B, k) i32).  B is padded to block_q and N to
    block_n internally."""
    B, D = queries.shape
    N = db.shape[0]
    # Don't pad small query batches up to a large tile — the merge loop's
    # VPU cost scales with the padded row count.
    block_q = min(block_q, max(16, -(-B // 16) * 16))
    Bp = -(-B // block_q) * block_q
    Np = -(-N // block_n) * block_n
    if Bp != B:
        queries = jnp.pad(queries, ((0, Bp - B), (0, 0)))
    if Np != N:
        db = jnp.pad(db, ((0, Np - N), (0, 0)))

    grid = (Bp // block_q, Np // block_n)
    kernel = functools.partial(_kernel, k=k, block_n=block_n, n_rows=N,
                               use_lax_topk=use_lax_topk)
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
