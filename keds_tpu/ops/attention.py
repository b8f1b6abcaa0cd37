"""Fused (flash-style) attention Pallas kernel for the CLIP towers.

XLA compiles softmax attention as matmul -> softmax -> matmul with the
(B, H, S, S) score tensor round-tripping through HBM: for ViT-L/14 at batch
32 that is ~0.8 GB of f32 scores per layer, ~39 GB of traffic per forward —
the dominant cost of ``encode_image`` on TPU.  The sequences here are short
(257 vision / 77 text tokens), so each (batch, head) attends over its whole
sequence inside VMEM in one kernel instance: scores and probabilities never
touch HBM.  No online-softmax streaming is needed at these lengths; this is
the degenerate (single-tile) case of flash attention.

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
    q = q_ref[0].astype(jnp.float32) * scale     # (Sp, D)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Sp, Sp)
    sp = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    valid = col < s_real
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        valid = jnp.logical_and(valid, col <= row)
    scores = jnp.where(valid, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_forward(q, k, v, causal: bool, interpret: bool):
    B, H, S, D = q.shape
    Sp = _round_up(S, 128)
    scale = 1.0 / math.sqrt(D)

    def prep(x):
        x = x.reshape(B * H, S, D)
        if Sp != S:
            x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
        return x

    qf, kf, vf = prep(q), prep(k), prep(v)
    kernel = functools.partial(_kernel, scale=scale, causal=causal, s_real=S)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[pl.BlockSpec((1, Sp, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, Sp, D), lambda i: (i, 0, 0)),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, causal: bool = False, interpret: bool = False):
    """(B, H, S, Dh) fused attention.  S is padded to a lane multiple inside;
    extra keys are masked, extra query rows dropped."""
    return _flash_forward(q, k, v, causal, interpret)


def _fwd(q, k, v, causal, interpret):
    return _flash_forward(q, k, v, causal, interpret), (q, k, v)


def _bwd(causal, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, causal), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
