"""W8A8 dynamic int8 quantization for the CLIP tower GEMMs.

The v5e MXU runs s8 x s8 -> s32 at ~2x its bf16 rate, and the towers are
>90% matmul time at ~54% MFU (BENCH_NOTES.md), so moving the four residual
block projections (fused QKV, attention out, MLP fc, MLP proj) onto the int8
path converts ~96% of block FLOPs:

    per ViT block, matmul FLOPs = 24*S*D^2  vs  attention einsums 4*S^2*D
    -> einsums are S/(6D) = 257/6144 ~ 4% for ViT-L/14.

Scheme (inference only):

* **weights**: symmetric per-output-channel int8, quantized once at load
  (:func:`quantize_weight`) — scale_j = max_i |W_ij| / 127,
* **activations**: symmetric per-token int8, quantized dynamically in-graph
  (:func:`int8_linear`) — abs-max + round are VPU elementwise work that XLA
  fuses into the surrounding ops,
* **everything else** (LayerNorm islands, softmax, attention score/value
  einsums, biases, embeddings, final projections) stays bf16/f32: accuracy
  lives in the normalization numerics, speed lives in the big GEMMs.

This mirrors the int8-with-exact-rescore retrieval design
(:mod:`keds_tpu.ops.topk`): quantize where the FLOPs are, keep the
numerically delicate 4% exact.  Reference counterpart: the fp16 autocast
inference path around ``src/eval_utils.py:636-710`` — the reference has no
int8 mode; this is a TPU-native capability on top of parity.
"""

from __future__ import annotations

import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Pytree key layout of a quantized linear: {"q": int8 (..., d_in, d_out),
# "s": f32 (..., 1, d_out)}.  Leading axes (the lax.scan layer axis) are
# preserved so stacked-block pytrees scan unchanged.
QUANT_KEYS = frozenset({"q", "s"})


def is_quantized(w) -> bool:
    return isinstance(w, dict) and QUANT_KEYS.issuperset(w.keys()) and "q" in w


def quantize_weight(w: jax.Array) -> dict:
    """Symmetric per-output-channel int8: w ~ q * s, reducing over the
    second-to-last (input) axis.  Works on stacked (L, d_in, d_out) weights."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_weight(wq: dict, dtype=jnp.float32) -> jax.Array:
    return (wq["q"].astype(jnp.float32) * wq["s"]).astype(dtype)


def quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token (last-axis) symmetric int8: x ~ q * s with s (..., 1) f32."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(xf / s).astype(jnp.int8)
    return q, s


def int8_matmul(x_q: jax.Array, w_q: jax.Array) -> jax.Array:
    """s8 x s8 -> s32 contraction of x's last axis with w's second-to-last.
    ``w_q`` may carry leading batch axes only if x does not (plain 2-D w is
    the scan-body case)."""
    return jax.lax.dot_general(
        x_q, w_q,
        (((x_q.ndim - 1,), (w_q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


_BLOCK_GEMM_KEYS = ("qkv_w", "out_w", "fc_w", "proj_w")


def quantize_clip_blocks(params: dict) -> dict:
    """Quantize the residual-block GEMM weights of a CLIP param pytree
    (both towers) to int8; everything else (LN, biases, embeddings, CLS/pos,
    patch embedding, final projections) is kept as-is.

    The returned tree has the same structure with each quantized weight
    replaced by ``{"q": int8, "s": f32}`` — :func:`keds_tpu.models.layers.
    linear` dispatches on that shape, and the stacked (L, ...) layout still
    scans.  Inference only: the towers are frozen in this model family
    (reference src/main.py:160-166 freezes CLIP), so no gradient path is
    needed through the quantized weights."""
    out = dict(params)
    for tower in ("visual", "text"):
        if tower not in params:
            continue
        tw = dict(params[tower])
        if "blocks" not in tw:
            # ModifiedResNet visual towers have no transformer blocks —
            # leave them unquantized (the text tower still converts).
            logging.warning(
                "quantize_clip_blocks: %r tower has no transformer blocks "
                "(ResNet backbone?); leaving it unquantized", tower)
            continue
        blocks = dict(tw["blocks"])
        for key in _BLOCK_GEMM_KEYS:
            blocks[key] = quantize_weight(blocks[key])
        tw["blocks"] = blocks
        out[tower] = tw
    return out


def maybe_quantize_clip(params: dict, mode: str) -> dict:
    """Config-level entry: ``mode`` is the --quant-towers value
    ('none' | 'int8').  Single dispatch point for every CLI/engine."""
    if mode == "int8":
        return quantize_clip_blocks(params)
    if mode not in (None, "", "none"):
        raise ValueError(f"unknown --quant-towers mode {mode!r}")
    return params


@jax.custom_vjp
def _i8_affine(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """f32 result of the W8A8 dynamic matmul: dequant(x_q @ q) with folded
    activation/weight scales."""
    x_q, a_s = quantize_activations(x)
    acc = int8_matmul(x_q, q)
    # a_s (..., 1) and s (1, d_out) broadcast against (..., d_out).
    return acc.astype(jnp.float32) * a_s * s


def _i8_affine_fwd(x, q, s):
    # residuals must be JAX types: carry x's dtype as a zero-size array
    return _i8_affine(x, q, s), (q, s, jnp.zeros((0,), x.dtype))


def _i8_affine_bwd(res, g):
    # Straight-through: the forward approximates x @ (q * s), so the input
    # cotangent is g @ dequantized-W^T.  The int cast inside the forward
    # would otherwise zero the gradient — the text tower carries pseudo-token
    # gradients during head training (reference trainer backprops through
    # the frozen text encoder, src/trainer.py:198-259).
    q, s, x_proto = res
    w_deq = q.astype(jnp.float32) * s        # (d_in, d_out)
    dx = jax.lax.dot_general(
        g.astype(jnp.float32), w_deq,
        (((g.ndim - 1,), (1,)), ((), ())),
    ).astype(x_proto.dtype)
    return dx, np.zeros(q.shape, jax.dtypes.float0), jnp.zeros_like(s)


_i8_affine.defvjp(_i8_affine_fwd, _i8_affine_bwd)


def int8_linear(x: jax.Array, wq: dict, b: jax.Array | None = None) -> jax.Array:
    """W8A8 dynamic linear: quantize ``x`` per token, int8 MXU GEMM, dequant
    with the folded (activation x weight) scale, add bias in f32, return in
    ``x.dtype``."""
    w = wq["q"]
    if w.ndim > 2:
        # stacked weights used outside lax.scan: collapse leading axes is the
        # caller's job; inside scan the slice is already 2-D.
        raise ValueError("int8_linear expects a 2-D weight slice; "
                         f"got {w.shape}")
    out = _i8_affine(x, w, wq["s"].reshape(1, -1))
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)
