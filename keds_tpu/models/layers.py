"""Core transformer building blocks (pure functions over param pytrees).

Numerics mirror the reference CLIP blocks (``src/model/model.py:291-373``):

* LayerNorm always computes in float32 and casts back (the reference's
  fp16-safe ``LayerNorm`` subclass, ``model.py:291-297``),
* QuickGELU ``x * sigmoid(1.702 x)`` (``model.py:300-302``),
* pre-LN residual attention blocks with a 4x MLP.

Blocks are *stacked*: every per-layer parameter carries a leading layer axis
and the tower runs as one ``lax.scan``, which keeps compile time flat in depth
and lets XLA pipeline HBM weight fetches.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache()
def flash_enabled() -> bool:
    """Opt-in fused Pallas attention (KEDS_TPU_FLASH=1).

    Default OFF: at the model family's short sequences (<=257 tokens) XLA's
    compiled attention already runs the towers at the measured pure-matmul
    ceiling of the chip.  Round 2's head-group blocking recovered the whole
    round-1 deficit (599 vs 601 img/s for ViT-L/14 b32 encode; round 1's
    single-head grid was launch-bound at 263) — exact parity, so XLA stays
    the default and the blocked kernel is the starting point for
    long-sequence variants (sweep table in BENCH_NOTES.md).
    """
    env = os.environ.get("KEDS_TPU_FLASH")
    if env is not None:
        return env not in ("0", "false", "off")
    return False


def linear(x: jax.Array, w, b=None) -> jax.Array:
    """Dense layer dispatching on the weight representation: a plain array
    runs the bf16/f32 GEMM; a ``{"q": int8, "s": f32}`` dict (produced by
    :func:`keds_tpu.ops.quant.quantize_weight`) runs the W8A8 dynamic int8
    MXU path."""
    if isinstance(w, dict):
        from keds_tpu.ops.quant import int8_linear

        return int8_linear(x, w, b)
    y = jnp.dot(x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Float32-island LayerNorm: normalize in f32, return in x.dtype."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def multi_head_attention(
    x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array,
    out_w: jax.Array,
    out_b: jax.Array,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    causal: Optional[bool] = None,
) -> jax.Array:
    """Batched self-attention, (B, S, D) -> (B, S, D).

    ``qkv_w`` is (D, 3D) (fused projection), ``out_w`` is (D, D); ``mask`` is
    an additive (S, S) bias (0 / -inf causal mask for the text tower).
    Scores are accumulated and softmaxed in float32.

    ``causal`` declares the mask's *structure* (False = no mask, True =
    standard causal, None = arbitrary ``mask`` array) so the fused Pallas
    kernel can be used when the structure is known.
    """
    ctx = _attention_ctx(x, qkv_w, qkv_b, n_heads, mask, causal)
    return linear(ctx, out_w, out_b)


def _attention_ctx(
    x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    causal: Optional[bool] = None,
) -> jax.Array:
    """Attention context before the output projection, (B, S, D) -> (B, S, D).
    Shared by the full block and the pooled final block so both run
    bit-identical attention math."""
    B, S, D = x.shape
    H = n_heads
    Dh = D // H
    qkv = linear(x, qkv_w, qkv_b)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # Keep the (B, S, H, Dh) layout end to end: explicit head transposes
    # materialize full-activation copies ("data formatting" dominated the
    # non-matmul time in profiles); dot_general handles these dims in-place.
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, H, Dh)
    v = v.reshape(B, S, H, Dh)
    if causal is not None and flash_enabled():
        # The only masks in this model family are none/causal; the fused
        # kernel keeps scores+softmax in VMEM (keds_tpu/ops/attention.py).
        from keds_tpu.ops.attention import flash_attention

        ctx = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), causal,
        ).transpose(0, 2, 1, 3)
    else:
        scale = 1.0 / math.sqrt(Dh)
        # Scores are produced in the COMPUTE dtype and softmax statistics in
        # f32.  In bf16 this halves score traffic and is worth +12% encode /
        # +9% text-tower throughput on v5e (BENCH_NOTES round-3 sweep);
        # embedding cosine vs f32 scores is >0.99995 — the reference itself
        # runs scores in fp16 (model.py:927-948 casts MHA weights), so both
        # implementations round the same f32 ideal.  f32 compute (parity
        # tests) is bit-identical to the previous always-f32 path.
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=x.dtype)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return ctx.reshape(B, S, D)


def residual_block(x: jax.Array, blk: dict, n_heads: int,
                   mask: Optional[jax.Array], causal: Optional[bool] = None) -> jax.Array:
    """One pre-LN residual attention block (reference model.py:305-326)."""
    h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
    x = x + multi_head_attention(
        h, blk["qkv_w"], blk["qkv_b"], blk["out_w"], blk["out_b"], n_heads, mask,
        causal,
    )
    h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
    h = quick_gelu(linear(h, blk["fc_w"], blk["fc_b"]))
    x = x + linear(h, blk["proj_w"], blk["proj_b"])
    return x


def transformer(
    x: jax.Array,
    blocks: dict,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    causal: Optional[bool] = None,
) -> jax.Array:
    """Run stacked residual blocks with lax.scan.  ``blocks`` leaves have a
    leading layer axis."""

    def body(carry, blk):
        return residual_block(carry, blk, n_heads, mask, causal), None

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def transformer_seq_padded(
    x: jax.Array,
    blocks: dict,
    n_heads: int,
    multiple: int = 8,
) -> jax.Array:
    """:func:`transformer` (no causal mask) with the sequence padded to a
    sublane-friendly multiple and the padded keys masked out of every
    softmax.  ViT-L's S=257 is MXU-hostile; padding to 264 measures +6% on
    top of bf16 scores (+18% combined) for b32 encode on v5e (BENCH_NOTES
    round-3 sweep).  Exact for the real tokens: padded rows never enter a
    real row's softmax and the slice drops them."""
    S = x.shape[1]
    pad = (-S) % multiple
    if pad == 0 or flash_enabled():
        # No padding needed — or the opt-in fused kernel is active, which
        # pads to a 128 multiple and masks ``s_real`` internally; padding
        # here would both grow its tile and (worse) demote the dispatch to
        # the arbitrary-mask XLA path (causal=None), silently turning
        # KEDS_TPU_FLASH=1 into a no-op for the vision tower.
        return transformer(x, blocks, n_heads, causal=False)
    Sp = S + pad
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    key_mask = jnp.where(jnp.arange(Sp) < S, 0.0, -jnp.inf).astype(jnp.float32)
    out = transformer(x, blocks, n_heads, mask=key_mask, causal=None)
    return out[:, :S]


def final_block_pooled(
    x: jax.Array,
    blk: dict,
    n_heads: int,
    pool_idx,
    mask: Optional[jax.Array] = None,
    causal: Optional[bool] = None,
) -> jax.Array:
    """One residual block whose out-proj + MLP run only at the pooled row:
    (B, S, D) -> (B, D).

    Every hot encode path consumes exactly ONE token of the final block's
    output (the CLS row for the image tower, the EOT/pool row for text —
    reference model.py:414, :587-589).  QKV and the attention einsums stay
    full (they're ~25% of block FLOPs and shared with :func:`residual_block`
    via ``_attention_ctx``, which keeps the math BIT-identical — a
    single-query score einsum rounds differently at the last ulp); the
    attention-out projection and the MLP (~75% of block FLOPs) run on the
    single pooled row, whose value they cannot change: there is no
    cross-token mixing after the attention read.  Net: ~3% of a ViT-L
    encode, ~6% of a text-tower pass, exactly.

    ``pool_idx`` is a scalar or (B,) row index (already clamped by the
    caller); ``mask``/``causal`` are :func:`residual_block`'s attention-mask
    arguments, unchanged.
    """
    B, S, D = x.shape
    h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
    ctx = _attention_ctx(h, blk["qkv_w"], blk["qkv_b"], n_heads, mask, causal)
    idx = jnp.broadcast_to(jnp.asarray(pool_idx), (B,))
    take = lambda a: jnp.take_along_axis(a, idx[:, None, None], axis=1)
    x_row = take(x) + linear(take(ctx), blk["out_w"], blk["out_b"])
    h2 = layer_norm(x_row, blk["ln2_g"], blk["ln2_b"])
    h2 = quick_gelu(linear(h2, blk["fc_w"], blk["fc_b"]))
    x_row = x_row + linear(h2, blk["proj_w"], blk["proj_b"])
    return x_row[:, 0, :]


def transformer_pooled(
    x: jax.Array,
    blocks: dict,
    n_heads: int,
    pool_idx,
    mask: Optional[jax.Array] = None,
    causal: Optional[bool] = None,
) -> jax.Array:
    """:func:`transformer` whose final block runs its out-proj/MLP only at
    ``pool_idx``: (B, S, D) -> (B, D).  ``mask``/``causal`` drive every
    block exactly as in :func:`transformer`.

    The front scan indexes the FULL stacked arrays per iteration
    (``dynamic_index_in_dim`` over ``arange(L-1)``) instead of scanning a
    ``blocks[:-1]`` tree slice: XLA materializes that slice as a copy of
    ~96% of the tower's weights INSIDE the program — measured +11 ms per
    b128 ViT-L encode (x8, once per 16-row chunk), which more than erased
    the pooled tail's FLOP saving.  The indexed form measures 147.3 vs the
    sliced form's 161.3 and the monolithic scan's 150.0 ms/b128
    (BENCH_NOTES round-4, pooled-tail section)."""
    n_layers = jax.tree.leaves(blocks)[0].shape[0]

    def body(carry, i):
        blk = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            blocks)
        return residual_block(carry, blk, n_heads, mask, causal), None

    x, _ = jax.lax.scan(body, x, jnp.arange(n_layers - 1))
    last = jax.tree.map(lambda a: a[-1], blocks)
    return final_block_pooled(x, last, n_heads, pool_idx, mask, causal)


def transformer_seq_padded_pooled(
    x: jax.Array,
    blocks: dict,
    n_heads: int,
    pool_idx: int = 0,
    multiple: int = 8,
) -> jax.Array:
    """:func:`transformer_seq_padded` fused with the pooled final block:
    (B, S, D) -> (B, D) at ``pool_idx`` (CLS=0 for the image tower)."""
    S = x.shape[1]
    pad = (-S) % multiple
    if pad == 0 or flash_enabled():
        # Same dispatch rationale as transformer_seq_padded (incl. keeping
        # the opt-in flash kernel's dispatch intact — _attention_ctx is the
        # shared path, so the final block uses flash there too).
        return transformer_pooled(x, blocks, n_heads, pool_idx, causal=False)
    Sp = S + pad
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    key_mask = jnp.where(jnp.arange(Sp) < S, 0.0, -jnp.inf).astype(jnp.float32)
    return transformer_pooled(x, blocks, n_heads, pool_idx,
                              mask=key_mask, causal=None)


def transformer_collect(
    x: jax.Array,
    blocks: dict,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    causal: Optional[bool] = None,
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`transformer` but also returns every block's output,
    stacked (L, B, S, D) — the reference's ``mid_feature`` mode
    (model.py:337-342)."""

    def body(carry, blk):
        out = residual_block(carry, blk, n_heads, mask, causal)
        return out, out

    out, collected = jax.lax.scan(body, x, blocks)
    return out, collected


def unstack_blocks(blocks: dict, n_layers: int) -> list[dict]:
    """Split stacked block params into a per-layer list (for injected-fusion
    variants that interleave custom ops between specific layers)."""
    return [jax.tree.map(lambda a: a[i], blocks) for i in range(n_layers)]
