"""Pooled-final-block exactness: the fused tail must equal the full tower.

Every hot encode path consumes exactly one token of the final transformer
block's output (CLS for the image tower, the EOT/pool row for text), so
``layers.final_block_pooled`` runs the last block's out-proj/MLP at that
single row (attention stays full — shared with the full path).  These tests pin the pooled tail bit-for-bit against the full
path (``transformer_seq_padded`` + slice / ``_text_transformer`` +
``_pool_project``, both still live for the token-sequence APIs), across
dtypes, the int8-quantized towers, clamped pool indices, and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import keds_tpu.models.clip as mclip
from keds_tpu.models.clip import (
    ClipConfig,
    _pool_project,
    _text_transformer,
    causal_mask,  # noqa: F401  (documentation of what the pooled mask mirrors)
    encode_text,
    encode_text_img,
    encode_text_img_retrieval,
    encode_text_img_train,
    encode_text_img_vis,
    encode_image,
    eot_indices,
    init_clip,
    splice_tokens,
    vision_tokens,
)
from keds_tpu.models.layers import layer_norm, transformer_seq_padded
from keds_tpu.ops.quant import quantize_clip_blocks

CFG = ClipConfig(
    embed_dim=32,
    image_resolution=28,
    vision_layers=3,
    vision_width=64,
    vision_patch_size=14,
    context_length=16,
    vocab_size=100,
    transformer_width=64,
    transformer_heads=4,
    transformer_layers=3,
)
SPLIT_ID = 7  # stand-in '*' token id


def _params(dtype=jnp.float32):
    return init_clip(jax.random.PRNGKey(0), CFG, dtype)


def _full_encode_image(params, images):
    """The pre-pooled-tail encode_image (full final block, then slice)."""
    v = params["visual"]
    x = vision_tokens(params, CFG, images)
    x = transformer_seq_padded(x, v["blocks"], CFG.vision_heads)
    cls = layer_norm(x[:, 0, :], v["ln_post_g"], v["ln_post_b"])
    return jnp.dot(cls, v["proj"].astype(cls.dtype))


def _full_text(params, x, pool_idx):
    x = _text_transformer(params, CFG, x)
    return _pool_project(params, x, pool_idx)


def _images(n=2):
    k = jax.random.PRNGKey(1)
    return jax.random.normal(k, (n, 28, 28, 3), jnp.float32)


def _tokens(eots=(5, 9)):
    """Token rows with a '*' at position 3 and EOT at the given positions."""
    rows = []
    for e in eots:
        row = np.full((CFG.context_length,), 2, np.int32)
        row[0] = 1  # SOT stand-in
        row[3] = SPLIT_ID
        row[e] = CFG.eot_id
        row[e + 1:] = 0
        rows.append(row)
    return jnp.asarray(np.stack(rows))


def _assert_match(got, want, dtype):
    """f32/int8: bit-exact.  bf16: the final block now compiles OUTSIDE the
    lax.scan, and XLA's fusion keeps different intermediates in f32 across
    that boundary — same f32 ideal, different last-ulp bf16 rounding (the
    same class as the shipped bf16-scores change, BENCH_NOTES round-3).
    Isolated empirically: the pooled block itself is bit-exact in bf16 when
    fed the same carry; only the scan-boundary fusion differs."""
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    if dtype == jnp.float32:
        np.testing.assert_array_equal(got, want)
        return
    gn = got / np.linalg.norm(got, axis=-1, keepdims=True)
    wn = want / np.linalg.norm(want, axis=-1, keepdims=True)
    cos = np.sum(gn * wn, axis=-1)
    assert cos.min() > 0.999, f"bf16 pooled-tail cosine {cos.min()}"


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_encode_image_pooled_matches_full(dtype):
    params = _params(dtype)
    images = _images()
    got = encode_image(params, CFG, images)
    want = _full_encode_image(params, images)
    _assert_match(got, want, dtype)


def test_encode_image_pooled_matches_full_int8():
    params = quantize_clip_blocks(_params())
    images = _images()
    got = encode_image(params, CFG, images)
    want = _full_encode_image(params, images)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_encode_text_pooled_matches_full(dtype):
    params = _params(dtype)
    text = _tokens((5, 12))
    got = encode_text(params, CFG, text)
    x = params["text"]["tok_emb"][text]
    want = _full_text(params, x, eot_indices(text, CFG.eot_id))
    _assert_match(got, want, dtype)


def test_encode_text_pooled_matches_full_int8():
    params = quantize_clip_blocks(_params())
    text = _tokens((5, 12))
    got = encode_text(params, CFG, text)
    x = params["text"]["tok_emb"][text]
    want = _full_text(params, x, eot_indices(text, CFG.eot_id))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _pseudo(b, k):
    return jax.random.normal(jax.random.PRNGKey(3), (b, k, CFG.transformer_width))


def test_encode_text_img_matches_full():
    params = _params()
    text = _tokens((5, 5))  # fixed prompt: same EOT every row
    toks = _pseudo(2, 3)
    got = encode_text_img(params, CFG, text, toks)
    eot = eot_indices(text, CFG.eot_id)
    x = params["text"]["tok_emb"][text]
    x = splice_tokens(x, toks, eot[0], n_replace=0)
    want = _full_text(params, x, eot + 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("k", [2, 3])
def test_encode_text_img_retrieval_matches_full(k):
    params = _params()
    text = _tokens((9, 9))
    toks = _pseudo(2, k)
    got = encode_text_img_retrieval(params, CFG, text, toks, SPLIT_ID)
    eot = eot_indices(text, CFG.eot_id)
    star = jnp.argmax((text[0] == SPLIT_ID).astype(jnp.int32))
    x = params["text"]["tok_emb"][text]
    x = splice_tokens(x, toks, star, n_replace=1)
    want = _full_text(params, x, eot + (k - 1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_encode_text_img_train_matches_full():
    params = _params()
    rows = np.full((2, CFG.context_length), 2, np.int32)
    rows[:, 0] = 1
    rows[:, 3:6] = SPLIT_ID  # K=3 in-place slots
    rows[:, 10] = CFG.eot_id
    rows[:, 11:] = 0
    text = jnp.asarray(rows)
    toks = _pseudo(2, 3)
    got = encode_text_img_train(params, CFG, text, toks, SPLIT_ID)
    eot = eot_indices(text, CFG.eot_id)
    star = jnp.argmax((text[0] == SPLIT_ID).astype(jnp.int32))
    x = params["text"]["tok_emb"][text]
    x = splice_tokens(x, toks, star, n_replace=3)
    want = _full_text(params, x, eot)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_encode_text_img_vis_matches_full():
    params = _params()
    text = _tokens((6, 11))
    tok = _pseudo(2, 1)[:, 0, :]
    got = encode_text_img_vis(params, CFG, text, tok, SPLIT_ID)
    eot = eot_indices(text, CFG.eot_id)
    is_star = (text == SPLIT_ID).astype(jnp.int32)
    pos = jnp.argmax(is_star, axis=1)
    x = params["text"]["tok_emb"][text]
    x = splice_tokens(x, tok[:, None, :], pos, n_replace=1)
    want = _full_text(params, x, eot)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pool_index_clamp_matches_full():
    """EOT at the last slot + splice shift walks past S-1; both paths clamp
    to the last kept token (PARITY.md repair)."""
    params = _params()
    text = _tokens((CFG.context_length - 1, CFG.context_length - 1))
    toks = _pseudo(2, 3)
    got = encode_text_img(params, CFG, text, toks)
    eot = eot_indices(text, CFG.eot_id)
    x = params["text"]["tok_emb"][text]
    x = splice_tokens(x, toks, eot[0], n_replace=0)
    want = _full_text(params, x, eot + 3)  # _pool_project clamps internally
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pooled_tail_gradients_match_full():
    """Head training backprops through the frozen text tower into the
    pseudo-tokens (reference src/trainer.py:198-259) — the pooled tail must
    carry identical gradients."""
    params = _params()
    text = _tokens((9, 9))
    toks = _pseudo(2, 3)

    def loss_pooled(tk):
        return jnp.sum(encode_text_img_retrieval(params, CFG, text, tk, SPLIT_ID) ** 2)

    def loss_full(tk):
        eot = eot_indices(text, CFG.eot_id)
        star = jnp.argmax((text[0] == SPLIT_ID).astype(jnp.int32))
        x = params["text"]["tok_emb"][text]
        x = splice_tokens(x, tk, star, n_replace=1)
        return jnp.sum(_full_text(params, x, eot + 2) ** 2)

    g_pooled = jax.grad(loss_pooled)(toks)
    g_full = jax.grad(loss_full)(toks)
    np.testing.assert_allclose(np.asarray(g_pooled), np.asarray(g_full),
                               rtol=1e-6, atol=1e-6)


def test_truncated_prefix_still_exact():
    """The causal-prefix truncation (round-4) composes with the pooled tail:
    a truncated run equals the full-length run on the kept positions."""
    params = _params()
    text = _tokens((5, 5))
    toks = _pseudo(2, 3)
    short = encode_text_img(params, CFG, text[:, :12], toks)
    full = encode_text_img(params, CFG, text, toks)
    np.testing.assert_array_equal(np.asarray(short), np.asarray(full))
