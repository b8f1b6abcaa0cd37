"""W8A8 int8 tower quantization (keds_tpu/ops/quant.py).

Validates the quantized inference path against the f32 towers: elementwise
linear error, end-to-end embedding cosine, retrieval-neighbor overlap, and
gradient flow through the straight-through estimator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keds_tpu.models import clip as mclip
from keds_tpu.models.layers import linear
from keds_tpu.ops.quant import (
    dequantize_weight,
    int8_linear,
    quantize_clip_blocks,
    quantize_weight,
)

CFG = mclip.ClipConfig(
    embed_dim=64, image_resolution=32, vision_layers=3, vision_width=128,
    vision_patch_size=16, transformer_width=64, transformer_heads=2,
    transformer_layers=3,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / den


def test_weight_roundtrip():
    w = jax.random.normal(jax.random.key(0), (5, 96, 192)) * 0.3
    wq = quantize_weight(w)
    assert wq["q"].dtype == jnp.int8 and wq["q"].shape == w.shape
    assert wq["s"].shape == (5, 1, 192)
    err = np.abs(np.asarray(dequantize_weight(wq) - w))
    # per-channel symmetric int8: max error <= scale/2 per channel
    bound = np.asarray(wq["s"]) / 2 + 1e-7
    assert (err <= bound).all()


def test_int8_linear_close_to_f32():
    kx, kw, kb = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(kx, (4, 17, 96))
    w = jax.random.normal(kw, (96, 192)) * 0.2
    b = jax.random.normal(kb, (192,))
    ref = x @ w + b
    out = int8_linear(x, quantize_weight(w), b)
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02, rel


def test_linear_dispatch_plain_weights_identical():
    kx, kw = jax.random.split(jax.random.key(2))
    x = jax.random.normal(kx, (3, 8, 32))
    w = jax.random.normal(kw, (32, 16))
    np.testing.assert_array_equal(np.asarray(linear(x, w)), np.asarray(x @ w))


@pytest.mark.parametrize("tower", ["image", "text"])
def test_quantized_tower_cosine(tower):
    params = mclip.init_clip(jax.random.key(3), CFG, dtype=jnp.float32)
    params_q = quantize_clip_blocks(params)
    if tower == "image":
        x = jax.random.normal(jax.random.key(4), (8, 32, 32, 3))
        ref = mclip.encode_image(params, CFG, x)
        out = mclip.encode_image(params_q, CFG, x)
    else:
        rng = np.random.default_rng(5)
        text = np.zeros((8, 77), np.int32)
        text[:, 0] = 49406
        text[:, 1:9] = rng.integers(1, 49000, (8, 8))
        text[:, 9] = CFG.eot_id
        ref = mclip.encode_text(params, CFG, jnp.asarray(text))
        out = mclip.encode_text(params_q, CFG, jnp.asarray(text))
    cos = _cosine(out, ref)
    assert cos.min() > 0.99, cos


def test_quantized_retrieval_neighbor_overlap():
    """Top-k neighbors retrieved with quantized-tower features must overlap
    heavily with the f32-tower neighbors (the eval-protocol guarantee)."""
    from keds_tpu.ops.topk import mips_topk

    params = mclip.init_clip(jax.random.key(6), CFG, dtype=jnp.float32)
    params_q = quantize_clip_blocks(params)
    x = jax.random.normal(jax.random.key(7), (16, 32, 32, 3))
    db = jax.random.normal(jax.random.key(8), (2048, CFG.embed_dim))
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)

    def nbrs(p):
        f = mclip.encode_image(p, CFG, x)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        _, idx = mips_topk(f, db, 16)
        return np.asarray(idx)

    a, b = nbrs(params), nbrs(params_q)
    overlap = np.mean([
        len(set(a[i]) & set(b[i])) / 16.0 for i in range(a.shape[0])
    ])
    assert overlap > 0.9, overlap


def test_ste_gradient_flows():
    """d(int8_linear)/dx is finite and aligned with the f32 gradient — the
    text tower carries pseudo-token gradients during head training."""
    kx, kw = jax.random.split(jax.random.key(9))
    x = jax.random.normal(kx, (4, 64))
    w = jax.random.normal(kw, (64, 32)) * 0.2
    wq = quantize_weight(w)

    g_q = jax.grad(lambda x_: jnp.sum(jnp.tanh(int8_linear(x_, wq))))(x)
    g_f = jax.grad(lambda x_: jnp.sum(jnp.tanh(x_ @ w)))(x)
    assert np.isfinite(np.asarray(g_q)).all()
    cos = _cosine(np.asarray(g_q).ravel()[None], np.asarray(g_f).ravel()[None])
    assert cos[0] > 0.98, cos


def test_quantize_clip_blocks_skips_resnet_visual(caplog):
    """RN backbones have no visual transformer blocks: the visual tower is
    left unquantized with a warning; the text tower still converts."""
    import logging

    params = mclip.init_clip(jax.random.key(10), CFG, dtype=jnp.float32)
    params["visual"] = {"dummy_conv": params["visual"]["patch_w"]}
    with caplog.at_level(logging.WARNING):
        out = quantize_clip_blocks(params)
    assert "unquantized" in caplog.text
    assert "dummy_conv" in out["visual"]
    assert isinstance(out["text"]["blocks"]["qkv_w"], dict)  # quantized
