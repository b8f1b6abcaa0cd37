"""Fused attention kernel vs the XLA reference (interpret mode on CPU),
including padding behaviour and the custom-vjp backward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keds_tpu.ops.attention import attention_reference, flash_attention


@pytest.mark.parametrize("s,causal", [(77, True), (77, False), (257, False),
                                      (60, True), (128, False)])
def test_flash_matches_reference(s, causal):
    rng = np.random.default_rng(s)
    B, H, D = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    ref = attention_reference(q, k, v, causal)
    out = flash_attention(q, k, v, causal, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_backward_matches_reference():
    rng = np.random.default_rng(0)
    B, H, S, D = 1, 2, 33, 16
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, True, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_tower_uses_flash_when_forced(monkeypatch):
    """End-to-end: encode_text with KEDS_TPU_FLASH=1 (interpret-capable CPU
    path is exercised via the kernel's interpret fallback inside pallas on
    CPU) must equal the XLA path."""
    from keds_tpu.models import clip as mclip
    from keds_tpu.models import layers

    cfg = mclip.ClipConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, transformer_width=32, transformer_heads=2,
        transformer_layers=2,
    )
    params = mclip.init_clip(jax.random.key(0), cfg)
    text = np.zeros((2, 77), np.int32)
    text[:, 0] = 49406
    text[:, 1] = 320
    text[:, 2] = 49407
    baseline = mclip.encode_text(params, cfg, jnp.asarray(text))
    # force flash path through pallas interpret mode on CPU
    monkeypatch.setenv("KEDS_TPU_FLASH", "1")
    layers.flash_enabled.cache_clear()
    import keds_tpu.ops.attention as attn

    orig = attn.flash_attention

    def interp(q, k, v, causal=False, interpret=False):
        return orig(q, k, v, causal, True)

    monkeypatch.setattr(attn, "flash_attention", interp)
    try:
        flashed = mclip.encode_text(params, cfg, jnp.asarray(text))
    finally:
        layers.flash_enabled.cache_clear()
    np.testing.assert_allclose(np.asarray(flashed), np.asarray(baseline),
                               atol=2e-5, rtol=2e-5)


def test_vision_tower_uses_flash_despite_seq_padding(monkeypatch):
    """Regression (round-3 review): the sublane seq-padding path
    (transformer_seq_padded) must NOT demote KEDS_TPU_FLASH=1 to the
    arbitrary-mask XLA branch — the fused kernel pads to 128 and masks
    s_real internally, so a non-multiple-of-8 sequence (here S=10, like
    ViT-L's S=257) still takes the flash path and matches XLA."""
    from keds_tpu.models import clip as mclip
    from keds_tpu.models import layers

    cfg = mclip.ClipConfig(
        embed_dim=32, image_resolution=48, vision_layers=2, vision_width=64,
        vision_patch_size=16, transformer_width=32, transformer_heads=2,
        transformer_layers=2,
    )  # vision S = (48/16)^2 + 1 = 10, not a multiple of 8
    params = mclip.init_clip(jax.random.key(1), cfg)
    imgs = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 48, 48, 3)), jnp.float32)
    baseline = mclip.encode_image(params, cfg, imgs)
    monkeypatch.setenv("KEDS_TPU_FLASH", "1")
    layers.flash_enabled.cache_clear()
    import keds_tpu.ops.attention as attn

    orig = attn.flash_attention
    calls = []

    def interp(q, k, v, causal=False, interpret=False):
        calls.append(q.shape)
        return orig(q, k, v, causal, True)

    monkeypatch.setattr(attn, "flash_attention", interp)
    try:
        flashed = mclip.encode_image(params, cfg, imgs)
    finally:
        layers.flash_enabled.cache_clear()
    assert calls, "vision tower never dispatched to the flash kernel"
    assert all(s[2] == 10 for s in calls), calls  # fed UNPADDED sequences
    np.testing.assert_allclose(np.asarray(flashed), np.asarray(baseline),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("group", [1, 2, 4, 8])
def test_flash_group_blocking_matches_reference(group):
    """Head-group blocking (round-2: G heads per kernel instance) must be
    numerically identical to the reference attention for every G."""
    import jax

    from keds_tpu.ops.attention import attention_reference, flash_attention

    B, H, S, D = 2, 4, 57, 32
    kq, kk, kv = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)
    ref = attention_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, True, True, group)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_auto_group_divides_bh():
    from keds_tpu.ops.attention import _pick_group

    for bh, sp, d in ((512, 384, 64), (16, 128, 64), (6, 128, 64), (1, 384, 64)):
        g = _pick_group(bh, sp, d, 2)
        assert bh % g == 0
        # working set must respect the VMEM budget used for the choice
        assert 4 * g * sp * d * 2 * 2 + 2 * g * sp * sp * 4 <= 10 * 1024 * 1024 or g == 1


def test_flash_group_must_divide_bh():
    import jax

    from keds_tpu.ops.attention import flash_attention

    q = jax.random.normal(jax.random.key(0), (2, 4, 16, 32))
    with pytest.raises(ValueError, match="divide"):
        flash_attention(q, q, q, False, True, 3)
