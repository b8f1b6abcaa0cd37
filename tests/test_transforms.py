"""Image preprocessing tests: shapes, normalization, TargetPad geometry,
region transform, and device-side preprocessing consistency."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from keds_tpu.transforms import (  # noqa: E402
    CLIP_MEAN,
    CLIP_STD,
    TargetPad,
    device_preprocess,
    image_transform,
    region_transform,
)


def _img(w, h, value=128):
    return Image.fromarray(np.full((h, w, 3), value, np.uint8))


def test_val_transform_shape_and_normalization():
    tf = image_transform(32, is_train=False)
    out = tf(_img(100, 60, value=255))
    assert out.shape == (32, 32, 3)
    expected = (1.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out[16, 16], expected, atol=1e-5)


def test_val_transform_resizes_shorter_side():
    tf = image_transform(32, is_train=False)
    # a 200x50 image: shorter side (50) -> 32, width -> 128, center crop 32
    out = tf(_img(200, 50))
    assert out.shape == (32, 32, 3)


def test_train_transform_is_random_but_seedable():
    import random

    tf1 = image_transform(32, is_train=True, rng=random.Random(0))
    tf2 = image_transform(32, is_train=True, rng=random.Random(0))
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    np.testing.assert_array_equal(tf1(img), tf2(img))


def test_target_pad():
    pad = TargetPad(1.25)
    # ratio 2.0 > 1.25 -> pad width//... out ratio <= 1.25
    out = pad(_img(200, 100))
    w, h = out.size
    assert max(w, h) / min(w, h) <= 1.3
    # ratio below target untouched
    out2 = pad(_img(110, 100))
    assert out2.size == (110, 100)


def test_region_transform_no_crop():
    tf = region_transform(32)
    out = tf(_img(13, 57))
    assert out.shape == (32, 32, 3)


def test_device_preprocess_matches_host_for_uniform_image():
    # uniform images are resize-invariant: host and device paths must agree
    arr = np.full((1, 48, 64, 3), 200, np.uint8)
    dev = np.asarray(device_preprocess(arr, n_px=32))
    host = image_transform(32, is_train=False)(Image.fromarray(arr[0]))
    np.testing.assert_allclose(dev[0], host, atol=1e-2)


def test_u8_transform_matches_host_normalize():
    """normalize=False + device_normalize == the host-normalized f32 path."""
    import jax.numpy as jnp
    from PIL import Image

    from keds_tpu.transforms import device_normalize, image_transform

    rng = np.random.default_rng(7)
    img = Image.fromarray(rng.integers(0, 256, (100, 160, 3), np.uint8))
    f32 = image_transform(32, is_train=False)(img)
    u8 = image_transform(32, is_train=False, normalize=False)(img)
    assert u8.dtype == np.uint8 and u8.shape == (32, 32, 3)
    dev = np.asarray(device_normalize(jnp.asarray(u8[None])))[0]
    np.testing.assert_allclose(dev, f32, atol=1e-6)


def test_device_normalize_float_passthrough():
    import jax.numpy as jnp

    from keds_tpu.transforms import device_normalize

    x = jnp.ones((2, 4, 4, 3), jnp.float32) * 0.25
    out = device_normalize(x)
    assert out is x
