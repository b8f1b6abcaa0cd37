"""Image preprocessing.

Host path (PIL, parity with the reference torchvision pipelines
``src/model/clip.py:107-123`` and ``src/utils.py:20-42``):

* val:   Resize(shorter->n_px, BICUBIC) -> CenterCrop(n_px) -> RGB ->
         scale to [0,1] -> CLIP mean/std normalize
* train: RandomResizedCrop(n_px, scale=(0.9, 1.0), BICUBIC) -> RGB -> ...
* optional TargetPad(1.25) aspect-ratio padding (``--target-pad``).

Device path (:func:`device_preprocess`): batched uint8 HWC tensors are
resized/normalized on-TPU with ``jax.image`` — the streaming-preprocessing
fast path for corpus encoding (decode on host, everything else on device).

Arrays are NHWC float32 (the JAX towers take NHWC; the reference is NCHW).
"""

from __future__ import annotations

import math
import random
from typing import Callable, Optional

import numpy as np

try:
    from PIL import Image

    _BICUBIC = Image.BICUBIC
except Exception:  # pragma: no cover
    Image = None
    _BICUBIC = None

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _to_array(img) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def _to_u8(img) -> np.ndarray:
    """RGB uint8 HWC — the wire format of the device-preprocess path (4x
    less tunnel/PCIe traffic than f32; normalization happens in-graph via
    :func:`device_normalize`)."""
    return np.asarray(img.convert("RGB"), np.uint8)


def _resize_shorter(img, n_px: int):
    w, h = img.size
    if w <= h:
        new = (n_px, max(1, round(h * n_px / w)))
    else:
        new = (max(1, round(w * n_px / h)), n_px)
    return img.resize(new, _BICUBIC)


def _center_crop(img, n_px: int):
    w, h = img.size
    left = (w - n_px) // 2
    top = (h - n_px) // 2
    return img.crop((left, top, left + n_px, top + n_px))


class TargetPad:
    """Pad images whose aspect ratio exceeds ``target_ratio`` out to that
    ratio (combiner's padding augmentation, reference src/utils.py:20-42)."""

    def __init__(self, target_ratio: float = 1.25):
        self.target_ratio = target_ratio

    def __call__(self, img):
        w, h = img.size
        actual = max(w, h) / min(w, h)
        if actual < self.target_ratio:
            return img
        scaled = max(w, h) / self.target_ratio
        hp = max(int((scaled - w) / 2), 0)
        vp = max(int((scaled - h) / 2), 0)
        out = Image.new(img.mode, (w + 2 * hp, h + 2 * vp), 0)
        out.paste(img, (hp, vp))
        return out


def _random_resized_crop(img, n_px: int, scale=(0.9, 1.0),
                         ratio=(3.0 / 4.0, 4.0 / 3.0),
                         rng: Optional[random.Random] = None):
    rng = rng or random
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            crop = img.crop((left, top, left + cw, top + ch))
            return crop.resize((n_px, n_px), _BICUBIC)
    # fallback: center crop (torchvision behaviour)
    img = _resize_shorter(img, n_px)
    return _center_crop(img, n_px)


class _ImageTransform:
    """Picklable PIL-image transform (process-pool decode workers need to
    ship the dataset — and its transform — to worker processes)."""

    def __init__(self, n_px: int, is_train: bool, target_pad: Optional[float],
                 rng: Optional[random.Random], normalize: bool):
        self.n_px = n_px
        self.is_train = is_train
        self.pad = TargetPad(target_pad) if target_pad else None
        self.rng = rng
        self.normalize = normalize

    def __call__(self, img):
        if self.pad is not None:
            img = self.pad(img)
        if self.is_train:
            img = _random_resized_crop(img, self.n_px, rng=self.rng)
        else:
            img = _resize_shorter(img, self.n_px)
            img = _center_crop(img, self.n_px)
        return _to_array(img) if self.normalize else _to_u8(img)


def image_transform(n_px: int, is_train: bool = False,
                    target_pad: Optional[float] = None,
                    rng: Optional[random.Random] = None,
                    normalize: bool = True) -> Callable:
    """PIL image -> normalized float32 HWC array, or (``normalize=False``)
    resized/cropped uint8 HWC for the device-preprocess path."""
    return _ImageTransform(n_px, is_train, target_pad, rng, normalize)


class _RegionTransform:
    def __init__(self, n_px: int, normalize: bool):
        self.n_px = n_px
        self.normalize = normalize

    def __call__(self, img):
        img = img.resize((self.n_px, self.n_px), _BICUBIC)
        return _to_array(img) if self.normalize else _to_u8(img)


def region_transform(n_px: int, normalize: bool = True) -> Callable:
    """COCO region-query transform: resize to (n_px, n_px) directly, no crop
    (reference src/eval_retrieval.py:311-314)."""
    return _RegionTransform(n_px, normalize)


def device_normalize(images):
    """In-graph tail of the preprocessing pipeline: uint8 HWC batches are
    scaled to [0,1] and CLIP-normalized in f32 on device; float inputs (the
    host-normalized parity path) pass through unchanged.  Trace-time dtype
    dispatch keeps the float program identical to the pre-u8 pipeline."""
    import jax.numpy as jnp

    if images.dtype == jnp.uint8:
        x = images.astype(jnp.float32) / 255.0
        return (x - CLIP_MEAN) / CLIP_STD
    return images


def device_preprocess(images_u8, n_px: int = 224):
    """Batched on-device preprocessing: (B, H, W, 3) uint8 -> resized,
    CLIP-normalized (B, n_px, n_px, 3) float32.  Bicubic resize runs on
    device; use for high-throughput corpus encoding where exact PIL-BICUBIC
    parity is not required."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(images_u8).astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    scale = n_px / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    x = jax.image.resize(x, (b, nh, nw, c), method="bicubic")
    top, left = (nh - n_px) // 2, (nw - n_px) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, n_px, n_px, c))
    return (x - CLIP_MEAN) / CLIP_STD
