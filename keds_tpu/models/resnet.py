"""ModifiedResNet image tower (reference ``src/model/model.py:148-288``).

CLIP's anti-aliased ResNet: 3-conv stem with avgpool, bottleneck blocks where
stride>1 is an avgpool before the conv, and a QKV ``AttentionPool2d`` head.
Used by the RN50* model family; the flagship path is the ViT tower.

Inference-mode only: BatchNorm uses stored running statistics (the reference
keeps CLIP frozen in eval mode throughout training, src/trainer.py:416, so
train-mode BN never occurs in the workload).  Layout is NHWC with HWIO conv
kernels (TPU-native).
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x: jax.Array, w: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x: jax.Array, p: dict) -> jax.Array:
    scale = p["g"] / jnp.sqrt(p["var"] + 1e-5)
    return (x * scale.astype(x.dtype)
            + (p["b"] - p["mean"] * scale).astype(x.dtype))


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _bottleneck(x: jax.Array, p: dict, stride: int) -> jax.Array:
    """Reference Bottleneck (model.py:148-191): 1x1 -> 3x3 -> avgpool(stride)
    -> 1x1(x4), with an avgpool-prefixed downsample shortcut."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1_w"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2_w"], padding=1), p["bn2"]))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3_w"]), p["bn3"])
    if "down_conv_w" in p:
        identity = x
        if stride > 1:
            identity = _avg_pool(identity, stride)
        identity = _bn(_conv(identity, p["down_conv_w"]), p["down_bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool_2d(x: jax.Array, p: dict, num_heads: int) -> jax.Array:
    """Reference AttentionPool2d (model.py:194-228): prepend the spatial mean,
    add positional embedding, one MHA step where only the mean-token query is
    kept."""
    B, H, W, C = x.shape
    seq = x.reshape(B, H * W, C)
    seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
    seq = seq + p["pos"].astype(seq.dtype)
    S = seq.shape[1]
    Dh = C // num_heads

    def proj(name, t):
        return jnp.dot(t, p[f"{name}_w"].astype(t.dtype)) + p[f"{name}_b"].astype(t.dtype)

    q = proj("q", seq[:, :1])
    k = proj("k", seq)
    v = proj("v", seq)
    q = q.reshape(B, 1, num_heads, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, num_heads, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, num_heads, Dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q / math.sqrt(Dh), k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return jnp.dot(ctx, p["c_w"].astype(ctx.dtype)) + p["c_b"].astype(ctx.dtype)


def encode_image_resnet(params: dict, images: jax.Array, num_heads: int) -> jax.Array:
    """(B, H, W, 3) -> (B, embed_dim) through the ModifiedResNet tower.
    ``num_heads`` is static (vision_width * 32 // 64, model.py:455)."""
    v = params["visual"]
    x = images.astype(v["stem"]["conv1_w"].dtype)
    stem = v["stem"]
    x = jax.nn.relu(_bn(_conv(x, stem["conv1_w"], stride=2, padding=1), stem["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv2_w"], padding=1), stem["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv3_w"], padding=1), stem["bn3"]))
    x = _avg_pool(x, 2)
    for li, layer in enumerate(v["layers"]):
        for bi, block in enumerate(layer):
            stride = 2 if (li > 0 and bi == 0) else 1
            x = _bottleneck(x, block, stride)
    return attention_pool_2d(x, v["attnpool"], num_heads)


# ---------------------------------------------------------------------------
# Converter (torch RN state dict -> pytree)
# ---------------------------------------------------------------------------

def _conv_w(sd, key) -> np.ndarray:
    # torch OIHW -> HWIO
    return np.asarray(sd[key], np.float32).transpose(2, 3, 1, 0)


def _bn_p(sd, prefix) -> dict:
    g = lambda s: np.asarray(sd[f"{prefix}.{s}"], np.float32)  # noqa: E731
    return {"g": g("weight"), "b": g("bias"),
            "mean": g("running_mean"), "var": g("running_var")}


def resnet_state_dict_to_pytree(sd: dict) -> tuple:
    """Convert an RN-family CLIP visual state dict (plus shape inference per
    reference build_model, model.py:961-967)."""
    from keds_tpu.models.convert import strip_module_prefix

    sd = strip_module_prefix(sd)
    counts = [len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
              for b in (1, 2, 3, 4)]
    vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
    output_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
    image_resolution = output_width * 32
    embed_dim = sd["text_projection"].shape[1]
    vision_heads = vision_width * 32 // 64

    stem = {
        "conv1_w": _conv_w(sd, "visual.conv1.weight"), "bn1": _bn_p(sd, "visual.bn1"),
        "conv2_w": _conv_w(sd, "visual.conv2.weight"), "bn2": _bn_p(sd, "visual.bn2"),
        "conv3_w": _conv_w(sd, "visual.conv3.weight"), "bn3": _bn_p(sd, "visual.bn3"),
    }
    layers: List[List[dict]] = []
    for li, n_blocks in enumerate(counts, start=1):
        blocks = []
        for bi in range(n_blocks):
            pre = f"visual.layer{li}.{bi}"
            blk = {
                "conv1_w": _conv_w(sd, f"{pre}.conv1.weight"), "bn1": _bn_p(sd, f"{pre}.bn1"),
                "conv2_w": _conv_w(sd, f"{pre}.conv2.weight"), "bn2": _bn_p(sd, f"{pre}.bn2"),
                "conv3_w": _conv_w(sd, f"{pre}.conv3.weight"), "bn3": _bn_p(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv_w"] = _conv_w(sd, f"{pre}.downsample.0.weight")
                blk["down_bn"] = _bn_p(sd, f"{pre}.downsample.1")
            blocks.append(blk)
        layers.append(blocks)
    f32 = lambda k: np.asarray(sd[k], np.float32)  # noqa: E731
    attnpool = {
        "pos": f32("visual.attnpool.positional_embedding"),
        "q_w": f32("visual.attnpool.q_proj.weight").T, "q_b": f32("visual.attnpool.q_proj.bias"),
        "k_w": f32("visual.attnpool.k_proj.weight").T, "k_b": f32("visual.attnpool.k_proj.bias"),
        "v_w": f32("visual.attnpool.v_proj.weight").T, "v_b": f32("visual.attnpool.v_proj.bias"),
        "c_w": f32("visual.attnpool.c_proj.weight").T, "c_b": f32("visual.attnpool.c_proj.bias"),
    }
    visual = {"stem": stem, "layers": layers, "attnpool": attnpool}
    meta = {"vision_heads": vision_heads, "image_resolution": image_resolution,
            "embed_dim": embed_dim, "vision_layers": tuple(counts)}
    return visual, meta


def _conv_w_back(w) -> np.ndarray:
    return np.asarray(w).transpose(3, 2, 0, 1)  # HWIO -> OIHW


def _bn_back(p: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["g"])
    out[f"{prefix}.bias"] = np.asarray(p["b"])
    out[f"{prefix}.running_mean"] = np.asarray(p["mean"])
    out[f"{prefix}.running_var"] = np.asarray(p["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def resnet_pytree_to_state_dict(visual: dict) -> dict:
    """Inverse converter (for writing reference-format RN checkpoints)."""
    sd: dict = {}
    stem = visual["stem"]
    for i in (1, 2, 3):
        sd[f"visual.conv{i}.weight"] = _conv_w_back(stem[f"conv{i}_w"])
        _bn_back(stem[f"bn{i}"], f"visual.bn{i}", sd)
    for li, layer in enumerate(visual["layers"], start=1):
        for bi, blk in enumerate(layer):
            pre = f"visual.layer{li}.{bi}"
            for i in (1, 2, 3):
                sd[f"{pre}.conv{i}.weight"] = _conv_w_back(blk[f"conv{i}_w"])
                _bn_back(blk[f"bn{i}"], f"{pre}.bn{i}", sd)
            if "down_conv_w" in blk:
                sd[f"{pre}.downsample.0.weight"] = _conv_w_back(blk["down_conv_w"])
                _bn_back(blk["down_bn"], f"{pre}.downsample.1", sd)
    ap = visual["attnpool"]
    sd["visual.attnpool.positional_embedding"] = np.asarray(ap["pos"])
    for name in ("q", "k", "v", "c"):
        sd[f"visual.attnpool.{name}_proj.weight"] = np.asarray(ap[f"{name}_w"]).T
        sd[f"visual.attnpool.{name}_proj.bias"] = np.asarray(ap[f"{name}_b"])
    return sd
