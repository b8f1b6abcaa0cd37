"""CLIP image/text towers as pure JAX functions.

Functional rebuild of the reference CLIP (``src/model/model.py:376-911``):
ViT image tower (patchify conv -> CLS -> pos-embed -> pre-LN -> blocks ->
post-LN on CLS -> projection) and the causal text tower (token+pos embed ->
blocks -> final LN -> pool at first EOT -> text projection), plus the
composed-text encoders that splice pseudo-tokens into the prompt
(``encode_text_img`` family, ``model.py:756-892``).

TPU-first choices:

* parameters are a pytree with blocks stacked on a leading layer axis and run
  under ``lax.scan`` (single compilation per tower, weight streaming),
* patchify is expressed as an im2row + matmul, which lands directly on the
  MXU with no conv layout shuffles,
* token splicing is fixed-shape gather/select under jit (context length is a
  static 77) — no dynamic shapes,
* LayerNorm/softmax run in float32 islands; everything else follows the
  param/compute dtype (bf16 by default on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from keds_tpu.models.layers import (
    layer_norm,
    transformer,
    transformer_collect,
    transformer_pooled,
    transformer_seq_padded,
    transformer_seq_padded_pooled,
    unstack_blocks,
    residual_block,
)


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 768
    image_resolution: int = 224
    # int = ViT depth; tuple = ModifiedResNet stage counts (reference
    # dispatches the same way, model.py:454-472)
    vision_layers: object = 24
    vision_width: int = 1024
    vision_patch_size: int = 14
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 768
    transformer_heads: int = 12
    transformer_layers: int = 12

    @property
    def is_vit(self) -> bool:
        return not isinstance(self.vision_layers, (tuple, list))

    @property
    def vision_heads(self) -> int:
        # ViT: width/64 heads; ResNet attnpool: width*32/64 (model.py:455,464)
        return (self.vision_width // 64 if self.is_vit
                else self.vision_width * 32 // 64)

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def n_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def eot_id(self) -> int:
        # The reference pools at vocab_size - 1 (model.py:499).
        return self.vocab_size - 1


VIT_L_14 = ClipConfig()
VIT_B_32 = ClipConfig(embed_dim=512, vision_layers=12, vision_width=768,
                      vision_patch_size=32, transformer_width=512,
                      transformer_heads=8)
VIT_B_16 = ClipConfig(embed_dim=512, vision_layers=12, vision_width=768,
                      vision_patch_size=16, transformer_width=512,
                      transformer_heads=8)
VIT_H_14 = ClipConfig(embed_dim=1024, vision_layers=32, vision_width=1280,
                      vision_patch_size=14, transformer_width=1024,
                      transformer_heads=16, transformer_layers=24)

# From-scratch architecture presets (the reference ships these as
# model_configs/*.json, src/main.py:134-145).
MODEL_CONFIGS = {
    "ViT-L/14": VIT_L_14,
    "ViT-B/32": VIT_B_32,
    "ViT-B/16": VIT_B_16,
    "ViT-H-14": VIT_H_14,
}


def model_config_for(name: str) -> ClipConfig:
    if name in MODEL_CONFIGS:
        return MODEL_CONFIGS[name]
    raise KeyError(
        f"no from-scratch config for {name!r} (RN-family towers load from "
        "checkpoints only; their BatchNorm runs in inference mode)"
    )


# --------------------------------------------------------------------------
# Initialization (matches reference initialize_parameters, model.py:511-541)
# --------------------------------------------------------------------------

def _init_blocks(key: jax.Array, n_layers: int, width: int, dtype) -> dict:
    ks = jax.random.split(key, 4)
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    shape = lambda *s: (n_layers,) + s
    normal = lambda k, s, std: (jax.random.normal(k, s) * std).astype(dtype)
    return {
        "ln1_g": jnp.ones(shape(width), dtype),
        "ln1_b": jnp.zeros(shape(width), dtype),
        "qkv_w": normal(ks[0], shape(width, 3 * width), attn_std),
        "qkv_b": jnp.zeros(shape(3 * width), dtype),
        "out_w": normal(ks[1], shape(width, width), proj_std),
        "out_b": jnp.zeros(shape(width), dtype),
        "ln2_g": jnp.ones(shape(width), dtype),
        "ln2_b": jnp.zeros(shape(width), dtype),
        "fc_w": normal(ks[2], shape(width, 4 * width), fc_std),
        "fc_b": jnp.zeros(shape(4 * width), dtype),
        "proj_w": normal(ks[3], shape(4 * width, width), proj_std),
        "proj_b": jnp.zeros(shape(width), dtype),
    }


def init_clip(key: jax.Array, cfg: ClipConfig, dtype=jnp.float32) -> dict:
    # distinct keys per tensor — reusing one key makes e.g. the text pos
    # embedding and projection exactly correlated (round-3 review finding)
    kv, kt, k1, k2, k3, k4, k5, kt_pos, kt_proj = jax.random.split(key, 9)
    vw, tw = cfg.vision_width, cfg.transformer_width
    vscale = vw ** -0.5
    patch_dim = cfg.vision_patch_size * cfg.vision_patch_size * 3
    params = {
        "visual": {
            # im2row patchify kernel, ((ky,kx,c) flattened, width)
            "patch_w": (jax.random.normal(k1, (patch_dim, vw)) * vscale).astype(dtype),
            "cls": (jax.random.normal(k2, (vw,)) * vscale).astype(dtype),
            "pos": (jax.random.normal(k3, (cfg.n_patches + 1, vw)) * vscale).astype(dtype),
            "ln_pre_g": jnp.ones((vw,), dtype),
            "ln_pre_b": jnp.zeros((vw,), dtype),
            "blocks": _init_blocks(kv, cfg.vision_layers, vw, dtype),
            "ln_post_g": jnp.ones((vw,), dtype),
            "ln_post_b": jnp.zeros((vw,), dtype),
            "proj": (jax.random.normal(k4, (vw, cfg.embed_dim)) * vscale).astype(dtype),
        },
        "text": {
            "tok_emb": (jax.random.normal(k5, (cfg.vocab_size, tw)) * 0.02).astype(dtype),
            "pos": (jax.random.normal(kt_pos, (cfg.context_length, tw)) * 0.01).astype(dtype),
            "blocks": _init_blocks(kt, cfg.transformer_layers, tw, dtype),
            "ln_final_g": jnp.ones((tw,), dtype),
            "ln_final_b": jnp.zeros((tw,), dtype),
            "proj": (jax.random.normal(kt_proj, (tw, cfg.embed_dim)) * tw ** -0.5).astype(dtype),
        },
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }
    return params


# --------------------------------------------------------------------------
# Image tower
# --------------------------------------------------------------------------

def _patchify(images: jax.Array, patch: int) -> jax.Array:
    """NHWC images -> (B, n_patches, patch*patch*3) rows in (ky, kx, c) order
    (equivalent to the reference's stride=patch conv, model.py:394-396)."""
    B, H, W, C = images.shape
    gy, gx = H // patch, W // patch
    x = images.reshape(B, gy, patch, gx, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gy * gx, patch * patch * C)


def vision_tokens(params: dict, cfg: ClipConfig, images: jax.Array) -> jax.Array:
    """Embedded token sequence before the transformer: (B, 1+N, vw)."""
    v = params["visual"]
    dtype = v["patch_w"].dtype
    x = _patchify(images.astype(dtype), cfg.vision_patch_size)
    x = jnp.dot(x, v["patch_w"])
    cls = jnp.broadcast_to(v["cls"], (x.shape[0], 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos"].astype(dtype)
    return layer_norm(x, v["ln_pre_g"], v["ln_pre_b"])


def encode_image(params: dict, cfg: ClipConfig, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) -> (B, embed_dim).  Reference model.py:393-415 (ViT) /
    model.py:273-288 (ModifiedResNet, dispatched on the config like the
    reference's tuple-vs-int vision_layers)."""
    if not cfg.is_vit:
        from keds_tpu.models.resnet import encode_image_resnet

        return encode_image_resnet(params, images, cfg.vision_heads)
    v = params["visual"]
    x = vision_tokens(params, cfg, images)
    # Only the CLS row of the final block is consumed (post-LN + projection)
    # — the pooled tail skips the other 256 rows' out-proj/MLP (~3.5% of
    # tower FLOPs), exact math (layers.final_block_pooled).
    cls = transformer_seq_padded_pooled(x, v["blocks"], cfg.vision_heads, 0)
    cls = layer_norm(cls, v["ln_post_g"], v["ln_post_b"])
    return jnp.dot(cls, v["proj"].astype(cls.dtype))


# Measured-optimal encode chunk for the macro-batch schedule on v5e
# (BENCH_NOTES.md sweeps) — shared by bench, engine, evaluators, the raw
# train step and the feature-extraction tool so a hardware re-sweep updates
# one place.  Round 4: 16 beats 32 by +8.4% on the serving headline (the
# round-2 sweep that picked 32 predates the bf16-scores + padded-sequence
# encode schedule and never went below 32; re-swept 8/16/32 with the
# round-4 pipeline — table in BENCH_NOTES round-4).
DEFAULT_ENCODE_CHUNK = 16


def encode_image_chunked(params: dict, cfg: ClipConfig, images: jax.Array,
                         chunk: Optional[int] = None) -> jax.Array:
    """encode_image over the batch in ``chunk``-sized pieces via lax.map —
    the macro-batch schedule: encode peaks at b32 on v5e while downstream
    retrieval/text-tower utilization grows with batch (BENCH_NOTES.md).
    uint8 inputs are normalized in-graph.  Falls back to one shot when
    ``chunk`` is None or doesn't divide the batch."""
    from keds_tpu.transforms import device_normalize

    B = images.shape[0]
    if chunk and B > chunk and B % chunk == 0:
        xs = images.reshape(B // chunk, chunk, *images.shape[1:])
        f = jax.lax.map(
            lambda im: encode_image(params, cfg, device_normalize(im)), xs)
        return f.reshape(B, f.shape[-1])
    return encode_image(params, cfg, device_normalize(images))


def encode_image_chunked_mesh(params: dict, cfg: ClipConfig, images: jax.Array,
                              chunk: Optional[int], mesh,
                              axis_name: str = "data") -> jax.Array:
    """Per-shard chunked encode under a mesh: each device runs the macro-batch
    chunk schedule on its LOCAL rows.  Chunking the global batch would
    reshape the sharded axis (the round-2 conflict that silently disabled
    the +16% macro win under a mesh); shard_map moves the chunk loop inside
    each shard instead.  Shards smaller than ``chunk`` fall back to one shot
    (encode_image_chunked's own divisibility guard)."""
    from jax.sharding import PartitionSpec as P

    def body(p, im):
        return encode_image_chunked(p, cfg, im, chunk)

    return jax.shard_map(body, mesh=mesh, in_specs=(P(), P(axis_name)),
                         out_specs=P(axis_name), check_vma=False)(params, images)


def encode_image_tokens(params: dict, cfg: ClipConfig, images: jax.Array) -> jax.Array:
    """Full post-transformer token sequence (reference ``VisualTransformer.
    get_tokens``, model.py:418-428): (B, 1+N, vw), no post-LN/projection."""
    v = params["visual"]
    x = vision_tokens(params, cfg, images)
    return transformer_seq_padded(x, v["blocks"], cfg.vision_heads)


def encode_image_mid_features(
    params: dict, cfg: ClipConfig, images: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Projected CLS embedding plus each block's output (L, B, 1+N, vw) —
    the reference ``mid_feature`` mode (model.py:402-408)."""
    v = params["visual"]
    x = vision_tokens(params, cfg, images)
    x, mids = transformer_collect(x, v["blocks"], cfg.vision_heads, causal=False)
    cls = layer_norm(x[:, 0, :], v["ln_post_g"], v["ln_post_b"])
    return jnp.dot(cls, v["proj"].astype(cls.dtype)), mids


# --------------------------------------------------------------------------
# Text tower
# --------------------------------------------------------------------------

def causal_mask(n: int) -> jax.Array:
    """Additive upper-triangular -inf mask (reference build_attention_mask,
    model.py:543-549)."""
    return jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)


def eot_indices(text: jax.Array, eot_id: int) -> jax.Array:
    """Index of the first EOT token per row (reference pools at the first
    position equal to vocab_size-1; model.py:587-589)."""
    return jnp.argmax((text == eot_id).astype(jnp.int32), axis=1)


def _text_transformer(params: dict, cfg: ClipConfig, x: jax.Array) -> jax.Array:
    t = params["text"]
    # S from the input, not cfg.context_length: a CAUSAL tower computed over
    # a PREFIX of the sequence produces bit-identical outputs for those
    # positions (later positions never feed earlier ones), which lets
    # fixed-prompt callers truncate — the image-stream train step runs S=8
    # instead of 77 (make_train_step; measured in BENCH_NOTES round-4).
    S = x.shape[1]
    x = x + t["pos"][:S].astype(x.dtype)
    x = transformer(x, t["blocks"], cfg.transformer_heads,
                    causal_mask(S), causal=True)
    return layer_norm(x, t["ln_final_g"], t["ln_final_b"])


def _pool_project(params: dict, x: jax.Array, pool_idx: jax.Array) -> jax.Array:
    t = params["text"]
    # Clamp: composed splicing pools at EOT+(K-1), which walks off the
    # 77-token sequence when a TRUNCATED caption's forced EOT sits at the
    # last slot (the splice pushed it past the end).  Unclamped,
    # take_along_axis FILLS out-of-bounds gathers with NaN and the query's
    # feature silently poisons every metric; the reference crashes outright
    # on the same input (IndexError).  Clamping pools the last kept token —
    # the nearest defined behavior (PARITY.md).
    pool_idx = jnp.clip(pool_idx, 0, x.shape[1] - 1)
    pooled = jnp.take_along_axis(x, pool_idx[:, None, None], axis=1)[:, 0, :]
    return jnp.dot(pooled, t["proj"].astype(x.dtype))


def _text_tail_pooled(params: dict, cfg: ClipConfig, x: jax.Array,
                      pool_idx: jax.Array) -> jax.Array:
    """``_text_transformer`` + ``_pool_project`` fused at the final block:
    only the pooled row's final-block output is ever consumed, so the last
    block's out-proj/MLP run at that single position per sample (attention
    stays full and bit-identical — layers.final_block_pooled; ~6% of the
    text tower's FLOPs).  Clamping matches _pool_project's out-of-range
    repair (PARITY.md); the same causal-prefix truncation contract as
    _text_transformer applies (S from the input)."""
    t = params["text"]
    S = x.shape[1]
    x = x + t["pos"][:S].astype(x.dtype)
    idx = jnp.clip(jnp.broadcast_to(jnp.asarray(pool_idx), (x.shape[0],)),
                   0, S - 1)
    row = transformer_pooled(x, t["blocks"], cfg.transformer_heads, idx,
                             mask=causal_mask(S), causal=True)
    row = layer_norm(row, t["ln_final_g"], t["ln_final_b"])
    return jnp.dot(row, t["proj"].astype(row.dtype))


def encode_text(params: dict, cfg: ClipConfig, text: jax.Array) -> jax.Array:
    """(B, 77) int tokens -> (B, embed_dim).  Reference model.py:577-590."""
    t = params["text"]
    x = t["tok_emb"][text]
    return _text_tail_pooled(params, cfg, x, eot_indices(text, cfg.eot_id))


def get_text_tokens(params: dict, cfg: ClipConfig, text: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Final-LN token sequence plus per-row EOT indices (reference
    ``get_text_tokens``, model.py:592-605)."""
    t = params["text"]
    x = t["tok_emb"][text]
    x = _text_transformer(params, cfg, x)
    return x, eot_indices(text, cfg.eot_id)


# --------------------------------------------------------------------------
# Pseudo-token splicing (composed-text encoders)
# --------------------------------------------------------------------------

def splice_tokens(
    embeds: jax.Array,
    pseudo: jax.Array,
    insert_pos: jax.Array,
    n_replace: int,
) -> jax.Array:
    """Insert ``pseudo`` (B, K, D) into ``embeds`` (B, S, D) at position
    ``insert_pos`` (scalar or (B,)), replacing ``n_replace`` original tokens;
    the remainder shifts right and the tail is dropped.  Fixed-shape under
    jit: implemented as a clipped gather + select.
    """
    B, S, D = embeds.shape
    K = pseudo.shape[1]
    ins = jnp.broadcast_to(jnp.asarray(insert_pos), (B,))[:, None]  # (B, 1)
    pos = jnp.arange(S)[None, :]  # (1, S)
    shift = K - n_replace
    tail_src = jnp.clip(pos - shift, 0, S - 1)
    gather_idx = jnp.where(pos < ins, pos, tail_src)
    base = jnp.take_along_axis(embeds, gather_idx[:, :, None], axis=1)
    pseudo_idx = jnp.clip(pos - ins, 0, K - 1)
    pseudo_vals = jnp.take_along_axis(
        pseudo.astype(embeds.dtype), pseudo_idx[:, :, None], axis=1
    )
    in_pseudo = (pos >= ins) & (pos < ins + K)
    return jnp.where(in_pseudo[:, :, None], pseudo_vals, base)


def encode_text_img(params: dict, cfg: ClipConfig, text: jax.Array, img_tokens: jax.Array) -> jax.Array:
    """Insert K pseudo-tokens immediately before the EOT of a fixed prompt
    (train-time ``get_text_features`` path: "a photo of" + 3 fused tokens).

    Reference semantics (model.py:756-777) with an off-by-one repaired: the
    committed reference trims 2 tail positions while inserting 3 tokens,
    yielding a 78-long sequence that cannot pass its own 77-wide positional
    embedding; we insert K and trim K so the sequence stays ``context_length``
    and pool at the shifted EOT (collect_ind + K).
    """
    t = params["text"]
    x = t["tok_emb"][text]
    eot = eot_indices(text, cfg.eot_id)
    K = img_tokens.shape[1]
    # Reference uses the first row's EOT as the splice point for all rows
    # (prompt is identical across the batch).
    x = splice_tokens(x, img_tokens, eot[0], n_replace=0)
    return _text_tail_pooled(params, cfg, x, eot + K)


def encode_text_img_retrieval(
    params: dict,
    cfg: ClipConfig,
    text: jax.Array,
    img_tokens: jax.Array,
    split_id: int,
) -> jax.Array:
    """Replace the single ``*`` placeholder with K pseudo-tokens and pool at
    the EOT shifted by K-1 (reference model.py:808-851; K∈{2,3} there)."""
    t = params["text"]
    B = img_tokens.shape[0]
    if text.shape[0] == 1 and B > 1:
        text = jnp.broadcast_to(text, (B, text.shape[1]))
    x = t["tok_emb"][text]
    eot = eot_indices(text, cfg.eot_id)
    star = jnp.argmax((text[0] == split_id).astype(jnp.int32))
    K = img_tokens.shape[1]
    x = splice_tokens(x, img_tokens, star, n_replace=1)
    return _text_tail_pooled(params, cfg, x, eot + (K - 1))


def encode_text_img_train(
    params: dict,
    cfg: ClipConfig,
    text: jax.Array,
    img_tokens: jax.Array,
    split_id: int,
) -> jax.Array:
    """Replace K consecutive placeholder slots in-place (caption template
    "a photo of * * * {other}"); sequence length and EOT are unchanged
    (reference model.py:853-892)."""
    t = params["text"]
    x = t["tok_emb"][text]
    eot = eot_indices(text, cfg.eot_id)
    star = jnp.argmax((text[0] == split_id).astype(jnp.int32))
    K = img_tokens.shape[1]
    x = splice_tokens(x, img_tokens, star, n_replace=K)
    return _text_tail_pooled(params, cfg, x, eot)


def random_masking(rng: jax.Array, x: jax.Array, mask_ratio: float):
    """MAE-style per-sample random masking by shuffling with argsorted noise
    (reference model.py:624-649).  Returns (kept tokens, binary mask,
    restore indices); ``len_keep = int(L * (1 - mask_ratio))`` is static."""
    N, L, D = x.shape
    len_keep = max(int(L * (1.0 - mask_ratio)), 0)
    noise = jax.random.uniform(rng, (N, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((N, L), x.dtype).at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def _visual_tail(params: dict, x: jax.Array) -> jax.Array:
    v = params["visual"]
    cls = layer_norm(x[:, 0, :], v["ln_post_g"], v["ln_post_b"])
    return jnp.dot(cls, v["proj"].astype(cls.dtype))


def get_visual_composed_features(
    params: dict,
    cfg: ClipConfig,
    text_feature: jax.Array,   # (B, D_text)
    images: jax.Array,
    img2text_cross,            # callable (q, k, v) -> (B, 1, vw): a CrossFormer
    rng: jax.Array,
    mask_ratio: float = 1.0,
) -> jax.Array:
    """Visual-invert composition (reference model.py:651-681 + the visual
    transformer's ``text_feature`` branch, model.py:354-371): MAE-mask the
    patch tokens (the live call uses mask_ratio=1 -> CLS token only), then at
    layer N-6 add a cross-attention of the sequence against the text feature
    into the CLS position."""
    v = params["visual"]
    x = vision_tokens(params, cfg, images)
    x_masked, _, _ = random_masking(rng, x[:, 1:, :], mask_ratio)
    x = jnp.concatenate([x[:, :1, :], x_masked], axis=1)
    blocks = unstack_blocks(v["blocks"], cfg.vision_layers)
    inject = cfg.vision_layers - 6
    tf = text_feature[:, None, :]
    for i, blk in enumerate(blocks):
        if i == inject:
            # Query with the CLS row only so the fusion is (B, 1, vw) for
            # EVERY mask_ratio.  At the live call (mask_ratio=1, sequence is
            # the CLS token alone) this is identical to crossing the full
            # sequence — the parity-tested case; for mask_ratio<1 the
            # reference's own branch is shape-undefined (never exercised),
            # and crossing the full x here would broadcast a corrupted
            # (B, S, vw) sum into the concatenation.
            fused = img2text_cross(x[:, :1], tf, tf)  # (B, 1, vw)
            x = jnp.concatenate([x[:, :1] + fused, x[:, 1:]], axis=1)
        x = residual_block(x, blk, cfg.vision_heads, None)
    return _visual_tail(params, x)


def get_visual_composed_features_eval(
    params: dict,
    cfg: ClipConfig,
    text_feature: jax.Array,
    images: jax.Array,
    img2text_cross,
    rng: jax.Array,
    mask_ratio: float = 1.0,
) -> jax.Array:
    """Eval twin (reference model.py:683-733): runs the masked tower with the
    text-feature injection and returns the projected CLS embedding."""
    return get_visual_composed_features(
        params, cfg, text_feature, images, img2text_cross, rng, mask_ratio
    )


def encode_text_img_vis(
    params: dict,
    cfg: ClipConfig,
    text: jax.Array,
    img_tokens: jax.Array,   # (B, D) or tuple of (B, D) for multiple '*'s
    split_id: int,
) -> jax.Array:
    """Per-sample splice: each row's own ``*`` position is replaced in-place
    by that row's image token (reference model.py:779-806; used by the demo
    visualisation path).  Pooling stays at the original EOT."""
    t = params["text"]
    x = t["tok_emb"][text]
    eot = eot_indices(text, cfg.eot_id)
    toks = img_tokens if isinstance(img_tokens, tuple) else (img_tokens,)
    is_star = (text == split_id).astype(jnp.int32)
    if not isinstance(text, jax.core.Tracer):
        # Eager (demo) path: a row with fewer '*'s than image tokens would
        # make argmax return 0 and silently splice over SOT; the reference
        # raises IndexError on the same input (model.py:791) — fail loudly
        # here too.  Under jit the counts are traced and this is skipped.
        n_stars = np.asarray(jnp.sum(is_star, axis=1))
        if (n_stars < len(toks)).any():
            bad = int(np.argmax(n_stars < len(toks)))
            raise ValueError(
                f"encode_text_img_vis: row {bad} has {int(n_stars[bad])} "
                f"'*' placeholder(s) but {len(toks)} image tokens were given")
    # position of the n-th '*' per row
    cum = jnp.cumsum(is_star, axis=1)
    for n, tok in enumerate(toks):
        pos = jnp.argmax((is_star == 1) & (cum == n + 1), axis=1)  # (B,)
        x = splice_tokens(x, tok[:, None, :], pos, n_replace=1)
    return _text_tail_pooled(params, cfg, x, eot)


def get_text_mid_cross_feature(
    params: dict,
    cfg: ClipConfig,
    text: jax.Array,
    img_tokens: jax.Array,
    cross_params: list,
    crossformer_apply,
) -> jax.Array:
    """Textual-invert mode: between text blocks 0..5, cross-attend the EOT
    position over ``img_tokens`` and add it back (reference
    ``Transformer.forward`` cross path, model.py:343-353, driven by
    ``get_text_mid_cross_feature``, model.py:607-622)."""
    t = params["text"]
    x = t["tok_emb"][text]
    eot = eot_indices(text, cfg.eot_id)
    x = x + t["pos"].astype(x.dtype)
    mask = causal_mask(cfg.context_length)
    blocks = unstack_blocks(t["blocks"], cfg.transformer_layers)
    ci = eot[0]
    for i, blk in enumerate(blocks):
        if i != len(blocks) - 1 and i <= 5:
            eos = jax.lax.dynamic_slice_in_dim(x, ci, 1, axis=1)  # (B,1,D)
            eos = crossformer_apply(cross_params, eos, img_tokens, img_tokens)
            upd = jax.lax.dynamic_slice_in_dim(x, ci, 1, axis=1) + eos.astype(x.dtype)
            x = jax.lax.dynamic_update_slice_in_dim(x, upd, ci, axis=1)
        x = residual_block(x, blk, cfg.transformer_heads, mask)
    x = layer_norm(x, t["ln_final_g"], t["ln_final_b"])
    return _pool_project(params, x, eot)


def clip_forward(
    params: dict, cfg: ClipConfig, images: Optional[jax.Array], text: Optional[jax.Array]
):
    """Normalized features + exp(logit_scale) (reference model.py:894-911)."""
    if images is None:
        return encode_text(params, cfg, text)
    if text is None:
        return encode_image(params, cfg, images)
    img = encode_image(params, cfg, images)
    txt = encode_text(params, cfg, text)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt, jnp.exp(params["logit_scale"])
