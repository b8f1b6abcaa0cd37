"""Torch-state-dict <-> JAX pytree conversion.

The reference stores everything as torch state dicts: raw OpenAI CLIP
checkpoints and 4-module train checkpoints ``{state_dict, state_dict_img2text,
state_dict_retrieval_fuse, state_dict_text_condition}`` (``src/main.py:
330-341``).  This module converts those (as dicts of numpy arrays — see
``keds_tpu.io.pt`` for reading .pt files without torch) into the stacked
pytrees used by :mod:`keds_tpu.models`, and back.

Shape inference from a CLIP state dict mirrors the reference ``build_model``
(``src/model/model.py:951-991``).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from keds_tpu.models.clip import ClipConfig


Array = np.ndarray
StateDict = Dict[str, Array]


def cast_floating(tree, dtype):
    """Cast every floating leaf of a param pytree to ``dtype`` (compute
    precision policy); integer leaves (token tables etc.) pass through.

    The dtype probe must NOT fetch device arrays to host: ``np.asarray`` on
    a remote-resident ViT-L pytree is GBs of synchronous transfer, and a
    leaf replicated over non-addressable devices (multi-process mesh) makes
    it raise outright.  Every entry point that applies the precision policy
    (EvalContext, ComposedQueryEngine, make_train_step) must go through
    this helper — three hand-rolled copies drifted apart once.
    """
    import jax
    import jax.numpy as jnp

    def leaf_dtype(a):
        d = getattr(a, "dtype", None)
        # NB a getattr DEFAULT argument is evaluated eagerly — the host
        # fallback (python scalars / lists) must live behind a real branch.
        return d if d is not None else np.asarray(a).dtype

    def cast(a):
        return (jnp.asarray(a, dtype) if jnp.issubdtype(leaf_dtype(a),
                                                        np.floating)
                else jnp.asarray(a))

    return jax.tree.map(cast, tree)


def strip_module_prefix(sd: StateDict) -> StateDict:
    """Remove DDP 'module.' prefixes (reference src/main.py:267-274)."""
    if sd and next(iter(sd)).startswith("module."):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def infer_clip_config(sd: StateDict) -> ClipConfig:
    """Infer architecture hyperparameters from a CLIP state dict
    (reference build_model shape inference, model.py:951-974): ViT when
    ``visual.proj`` exists, ModifiedResNet otherwise."""
    sd = strip_module_prefix(sd)
    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid_size
    else:
        counts = [len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
                  for b in (1, 2, 3, 4)]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        output_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = output_width * 32
        vision_patch_size = 0
    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )
    return ClipConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
    )


def _f32(a: Array) -> Array:
    return np.asarray(a, dtype=np.float32)


def _stack_blocks(sd: StateDict, prefix: str, n_layers: int) -> dict:
    """Stack per-layer resblock tensors along a new leading layer axis,
    transposing torch Linear weights (out,in) -> (in,out)."""
    def get(i, name):
        return _f32(sd[f"{prefix}.resblocks.{i}.{name}"])

    return {
        "ln1_g": np.stack([get(i, "ln_1.weight") for i in range(n_layers)]),
        "ln1_b": np.stack([get(i, "ln_1.bias") for i in range(n_layers)]),
        "qkv_w": np.stack([get(i, "attn.in_proj_weight").T for i in range(n_layers)]),
        "qkv_b": np.stack([get(i, "attn.in_proj_bias") for i in range(n_layers)]),
        "out_w": np.stack([get(i, "attn.out_proj.weight").T for i in range(n_layers)]),
        "out_b": np.stack([get(i, "attn.out_proj.bias") for i in range(n_layers)]),
        "ln2_g": np.stack([get(i, "ln_2.weight") for i in range(n_layers)]),
        "ln2_b": np.stack([get(i, "ln_2.bias") for i in range(n_layers)]),
        "fc_w": np.stack([get(i, "mlp.c_fc.weight").T for i in range(n_layers)]),
        "fc_b": np.stack([get(i, "mlp.c_fc.bias") for i in range(n_layers)]),
        "proj_w": np.stack([get(i, "mlp.c_proj.weight").T for i in range(n_layers)]),
        "proj_b": np.stack([get(i, "mlp.c_proj.bias") for i in range(n_layers)]),
    }


def _unstack_blocks(blocks: dict, prefix: str, out: StateDict) -> None:
    n_layers = blocks["ln1_g"].shape[0]
    pairs = [
        ("ln_1.weight", "ln1_g", False), ("ln_1.bias", "ln1_b", False),
        ("attn.in_proj_weight", "qkv_w", True), ("attn.in_proj_bias", "qkv_b", False),
        ("attn.out_proj.weight", "out_w", True), ("attn.out_proj.bias", "out_b", False),
        ("ln_2.weight", "ln2_g", False), ("ln_2.bias", "ln2_b", False),
        ("mlp.c_fc.weight", "fc_w", True), ("mlp.c_fc.bias", "fc_b", False),
        ("mlp.c_proj.weight", "proj_w", True), ("mlp.c_proj.bias", "proj_b", False),
    ]
    for i in range(n_layers):
        for torch_name, ours, transpose in pairs:
            a = np.asarray(blocks[ours][i])
            out[f"{prefix}.resblocks.{i}.{torch_name}"] = a.T if transpose else a


def clip_state_dict_to_pytree(sd: StateDict, cfg: ClipConfig | None = None) -> tuple:
    """Convert a (possibly fp16) CLIP torch state dict to the model pytree.
    Returns (params, cfg).  All arrays become float32; cast afterwards for
    bf16 execution."""
    sd = strip_module_prefix(sd)
    if cfg is None:
        cfg = infer_clip_config(sd)
    if cfg.is_vit:
        P = cfg.vision_patch_size
        conv = _f32(sd["visual.conv1.weight"])  # (vw, 3, P, P)
        patch_w = conv.transpose(2, 3, 1, 0).reshape(P * P * 3, cfg.vision_width)
        visual = {
            "patch_w": patch_w,
            "cls": _f32(sd["visual.class_embedding"]),
            "pos": _f32(sd["visual.positional_embedding"]),
            "ln_pre_g": _f32(sd["visual.ln_pre.weight"]),
            "ln_pre_b": _f32(sd["visual.ln_pre.bias"]),
            "blocks": _stack_blocks(sd, "visual.transformer", cfg.vision_layers),
            "ln_post_g": _f32(sd["visual.ln_post.weight"]),
            "ln_post_b": _f32(sd["visual.ln_post.bias"]),
            "proj": _f32(sd["visual.proj"]),
        }
    else:
        from keds_tpu.models.resnet import resnet_state_dict_to_pytree

        visual, _meta = resnet_state_dict_to_pytree(sd)
    params = {
        "visual": visual,
        "text": {
            "tok_emb": _f32(sd["token_embedding.weight"]),
            "pos": _f32(sd["positional_embedding"]),
            "blocks": _stack_blocks(sd, "transformer", cfg.transformer_layers),
            "ln_final_g": _f32(sd["ln_final.weight"]),
            "ln_final_b": _f32(sd["ln_final.bias"]),
            "proj": _f32(sd["text_projection"]),
        },
        "logit_scale": _f32(sd["logit_scale"]),
    }
    return params, cfg


def clip_pytree_to_state_dict(params: dict, cfg: ClipConfig) -> StateDict:
    """Inverse of :func:`clip_state_dict_to_pytree` (for writing
    reference-format checkpoints)."""
    v, t = params["visual"], params["text"]
    if cfg.is_vit:
        P = cfg.vision_patch_size
        patch_w = np.asarray(v["patch_w"]).reshape(P, P, 3, cfg.vision_width)
        sd: StateDict = {
            "visual.conv1.weight": patch_w.transpose(3, 2, 0, 1),
            "visual.class_embedding": np.asarray(v["cls"]),
            "visual.positional_embedding": np.asarray(v["pos"]),
            "visual.ln_pre.weight": np.asarray(v["ln_pre_g"]),
            "visual.ln_pre.bias": np.asarray(v["ln_pre_b"]),
            "visual.ln_post.weight": np.asarray(v["ln_post_g"]),
            "visual.ln_post.bias": np.asarray(v["ln_post_b"]),
            "visual.proj": np.asarray(v["proj"]),
        }
        _unstack_blocks(v["blocks"], "visual.transformer", sd)
    else:
        from keds_tpu.models.resnet import resnet_pytree_to_state_dict

        sd = resnet_pytree_to_state_dict(v)
    sd.update({
        "token_embedding.weight": np.asarray(t["tok_emb"]),
        "positional_embedding": np.asarray(t["pos"]),
        "ln_final.weight": np.asarray(t["ln_final_g"]),
        "ln_final.bias": np.asarray(t["ln_final_b"]),
        "text_projection": np.asarray(t["proj"]),
        "logit_scale": np.asarray(params["logit_scale"]),
    })
    _unstack_blocks(t["blocks"], "transformer", sd)
    return sd


# --------------------------------------------------------------------------
# Heads
# --------------------------------------------------------------------------

def im2text_state_dict_to_pytree(sd: StateDict) -> dict:
    """IM2TEXT torch keys: layers.{i}.0.{weight,bias}, fc_out.{weight,bias}
    (reference model.py:105-123)."""
    sd = strip_module_prefix(sd)
    n_layer = len({m.group(1) for k in sd if (m := re.match(r"layers\.(\d+)\.", k))})
    layers = [
        {"w": _f32(sd[f"layers.{i}.0.weight"]).T, "b": _f32(sd[f"layers.{i}.0.bias"])}
        for i in range(n_layer)
    ]
    return {
        "layers": layers,
        "fc_out": {"w": _f32(sd["fc_out.weight"]).T, "b": _f32(sd["fc_out.bias"])},
    }


def im2text_pytree_to_state_dict(params: dict) -> StateDict:
    sd: StateDict = {}
    for i, layer in enumerate(params["layers"]):
        sd[f"layers.{i}.0.weight"] = np.asarray(layer["w"]).T
        sd[f"layers.{i}.0.bias"] = np.asarray(layer["b"])
    sd["fc_out.weight"] = np.asarray(params["fc_out"]["w"]).T
    sd["fc_out.bias"] = np.asarray(params["fc_out"]["b"])
    return sd


def crossformer_state_dict_to_pytree(sd: StateDict) -> list:
    """CrossFormer torch keys: cross_layers.{i}.to_{q,k,v}.{weight,bias},
    cross_layers.{i}.to_out.0.{weight,bias} (reference model.py:37-101)."""
    sd = strip_module_prefix(sd)
    n = len({m.group(1) for k in sd if (m := re.match(r"cross_layers\.(\d+)\.", k))})
    out = []
    for i in range(n):
        pre = f"cross_layers.{i}"
        out.append({
            "to_q": {"w": _f32(sd[f"{pre}.to_q.weight"]).T, "b": _f32(sd[f"{pre}.to_q.bias"])},
            "to_k": {"w": _f32(sd[f"{pre}.to_k.weight"]).T, "b": _f32(sd[f"{pre}.to_k.bias"])},
            "to_v": {"w": _f32(sd[f"{pre}.to_v.weight"]).T, "b": _f32(sd[f"{pre}.to_v.bias"])},
            "to_out": {"w": _f32(sd[f"{pre}.to_out.0.weight"]).T, "b": _f32(sd[f"{pre}.to_out.0.bias"])},
        })
    return out


def crossformer_pytree_to_state_dict(params: list) -> StateDict:
    sd: StateDict = {}
    for i, layer in enumerate(params):
        pre = f"cross_layers.{i}"
        for name in ("to_q", "to_k", "to_v"):
            sd[f"{pre}.{name}.weight"] = np.asarray(layer[name]["w"]).T
            sd[f"{pre}.{name}.bias"] = np.asarray(layer[name]["b"])
        sd[f"{pre}.to_out.0.weight"] = np.asarray(layer["to_out"]["w"]).T
        sd[f"{pre}.to_out.0.bias"] = np.asarray(layer["to_out"]["b"])
    return sd
