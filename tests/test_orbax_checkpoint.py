"""Orbax-native checkpoint format roundtrip (--checkpoint-format orbax)."""

import numpy as np
import pytest

import jax

pytest.importorskip("orbax.checkpoint")

from keds_tpu.io.checkpoint import load_orbax_heads, save_train_checkpoint
from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads

D = 32


def test_orbax_roundtrip(tmp_path):
    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=1,
    )
    clip_params = mclip.init_clip(jax.random.key(0), cfg)
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    heads = FusionHeads(
        img2text=mheads.init_im2text(k1, D, 24, D),
        retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=2),
        text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=2),
    )
    path = str(tmp_path / "orbax_ckpt")
    save_train_checkpoint(path, epoch=7, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=heads, fmt="orbax")
    loaded, epoch = load_orbax_heads(path)
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(heads), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
