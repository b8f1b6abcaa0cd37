"""Raw tar-streaming training mode: on-the-fly frozen-CLIP encoding inside
the jitted step (reference webdataset mode)."""

import io
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keds_tpu.config import Config
from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.train.losses import RawBatch
from keds_tpu.train.trainer import make_optimizer, make_train_step

D = 64


def test_train_step_raw_batch():
    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=2,
    )
    clip_params = mclip.init_clip(jax.random.key(0), cfg)
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    heads = FusionHeads(
        img2text=mheads.init_im2text(k1, D, 48, D),
        retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=3),
        text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=3),
    )
    rng = np.random.default_rng(0)
    db = KnowledgeDB.from_arrays(rng.standard_normal((128, D)),
                                 rng.standard_normal((128, D)), dtype=jnp.float32)
    ccfg = Config(lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-6, wd=0.1, warmup=2)
    opt, _ = make_optimizer(ccfg, 10)
    prompt = np.zeros((1, 77), np.int32)
    prompt[0, :5] = [49406, 320, 1125, 539, 49407]
    step = make_train_step(
        clip_params, cfg, Retriever(db), opt, stream="image",
        prompt_tokens=prompt, split_id=265, compute_dtype=jnp.float32,
    )
    caps = np.zeros((8, 77), np.int32)
    caps[:, 0] = 49406
    caps[:, 1] = 320
    caps[:, 2] = 49407
    batch = RawBatch(
        images=jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32),
        caption_tokens=jnp.asarray(caps),
        other_tokens=jnp.zeros((8, 77), jnp.int32),
    )
    state = opt.init(heads)
    h1, s1, loss = step(heads, state, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), heads, h1)
    assert max(jax.tree.leaves(delta)) > 0
    # CLIP itself must be untouched (frozen, stop_gradient)
    # (heads are the only trainables by construction of the step)
