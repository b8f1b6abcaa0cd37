"""Sharded-DB evaluation must produce the same composed features as
replicated-DB evaluation (the faiss index_cpu_to_all_gpus analog)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keds_tpu.evalkit.evaluators import EvalContext
from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.parallel.mesh import make_mesh
from keds_tpu.retrieval.database import KnowledgeDB, Retriever

D = 64


def test_composed_features_sharded_vs_replicated():
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
    heads = jax.tree.map(jnp.asarray, heads)
    rng = np.random.default_rng(0)
    img_db = rng.standard_normal((517, D)).astype(np.float32)  # non-divisible
    txt_db = rng.standard_normal((517, D)).astype(np.float32)
    mesh = make_mesh()
    db_rep = KnowledgeDB.from_arrays(img_db, txt_db, dtype=jnp.float32)
    db_sh = KnowledgeDB.from_arrays(img_db, txt_db, dtype=jnp.float32).shard_over(mesh)

    text = np.zeros((5, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    images = rng.standard_normal((5, 32, 32, 3)).astype(np.float32)

    outs = []
    for retr, ctx_mesh in (
        (Retriever(db_rep), None),
        (Retriever(db_sh, mesh=mesh, sharded=True), mesh),
    ):
        ctx = EvalContext(clip_params=clip_params, cfg=cfg, retriever=retr,
                          compute_dtype=jnp.float32, mesh=ctx_mesh)
        feats = ctx.image_features(images)
        assert feats.shape[0] == 5  # batch padded to the mesh then unpadded
        ti, tt = ctx.retrieved(feats)
        compose = ctx.composed_fn("retrieval", use_text_condition=True)
        outs.append(np.asarray(compose(heads, feats, ti, tt, jnp.asarray(text))))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5, rtol=1e-5)
