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

    # Chunked encode (the serving macro schedule, +8.6% on the raw step on
    # v5e) is a pure scheduling choice: the step must produce the same loss
    # and update as the one-shot encode.
    step_c = make_train_step(
        clip_params, cfg, Retriever(db), opt, stream="image",
        prompt_tokens=prompt, split_id=265, compute_dtype=jnp.float32,
        encode_chunk=4,
    )
    h1c, _, loss_c = step_c(heads, state, batch, jax.random.key(0))
    np.testing.assert_allclose(float(loss_c), float(loss), rtol=1e-5)
    # NB: not asserting h1 == h1c elementwise — AdamW's g/(sqrt(nu)+eps)
    # amplifies the ~1e-7 matmul-blocking diffs of the chunked schedule
    # wherever a gradient element is near zero.  The features themselves
    # must match tightly:
    from keds_tpu.train.losses import encode_raw_batch

    f1 = encode_raw_batch(clip_params, cfg, batch)
    f2 = encode_raw_batch(clip_params, cfg, batch, encode_chunk=4)
    np.testing.assert_allclose(np.asarray(f2.image_features),
                               np.asarray(f1.image_features),
                               rtol=1e-5, atol=1e-6)


def test_train_step_raw_batch_mesh_chunked():
    """Raw step on the 8-device mesh with the per-shard chunked encode
    (encode_image_chunked_mesh via shard_map inside the step): loss matches
    the single-device one-shot step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from keds_tpu.parallel.mesh import make_mesh

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
    caps = np.zeros((16, 77), np.int32)
    caps[:, 0] = 49406
    caps[:, 1] = 320
    caps[:, 2] = 49407
    images = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    mk_batch = lambda put: RawBatch(  # noqa: E731
        images=put(jnp.asarray(images)),
        caption_tokens=put(jnp.asarray(caps)),
        other_tokens=put(jnp.zeros((16, 77), jnp.int32)),
    )
    state = opt.init(heads)

    step_ref = make_train_step(
        clip_params, cfg, Retriever(db), opt, stream="image",
        prompt_tokens=prompt, split_id=265, compute_dtype=jnp.float32,
        encode_chunk=None,
    )
    _, _, loss_ref = step_ref(heads, state, mk_batch(lambda a: a),
                              jax.random.key(0))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    heads_m = jax.device_put(heads, rep)
    state_m = jax.device_put(state, rep)
    # chunk 2 runs the per-shard lax.map (2 rows/device -> 1 chunk of 2);
    # chunk 32 > local rows exercises the documented one-shot fallback.
    for chunk in (2, 32):
        step_m = make_train_step(
            jax.device_put(clip_params, rep), cfg, Retriever(db), opt,
            stream="image", prompt_tokens=prompt, split_id=265,
            compute_dtype=jnp.float32, encode_chunk=chunk, mesh=mesh,
        )
        _, _, loss_m = step_m(heads_m, state_m,
                              mk_batch(lambda a: jax.device_put(a, shard)),
                              jax.random.key(0))
        np.testing.assert_allclose(float(loss_m), float(loss_ref), rtol=1e-5)


def test_raw_step_bucketed_captions_bit_exact():
    """The raw feed buckets caption tokens to the covering causal-prefix
    length (encode_text pools at EOT; cli/main batches()): a bucketed batch
    must produce the identical loss and head update as the full-width one."""
    from keds_tpu.tokenizer import bucket_text

    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=2, context_length=77,
    )
    clip_params = mclip.init_clip(jax.random.key(0), cfg)
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    heads = FusionHeads(
        img2text=mheads.init_im2text(k1, D, 48, D),
        retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=3),
        text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=3),
    )
    rng = np.random.default_rng(3)
    db = KnowledgeDB.from_arrays(rng.standard_normal((64, D)),
                                 rng.standard_normal((64, D)), dtype=jnp.float32)
    ccfg = Config(lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-6, wd=0.1, warmup=2)
    opt, _ = make_optimizer(ccfg, 10)
    prompt = np.zeros((1, 77), np.int32)
    prompt[0, :5] = [49406, 320, 1125, 539, 49407]
    step = make_train_step(
        clip_params, cfg, Retriever(db), opt, stream="image",
        prompt_tokens=prompt, split_id=265, compute_dtype=jnp.float32,
    )
    caps = np.zeros((4, 77), np.int32)
    caps[:, 0] = 49406
    caps[:, 1:9] = rng.integers(1, 90, (4, 8))
    caps[:, 9] = cfg.eot_id
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    state = opt.init(heads)

    def run(c):
        return step(heads, state, RawBatch(
            images=images, caption_tokens=jnp.asarray(c),
            other_tokens=jnp.zeros((4, 77), jnp.int32)), jax.random.key(0))

    h_full, _, loss_full = run(caps)
    bucketed = bucket_text(caps, n_pseudo=1)
    assert bucketed.shape[1] == 16  # eot at 9 -> the S=16 bucket
    h_b, _, loss_b = run(bucketed)
    assert float(loss_b) == float(loss_full)
    for a, b in zip(jax.tree.leaves(h_b), jax.tree.leaves(h_full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
