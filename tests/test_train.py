"""Train-step tests: both stream losses, optimizer semantics, checkpoint
roundtrip, and the full data-parallel step on the 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from keds_tpu.config import Config
from keds_tpu.io.checkpoint import (
    load_heads_checkpoint,
    resolve_resume,
    save_train_checkpoint,
)
from keds_tpu.models import clip as mclip
from keds_tpu.models import heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.parallel.mesh import make_mesh
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.train import losses
from keds_tpu.train.schedule import cosine_lr
from keds_tpu.train.trainer import make_optimizer, make_train_step, weight_decay_mask

D = 64
SPLIT_ID = 265
EOT = 49407
SOT = 49406


@pytest.fixture(scope="module")
def tiny_setup():
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
    db = KnowledgeDB.from_arrays(
        rng.standard_normal((256, D)), rng.standard_normal((256, D)),
        dtype=jnp.float32,
    )
    return cfg, clip_params, heads, db


def _tokens_row(body):
    row = np.zeros(77, dtype=np.int32)
    row[: len(body)] = body
    return row


def _batch(b, rng):
    other = np.stack([
        _tokens_row([SOT, 320, 1125, 539, SPLIT_ID, SPLIT_ID, SPLIT_ID, 1929, EOT])
        for _ in range(b)
    ])
    return losses.TrainBatch(
        image_features=jnp.asarray(rng.standard_normal((b, D)), jnp.float32),
        caption_features=jnp.asarray(rng.standard_normal((b, D)), jnp.float32),
        other_tokens=jnp.asarray(other),
    )


def _prompt():
    return _tokens_row([SOT, 320, 1125, 539, EOT])[None, :]


def test_cosine_schedule_matches_reference_formula():
    sched = cosine_lr(1e-4, warmup=10, total_steps=100)
    assert float(sched(0)) == pytest.approx(1e-4 * 1 / 10)
    assert float(sched(9)) == pytest.approx(1e-4)
    assert float(sched(10)) == pytest.approx(1e-4)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(55)) == pytest.approx(0.5 * (1 + np.cos(np.pi * 45 / 90)) * 1e-4)


def test_info_nce_uniform_logits():
    b = 8
    f = jnp.ones((b, D)) / jnp.sqrt(D)
    loss = losses.info_nce(f, f, jnp.asarray(1.0))
    # identical rows -> uniform softmax -> loss = log(b)
    assert float(loss) == pytest.approx(np.log(b), rel=1e-5)


def test_weight_decay_mask_excludes_biases(tiny_setup):
    _, _, heads, _ = tiny_setup
    mask = weight_decay_mask(heads)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, decay in flat:
        leaf_name = str(path[-1])
        if "'b'" in leaf_name:
            assert decay is False
        if "'w'" in leaf_name:
            assert decay is True


@pytest.mark.parametrize("stream", ["image", "text"])
def test_train_step_runs_and_updates(tiny_setup, stream):
    cfg, clip_params, heads, db = tiny_setup
    retr = Retriever(db)
    ccfg = Config(lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-6, wd=0.1, warmup=2)
    opt, _ = make_optimizer(ccfg, total_steps=10)
    opt_state = opt.init(heads)
    rng = np.random.default_rng(1)
    other_tok = np.stack([
        _tokens_row([SOT, 320, 1125, 539, SPLIT_ID, SPLIT_ID, 1929, EOT])
        for _ in range(db.size)
    ])
    step = make_train_step(
        clip_params, cfg, retr, opt, stream=stream, prompt_tokens=_prompt(),
        split_id=SPLIT_ID, db_other_tokens=jnp.asarray(other_tok),
        compute_dtype=jnp.float32,
    )
    batch = _batch(16, rng)
    h1, o1, loss1 = step(heads, opt_state, batch, jax.random.key(0))
    h2, _, loss2 = step(h1, o1, batch, jax.random.key(1))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), heads, h1)
    assert max(jax.tree.leaves(delta)) > 0


def test_train_step_data_parallel_8dev(tiny_setup):
    cfg, clip_params, heads, db = tiny_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    db_sharded = db.shard_over(mesh)
    retr = Retriever(db_sharded, mesh=mesh, sharded=True)
    ccfg = Config(lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-6, wd=0.1, warmup=2)
    opt, _ = make_optimizer(ccfg, total_steps=10)
    rep = NamedSharding(mesh, P())
    heads_r = jax.device_put(heads, rep)
    clip_r = jax.device_put(clip_params, rep)
    opt_state = jax.device_put(opt.init(heads_r), rep)
    step = make_train_step(
        clip_r, cfg, retr, opt, stream="image", prompt_tokens=_prompt(),
        split_id=SPLIT_ID, grad_scale=1.0 / 8, compute_dtype=jnp.float32,
    )
    batch = _batch(32, np.random.default_rng(2))
    shard = NamedSharding(mesh, P("data"))
    batch = losses.TrainBatch(
        image_features=jax.device_put(batch.image_features, shard),
        caption_features=jax.device_put(batch.caption_features, shard),
        other_tokens=jax.device_put(batch.other_tokens, shard),
    )
    h1, o1, loss = step(heads_r, opt_state, batch, jax.random.key(0))
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    cfg, clip_params, heads, _ = tiny_setup
    pytest.importorskip("torch")
    path = str(tmp_path / "checkpoints" / "epoch_3.pt")
    save_train_checkpoint(
        path, epoch=3, name="t", clip_params=clip_params, clip_cfg=cfg, heads=heads
    )
    loaded, epoch = load_heads_checkpoint(path)
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(heads), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    # resume auto resolution picks the highest epoch
    save_train_checkpoint(
        str(tmp_path / "checkpoints" / "epoch_10.pt"),
        epoch=10, name="t", clip_params=clip_params, clip_cfg=cfg, heads=heads,
    )
    assert resolve_resume("auto", str(tmp_path / "checkpoints")).endswith("epoch_10.pt")


def test_checkpoint_loadable_by_reference_modules(tmp_path, tiny_setup, reference_src):
    """A checkpoint we write must load into the reference torch modules."""
    torch = pytest.importorskip("torch")
    import sys

    cfg, clip_params, heads, _ = tiny_setup
    path = str(tmp_path / "epoch_1.pt")
    save_train_checkpoint(
        path, epoch=1, name="t", clip_params=clip_params, clip_cfg=cfg, heads=heads
    )
    sys.path.insert(0, str(reference_src))
    try:
        import model.model as ref_model
    finally:
        sys.path.pop(0)
    ckpt = torch.load(path, weights_only=False)
    i2t = ref_model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D, n_layer=2)
    i2t.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in ckpt["state_dict_img2text"].items()})
    rf = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    rf.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in ckpt["state_dict_retrieval_fuse"].items()})
    clip = ref_model.CLIP(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=D, transformer_heads=1, transformer_layers=2,
    )
    clip.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in ckpt["state_dict"].items()})


def test_training_reduces_loss_substantially(tiny_setup):
    """30 steps on correlated synthetic data must cut the image-stream loss
    well below its initial value (the heads learn to align composed text
    features with image features)."""
    cfg, clip_params, heads, db = tiny_setup
    retr = Retriever(db)
    ccfg = Config(lr=3e-3, beta1=0.9, beta2=0.98, eps=1e-6, wd=0.0, warmup=3)
    opt, _ = make_optimizer(ccfg, total_steps=40)
    opt_state = opt.init(heads)
    step = make_train_step(
        clip_params, cfg, retr, opt, stream="image", prompt_tokens=_prompt(),
        split_id=SPLIT_ID, compute_dtype=jnp.float32,
    )
    rng = np.random.default_rng(7)
    base = rng.standard_normal((16, D)).astype(np.float32)
    batch = losses.TrainBatch(
        image_features=jnp.asarray(base),
        caption_features=jnp.asarray(base + 0.1 * rng.standard_normal((16, D)).astype(np.float32)),
        other_tokens=jnp.zeros((16, 77), jnp.int32),
    )
    h, s = heads, opt_state
    first = None
    for i in range(30):
        h, s, loss = step(h, s, batch, jax.random.key(i))
        if i == 0:
            first = float(loss)
    last = float(loss)
    assert last < 0.7 * first, (first, last)


def test_text_stream_template_bucketing_exact(tiny_setup):
    """Causal-prefix bucketing of the text-stream OWN templates (trimmed at
    the feed, cli/main batches()): the loss must match the full-77 feed
    exactly — the in-place splice pools at each row's eot and later
    positions never feed earlier ones.  (The neighbor-TABLE trim inside
    make_train_step is identical in both runs here; its exactness against a
    genuinely full-width oracle is pinned by the text-stream
    trajectory-parity test, which matches the reference's own 77-wide
    loop.)"""
    from keds_tpu.tokenizer import bucket_text

    cfg, clip_params, heads, db = tiny_setup
    retr = Retriever(db)
    ccfg = Config(lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-6, wd=0.1, warmup=2)
    opt, _ = make_optimizer(ccfg, total_steps=10)
    state = opt.init(heads)
    rng = np.random.default_rng(3)
    oth = np.stack([
        _tokens_row([SOT, 320, 1125, 539, SPLIT_ID, SPLIT_ID,
                     int(rng.integers(1000, 40000)), EOT])
        for _ in range(256)
    ])
    batch_full = _batch(8, np.random.default_rng(5))
    assert oth.shape[1] == 77 and batch_full.other_tokens.shape[1] == 77

    def run(db_other, own_tokens):
        step = make_train_step(
            clip_params, cfg, retr, opt, stream="text",
            prompt_tokens=_prompt(), split_id=SPLIT_ID,
            db_other_tokens=jnp.asarray(db_other), compute_dtype=jnp.float32,
        )
        b = losses.TrainBatch(batch_full.image_features,
                              batch_full.caption_features,
                              jnp.asarray(own_tokens))
        _, _, loss = step(heads, state, b, jax.random.key(0))
        return float(loss)

    loss_full = run(oth, batch_full.other_tokens)
    own_b = bucket_text(np.asarray(batch_full.other_tokens), n_pseudo=1)
    assert own_b.shape[1] == 16  # the feed-level bucket engaged
    loss_bucketed = run(oth, own_b)  # the step itself trims the table
    np.testing.assert_allclose(loss_bucketed, loss_full, rtol=1e-6)


def test_text_stream_requires_db_other_tokens():
    """Round-3 review: stream='text' without db_other_tokens must raise, not
    silently train the neighbor-caption term on a zero placeholder."""
    import numpy as np
    import optax
    import pytest

    from keds_tpu.models import clip as mclip
    from keds_tpu.retrieval.database import KnowledgeDB, Retriever
    from keds_tpu.train.trainer import make_train_step

    cfg = mclip.ClipConfig(
        embed_dim=32, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, transformer_width=32, transformer_heads=1,
        transformer_layers=1,
    )
    params = mclip.init_clip(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    db = KnowledgeDB.from_arrays(rng.standard_normal((16, 32)),
                                 rng.standard_normal((16, 32)),
                                 dtype=jnp.float32)
    prompt = np.zeros((1, 77), np.int32)
    with pytest.raises(ValueError, match="db_other_tokens"):
        make_train_step(params, cfg, Retriever(db), optax.adamw(1e-3),
                        stream="text", prompt_tokens=prompt, split_id=265)


def test_causal_prompt_truncation_exact():
    """A causal text tower computed over a PREFIX of the sequence produces
    identical outputs for those positions — the basis for the image-stream
    train step running its fixed prompt at S=8 instead of 77 (the pool
    index is 7; everything past it is dead weight).  Pin encoder-level
    equality between the full-77 and truncated splice."""
    import jax

    from keds_tpu.models import clip as mclip

    cfg = mclip.ClipConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, transformer_width=32, transformer_heads=2,
        transformer_layers=2,
    )
    params = mclip.init_clip(jax.random.key(0), cfg)
    B, K = 4, 3
    prompt = np.zeros((1, 77), np.int32)
    prompt[0, :5] = [49406, 320, 1125, 539, 49407]  # "a photo of", EOT at 4
    text77 = jnp.asarray(np.tile(prompt, (B, 1)))
    tokens = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, K, 32)), jnp.float32)
    full = mclip.encode_text_img(params, cfg, text77, tokens)
    trunc = mclip.encode_text_img(params, cfg, text77[:, :8], tokens)
    np.testing.assert_allclose(np.asarray(trunc), np.asarray(full),
                               rtol=1e-5, atol=1e-6)
    # the step-level effect (including gradients) is pinned by the
    # training-trajectory parity test, which runs the truncated step
    # against the reference's full-77 train loop


def test_shard_batch_refuses_nondivisible_train_feed():
    """allow_pad=False (the train feed): a batch that does not divide the
    mesh axis must refuse loudly — the loss has no trim point, so pad rows
    would enter InfoNCE as silently duplicated negatives.  The default
    (eval/serve feed) keeps padding and reports the real count to trim."""
    from keds_tpu.parallel.mesh import shard_batch

    mesh = make_mesh()
    x = jnp.zeros((9, 4), jnp.float32)  # 9 rows on the 8-device mesh
    with pytest.raises(ValueError, match="divide the mesh axis"):
        shard_batch(mesh, x, allow_pad=False)
    arr, n = shard_batch(mesh, x)
    assert arr.shape[0] == 16 and n == 9
