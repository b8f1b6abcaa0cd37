"""Orbax-native checkpoint format roundtrip (--checkpoint-format orbax)."""

import json
import os

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
    # Structure must be usable, not just leaf-equal: the crossformer stacks
    # are lists of per-layer dicts that crossformer_apply iterates.
    assert isinstance(loaded.retrieval_fuse, list)
    assert len(loaded.retrieval_fuse) == 2
    q = np.zeros((2, 1, D), np.float32)
    kv = np.zeros((2, 4, D), np.float32)
    out = mheads.crossformer_apply(loaded.retrieval_fuse, q, kv, kv)
    assert out.shape == (2, 1, D)


def _mk_heads(seed, d=D):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    return FusionHeads(
        img2text=mheads.init_im2text(k1, d, 24, d),
        retrieval_fuse=mheads.init_crossformer(k2, d, d, d, num_layers=2),
        text_condition=mheads.init_crossformer(k3, d, d, d, num_layers=2),
    )


def test_orbax_dispatch_and_opt_state_roundtrip(tmp_path):
    """load_heads_checkpoint dispatches on the directory; restore_opt_state
    round-trips the optax AdamW state classes through orbax."""
    import optax

    from keds_tpu.io.checkpoint import (
        load_heads_checkpoint,
        restore_opt_state,
    )

    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=1,
    )
    clip_params = mclip.init_clip(jax.random.key(0), cfg)
    heads = _mk_heads(1)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(heads)
    # Make the moments non-trivial so equality is meaningful.
    grads = jax.tree.map(lambda a: jax.numpy.ones_like(a), heads)
    updates, opt_state = opt.update(grads, opt_state, heads)
    path = str(tmp_path / "epoch_3.pt")
    save_train_checkpoint(path, epoch=3, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=heads, opt_state=opt_state,
                          fmt="orbax")
    assert os.path.isdir(path)

    loaded, epoch = load_heads_checkpoint(path)
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(heads), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    restored = restore_opt_state(path, opt.init(heads))
    # Same optax classes back (attribute access, not dicts) ...
    assert hasattr(restored[0], "mu") and hasattr(restored[0], "nu")
    # ... and the same values.
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_orbax_train_resume_eval_sweep(tmp_path, caplog):
    """The round-3 verdict seam: --checkpoint-format orbax produced
    checkpoints that neither resume nor the eval sweep could read.  Full
    chain: train 1 epoch (orbax) -> --resume auto continues from it ->
    the CIRR eval sweep consumes the orbax branch dirs."""
    import logging

    PIL = pytest.importorskip("PIL")
    pytest.importorskip("torch")
    from PIL import Image

    from keds_tpu.cli.eval_retrieval import main as eval_main
    from keds_tpu.cli.main import main as train_main
    from keds_tpu.io.pt import save_pt

    # d=64, not the module-level D=32: the eval CLI re-infers
    # transformer_heads = width // 64 from the state dict (reference
    # build_model parity), which must stay >= 1.
    d = 64
    cfg = mclip.ClipConfig(
        embed_dim=d, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, transformer_width=d, transformer_heads=1,
        transformer_layers=1,
    )
    clip_params = mclip.init_clip(jax.random.key(0), cfg)
    ckpt = str(tmp_path / "clip_ckpt.pt")
    save_train_checkpoint(ckpt, epoch=1, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=_mk_heads(1, d))
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    n = 16
    np.save(feat_dir / "image_features.npy",
            rng.standard_normal((n, d)).astype(np.float32))
    np.save(feat_dir / "text_features.npy",
            rng.standard_normal((n, d)).astype(np.float32))
    names = [f"s{i}" for i in range(n)]
    (feat_dir / "names.json").write_text(json.dumps(names))
    (feat_dir / "cc_subject.json").write_text(
        json.dumps({m: "a thing" for m in names}))
    (feat_dir / "cc_other.json").write_text(
        json.dumps({m: "* on a table" for m in names}))
    db = tmp_path / "db"
    db.mkdir()
    save_pt(np.float32(rng.standard_normal((32, d))),
            str(db / "cc_image_databases.pt"))
    save_pt(np.float32(rng.standard_normal((32, d))),
            str(db / "cc_text_databases.pt"))
    (db / "database_names.txt").write_text(
        "\n".join(f"n{i}" for i in range(32)))

    logs = tmp_path / "logs"
    base_args = [
        "--train-data", str(feat_dir), "--dataset-type", "directory",
        "--clip-weights", ckpt, "--database-path", str(db),
        "--batch-size", "8", "--warmup", "2", "--lr", "1e-3", "--wd", "0.1",
        "--precision", "fp32", "--logs", str(logs), "--name", "orb",
        "--db-topk", "4", "--stream", "image",
        "--checkpoint-format", "orbax",
    ]
    train_main(base_args + ["--epochs", "1"])
    ep1 = logs / "orb" / "checkpoints" / "epoch_1.pt"
    assert ep1.is_dir()

    caplog.set_level(logging.INFO)
    train_main(base_args + ["--epochs", "2", "--resume", "auto"])
    assert "resumed from" in caplog.text and "epoch 1" in caplog.text
    ep2 = logs / "orb" / "checkpoints" / "epoch_2.pt"
    assert ep2.is_dir()

    # Eval sweep over orbax branch checkpoint dirs (EvalContext.load_heads
    # -> load_heads_checkpoint isdir dispatch).
    root = tmp_path / "data"
    base = root / "CIRR"
    (base / "dev").mkdir(parents=True)
    (base / "captions").mkdir()
    (base / "image_splits").mkdir()
    inames = [f"img{i}" for i in range(8)]
    for m in inames:
        Image.fromarray(
            rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
        ).save(base / "dev" / f"{m}.png")
    caps = [{"reference": inames[q], "target_hard": inames[(q + 1) % 8],
             "caption": f"change {q}"} for q in range(4)]
    (base / "captions" / "cap.rc2.val.json").write_text(json.dumps(caps))
    (base / "image_splits" / "split.rc2.val.json").write_text(
        json.dumps({m: f"dev/{m}.png" for m in inames}))

    branch = str(logs / "orb" / "checkpoints")
    import keds_tpu.evalkit.evaluators as ev

    orig = ev.evaluate_cirr
    try:
        ev.evaluate_cirr = lambda ctx, s, t, epochs=None: orig(
            ctx, s, t, epochs=[1])
        eval_main([
            "--eval-mode", "cirr", "--resume", ckpt,
            "--root-data", str(root), "--database-path", str(db),
            "--image-branch", branch, "--text-branch", branch,
            "--batch-size", "4", "--precision", "fp32", "--db-topk", "4",
            "--logs", str(tmp_path / "evallogs"), "--name", "orbeval",
        ])
    finally:
        ev.evaluate_cirr = orig
    assert "CIRR[j=1]" in caplog.text and "recall_R@1" in caplog.text


def test_resolve_resume_finds_orbax_dirs(tmp_path):
    from keds_tpu.io.checkpoint import resolve_resume

    (tmp_path / "epoch_1.pt").mkdir()
    (tmp_path / "epoch_4.pt").mkdir()
    got = resolve_resume("auto", str(tmp_path))
    assert got == str(tmp_path / "epoch_4.pt")
