"""Precomputed-neighbor training (tools/precompute_neighbors.py + the
--neighbors gather path in make_train_step).

In features mode the retrieval queries are frozen CLIP embeddings, so the
per-step top-k search is a pure function of the sample and hoists offline;
these tests pin (1) the tool's indices against a numpy brute force, (2) the
gather step's BIT-identical trajectory vs the in-step search for both
streams, (3) the k-prefix slicing, (4) the stale-pack refusal, and (5) CLI
end-to-end equality of checkpoints trained with and without --neighbors.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keds_tpu.models import clip as mclip
from keds_tpu.models import heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.retrieval.database import KnowledgeDB, Retriever, db_fingerprint
from keds_tpu.tools.precompute_neighbors import (
    dataset_fingerprint,
    load_neighbors,
    main as precompute_main,
)
from keds_tpu.train import losses
from keds_tpu.train.trainer import make_optimizer, make_train_step

D = 64
SPLIT_ID = 265
EOT = 49407
SOT = 49406
N_SAMPLES = 24
N_DB = 96


def _tokens_row(body):
    row = np.zeros(77, dtype=np.int32)
    row[: len(body)] = body
    return row


@pytest.fixture(scope="module")
def feature_dir(tmp_path_factory):
    """Packed feature dir + reference-format DB dir + a neighbor pack."""
    base = tmp_path_factory.mktemp("nbr")
    rng = np.random.default_rng(0)
    feats = base / "features"
    feats.mkdir()
    np.save(feats / "image_features.npy",
            rng.standard_normal((N_SAMPLES, D)).astype(np.float32))
    np.save(feats / "text_features.npy",
            rng.standard_normal((N_SAMPLES, D)).astype(np.float32))
    names = [f"s{i}" for i in range(N_SAMPLES)]
    (feats / "names.json").write_text(json.dumps(names))
    (feats / "cc_subject.json").write_text(json.dumps({n: "thing" for n in names}))
    (feats / "cc_other.json").write_text(json.dumps({n: "a * thing" for n in names}))

    from keds_tpu.io.pt import save_pt

    db_dir = base / "db"
    db_dir.mkdir()
    img_db = rng.standard_normal((N_DB, D)).astype(np.float32)
    txt_db = rng.standard_normal((N_DB, D)).astype(np.float32)
    img_db /= np.linalg.norm(img_db, axis=1, keepdims=True)
    txt_db /= np.linalg.norm(txt_db, axis=1, keepdims=True)
    save_pt(img_db, str(db_dir / "cc_image_databases.pt"))
    save_pt(txt_db, str(db_dir / "cc_text_databases.pt"))
    (db_dir / "database_names.txt").write_text(
        "\n".join(f"n{i}" for i in range(N_DB)))

    out = str(feats / "neighbors.npz")
    precompute_main(["--train-data", str(feats), "--database-path",
                     str(db_dir), "--out", out, "--db-topk", "8",
                     "--batch", "7", "--precision", "fp32"])

    # tiny CLIP train checkpoint for the CLI runs (--clip-weights)
    from keds_tpu.io.checkpoint import save_train_checkpoint

    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=2,
    )
    params = mclip.init_clip(jax.random.key(0), cfg)
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    heads = FusionHeads(
        img2text=mheads.init_im2text(k1, D, 48, D),
        retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=3),
        text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=3),
    )
    clip_ckpt = str(base / "clip_ckpt.pt")
    save_train_checkpoint(clip_ckpt, epoch=1, name="t", clip_params=params,
                          clip_cfg=cfg, heads=heads)
    return feats, db_dir, out, clip_ckpt


def test_tool_indices_match_numpy_bruteforce(feature_dir):
    feats, db_dir, out, _ = feature_dir
    img_idx, txt_idx, cap2_idx, meta = load_neighbors(out)
    assert img_idx.shape == (N_SAMPLES, 8) and cap2_idx.shape == (N_SAMPLES, 2)

    fi = np.load(feats / "image_features.npy")
    ft = np.load(feats / "text_features.npy")
    from keds_tpu.io import load_pt

    img_db = np.asarray(load_pt(str(db_dir / "cc_image_databases.pt")), np.float32)
    txt_db = np.asarray(load_pt(str(db_dir / "cc_text_databases.pt")), np.float32)
    q = fi / np.linalg.norm(fi, axis=1, keepdims=True)
    # the caption query is normalized TWICE in-step (trainer caps_n +
    # retrieve_caption_neighbors) — the tool reproduces both roundings
    qc = ft / np.linalg.norm(ft, axis=1, keepdims=True)
    qc = qc / np.linalg.norm(qc, axis=1, keepdims=True)
    want_img = np.argsort(-(q @ img_db.T), axis=1, kind="stable")[:, :8]
    want_txt = np.argsort(-(q @ txt_db.T), axis=1, kind="stable")[:, :8]
    want_cap = np.argsort(-(qc @ txt_db.T), axis=1, kind="stable")[:, :2]
    np.testing.assert_array_equal(img_idx, want_img)
    np.testing.assert_array_equal(txt_idx, want_txt)
    np.testing.assert_array_equal(cap2_idx, want_cap)

    db = KnowledgeDB.load(str(db_dir / "cc_image_databases.pt"),
                          str(db_dir / "cc_text_databases.pt"),
                          str(db_dir / "database_names.txt"),
                          dtype=jnp.float32)
    assert meta == dict(db_fingerprint(db), k=8, precision="fp32", backend="cpu",
                        **dataset_fingerprint([f"s{i}" for i in range(N_SAMPLES)]))


def _setup_step(db_dir, stream, db_topk):
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
    db = KnowledgeDB.load(str(db_dir / "cc_image_databases.pt"),
                          str(db_dir / "cc_text_databases.pt"),
                          str(db_dir / "database_names.txt"),
                          dtype=jnp.float32)
    retriever = Retriever(db)
    from keds_tpu.config import Config

    opt, _ = make_optimizer(Config(lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-6,
                                   wd=0.1, warmup=1, skip_scheduler=True), 10)
    db_other = None
    if stream == "text":
        db_other = jnp.asarray(np.stack([
            _tokens_row([SOT, 320, 1125, 539, SPLIT_ID, SPLIT_ID, 70 + i, EOT])
            for i in range(N_DB)
        ]))
    step = make_train_step(
        clip_params, cfg, retriever, opt, stream=stream,
        prompt_tokens=_tokens_row([SOT, 320, 1125, 539, EOT])[None, :],
        split_id=SPLIT_ID, db_topk=db_topk, db_other_tokens=db_other,
        compute_dtype=jnp.float32,
    )
    return heads, opt.init(heads), step


@pytest.mark.parametrize("stream", ["image", "text"])
def test_gather_step_bit_identical_to_search_step(feature_dir, stream):
    feats, db_dir, out, _ = feature_dir
    img_idx, txt_idx, cap2_idx, _ = load_neighbors(out)
    k = 4  # below the pack's k=8: exercises the top-k prefix slice
    heads, opt_state, step = _setup_step(db_dir, stream, db_topk=k)
    fi = np.load(feats / "image_features.npy")[:8]
    ft = np.load(feats / "text_features.npy")[:8]
    other = np.stack([
        _tokens_row([SOT, 320, 1125, 539, SPLIT_ID, SPLIT_ID, 1929, EOT])
        for _ in range(8)
    ])
    common = dict(
        image_features=jnp.asarray(fi), caption_features=jnp.asarray(ft),
        other_tokens=jnp.asarray(other),
    )
    rng = jax.random.key(7)
    h_s, o_s, loss_s = step(heads, opt_state, losses.TrainBatch(**common), rng)
    h_g, o_g, loss_g = step(
        heads, opt_state,
        losses.TrainBatch(**common,
                          img_idx=jnp.asarray(img_idx[:8, :k]),
                          txt_idx=jnp.asarray(txt_idx[:8, :k]),
                          cap2_idx=jnp.asarray(cap2_idx[:8])), rng)
    assert float(loss_g) == float(loss_s)
    for a, b in zip(jax.tree.leaves(h_g), jax.tree.leaves(h_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(o_g), jax.tree.leaves(o_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _run_train_cli(feats, db_dir, clip_ckpt, logs, name, extra):
    from keds_tpu.cli.main import main as train_main

    train_main([
        "--train-data", str(feats), "--dataset-type", "directory",
        "--clip-weights", clip_ckpt,
        "--database-path", str(db_dir), "--batch-size", "8", "--epochs", "1",
        "--stream", "image", "--db-topk", "4", "--precision", "fp32",
        "--lr", "1e-3", "--warmup", "1", "--workers", "0",
        "--logs", str(logs), "--name", name, "--no-time-suffix",
    ] + extra)
    return os.path.join(str(logs), name, "checkpoints", "epoch_1.pt")


def test_cli_neighbors_trains_identically(feature_dir, tmp_path):
    """One epoch with --neighbors == one epoch without, checkpoint-bitwise.
    (Same seed -> same shuffle -> same batches; the step itself is pinned
    bit-identical above — this covers the CLI plumbing end to end.)"""
    feats, db_dir, out, clip_ckpt = feature_dir
    from keds_tpu.io import load_pt

    ck_a = _run_train_cli(feats, db_dir, clip_ckpt, tmp_path / "a", "plain", [])
    ck_b = _run_train_cli(feats, db_dir, clip_ckpt, tmp_path / "b", "nbr",
                          ["--neighbors", "auto"])
    a = load_pt(ck_a)
    b = load_pt(ck_b)
    for key in ("state_dict_img2text", "state_dict_retrieval_fuse",
                "state_dict_text_condition"):
        for pk in a[key]:
            np.testing.assert_array_equal(np.asarray(a[key][pk]),
                                          np.asarray(b[key][pk]))


def test_stale_pack_refused(feature_dir, tmp_path):
    """A pack built against a different DB must refuse loudly at the CLI."""
    feats, db_dir, out, clip_ckpt = feature_dir
    from keds_tpu.io.pt import save_pt

    rng = np.random.default_rng(9)
    other_db = tmp_path / "db2"
    other_db.mkdir()
    img = rng.standard_normal((N_DB, D)).astype(np.float32)
    txt = rng.standard_normal((N_DB, D)).astype(np.float32)
    save_pt(img / np.linalg.norm(img, axis=1, keepdims=True),
            str(other_db / "cc_image_databases.pt"))
    save_pt(txt / np.linalg.norm(txt, axis=1, keepdims=True),
            str(other_db / "cc_text_databases.pt"))
    (other_db / "database_names.txt").write_text(
        "\n".join(f"n{i}" for i in range(N_DB)))

    from keds_tpu.cli.main import main as train_main

    with pytest.raises(SystemExit, match="stale"):
        train_main([
            "--train-data", str(feats), "--dataset-type", "directory",
            "--clip-weights", clip_ckpt,
            "--database-path", str(other_db), "--batch-size", "8",
            "--epochs", "1", "--stream", "image", "--db-topk", "4",
            "--precision", "fp32", "--workers", "0", "--neighbors", "auto",
            "--logs", str(tmp_path / "logs"), "--name", "stale",
            "--no-time-suffix",
        ])


def test_neighbors_refused_for_raw_modes(tmp_path):
    from keds_tpu.cli.main import main as train_main

    with pytest.raises(SystemExit, match="precomputed features"):
        train_main(["--train-data", "x.csv", "--dataset-type", "csv",
                    "--neighbors", "auto"])


def test_gather_step_on_8dev_mesh_matches_search_step(feature_dir):
    """Neighbors mode under the data mesh (sharded batch + index fields,
    replicated heads, SHARDED DB rows): the mesh gather step must equal the
    mesh SEARCH step bit for bit — pins that a global gather by precomputed
    index works against shard_over's padded row layout.  (Comparison is
    mesh-vs-mesh: a 1-device run differs from an 8-device run at the last
    f32 ulp because the contrastive reduction tiles differently.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from keds_tpu.parallel.mesh import make_mesh

    feats, db_dir, out, _ = feature_dir
    img_idx, txt_idx, cap2_idx, _ = load_neighbors(out)
    k = 4
    heads, _, _ = _setup_step(db_dir, "image", db_topk=k)
    fi = np.load(feats / "image_features.npy")[:16]
    ft = np.load(feats / "text_features.npy")[:16]
    other = np.stack([
        _tokens_row([SOT, 320, 1125, 539, SPLIT_ID, SPLIT_ID, 1929, EOT])
        for _ in range(16)
    ])
    batch = losses.TrainBatch(
        image_features=jnp.asarray(fi), caption_features=jnp.asarray(ft),
        other_tokens=jnp.asarray(other),
        img_idx=jnp.asarray(img_idx[:16, :k]),
        txt_idx=jnp.asarray(txt_idx[:16, :k]),
        cap2_idx=jnp.asarray(cap2_idx[:16]),
    )
    rng = jax.random.key(11)

    mesh = make_mesh()
    db = KnowledgeDB.load(str(db_dir / "cc_image_databases.pt"),
                          str(db_dir / "cc_text_databases.pt"),
                          str(db_dir / "database_names.txt"),
                          dtype=jnp.float32).shard_over(mesh)
    retr = Retriever(db, mesh=mesh, sharded=True)
    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=2,
    )
    clip_params = mclip.init_clip(jax.random.key(0), cfg)
    from keds_tpu.config import Config

    opt, _ = make_optimizer(Config(lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-6,
                                   wd=0.1, warmup=1, skip_scheduler=True), 10)
    rep = NamedSharding(mesh, P())
    heads_r = jax.device_put(heads, rep)
    opt_r = jax.device_put(opt.init(heads_r), rep)
    step_m = make_train_step(
        jax.device_put(clip_params, rep), cfg, retr, opt, stream="image",
        prompt_tokens=_tokens_row([SOT, 320, 1125, 539, EOT])[None, :],
        split_id=SPLIT_ID, db_topk=k, compute_dtype=jnp.float32,
    )
    shard = NamedSharding(mesh, P("data"))
    batch_m = losses.TrainBatch(
        *(jax.device_put(a, shard) for a in batch))
    h_g, _, loss_g = step_m(heads_r, opt_r, batch_m, rng)
    # same mesh, same step builder, but the SEARCH path (no index fields)
    batch_s = losses.TrainBatch(
        *(jax.device_put(a, shard) for a in batch[:3]))
    h_s, _, loss_s = step_m(heads_r, opt_r, batch_s, rng)
    assert float(loss_g) == float(loss_s)
    for a, b in zip(jax.tree.leaves(h_g), jax.tree.leaves(h_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_neighbors_refuses_non_exact_backend(feature_dir, tmp_path):
    """--neighbors bypasses the in-step search, so combining it with
    --retrieval-backend approx/int8 would silently override the requested
    trajectory — refuse loudly instead."""
    feats, db_dir, out, clip_ckpt = feature_dir
    from keds_tpu.cli.main import main as train_main

    with pytest.raises(SystemExit, match="silently override"):
        train_main([
            "--train-data", str(feats), "--dataset-type", "directory",
            "--clip-weights", clip_ckpt, "--database-path", str(db_dir),
            "--batch-size", "8", "--epochs", "1", "--stream", "image",
            "--neighbors", "auto", "--retrieval-backend", "approx",
            "--logs", str(tmp_path / "logs"), "--name", "conflict",
            "--no-time-suffix",
        ])


def test_neighbors_refused_for_auto_resolved_csv(tmp_path):
    """'auto' + a .csv train file resolves to the raw csv mode — the
    --neighbors refusal must fire on the RESOLVED type, not the literal
    flag value (a silent fall-through would ignore the pack)."""
    from keds_tpu.cli.main import main as train_main

    csv = tmp_path / "data.csv"
    csv.write_text("filepath\ttitle\nx.png\ta caption\n")
    with pytest.raises(SystemExit, match="precomputed features"):
        train_main(["--train-data", str(csv), "--dataset-type", "auto",
                    "--neighbors", "auto"])


@pytest.mark.parametrize("stream,missing", [("image", ["txt_idx"]),
                                            ("text", ["txt_idx", "cap2_idx"]),
                                            ("text", ["cap2_idx"])])
def test_partial_index_triple_refused(feature_dir, stream, missing):
    """A batch carrying img_idx but an incomplete index triple must be
    refused with a message naming the missing fields and the pack tool
    (advisor round-4: the old img_idx-only check let partial triples
    die in opaque shape/attribute errors)."""
    feats, db_dir, out, _ = feature_dir
    img_idx, txt_idx, cap2_idx, _ = load_neighbors(out)
    k = 4
    heads, opt_state, step = _setup_step(db_dir, stream, db_topk=k)
    fi = np.load(feats / "image_features.npy")[:8]
    ft = np.load(feats / "text_features.npy")[:8]
    other = np.stack([
        _tokens_row([SOT, 320, 1125, 539, SPLIT_ID, SPLIT_ID, 1929, EOT])
        for _ in range(8)
    ])
    nb = dict(img_idx=jnp.asarray(img_idx[:8, :k]),
              txt_idx=jnp.asarray(txt_idx[:8, :k]),
              cap2_idx=jnp.asarray(cap2_idx[:8]))
    for name in missing:
        nb.pop(name)
    batch = losses.TrainBatch(
        image_features=jnp.asarray(fi), caption_features=jnp.asarray(ft),
        other_tokens=jnp.asarray(other), **nb)
    with pytest.raises(ValueError, match="precompute_neighbors"):
        step(heads, opt_state, batch, jax.random.key(7))
