"""Batch serving CLI (keds_tpu/cli/serve.py) end-to-end on synthetic data."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from keds_tpu.cli.serve import main as serve_main  # noqa: E402
from keds_tpu.io.checkpoint import save_train_checkpoint  # noqa: E402
from keds_tpu.io.pt import save_pt  # noqa: E402
from keds_tpu.models import clip as mclip, heads as mheads  # noqa: E402
from keds_tpu.models.composition import FusionHeads  # noqa: E402

D = 64


def test_serve_cli_end_to_end(tmp_path):
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
    resume = str(tmp_path / "ckpt.pt")
    save_train_checkpoint(resume, epoch=1, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=heads)
    rng = np.random.default_rng(0)
    db = tmp_path / "db"
    db.mkdir()
    save_pt(np.float32(rng.standard_normal((64, D))), str(db / "cc_image_databases.pt"))
    save_pt(np.float32(rng.standard_normal((64, D))), str(db / "cc_text_databases.pt"))
    (db / "database_names.txt").write_text("\n".join(f"n{i}" for i in range(64)))

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(9):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            corpus / f"c{i}.png")
    queries = tmp_path / "queries.jsonl"
    qimg = str(corpus / "c0.png")
    queries.write_text("\n".join(
        json.dumps({"image": qimg, "text": f"make it {w} *"})
        for w in ("red", "blue", "green")
    ))

    out = tmp_path / "results.jsonl"
    serve_main([
        "--resume", resume, "--database-path", str(db),
        "--target-data", str(corpus), "--query_file", str(queries),
        "--demo-out", str(out), "--batch-size", "4", "--db-topk", "4",
        "--precision", "fp32", "--logs", str(tmp_path / "logs"),
        "--name", "serve", "--no-time-suffix",
    ])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 3
    for rec in lines:
        assert rec["query"] == qimg
        assert len(rec["results"]) == 9
        names = [r["name"] for r in rec["results"]]
        assert set(names) <= {f"c{i}.png" for i in range(9)}
        scores = [r["score"] for r in rec["results"]]
        assert scores == sorted(scores, reverse=True)
    # different prompts must produce different rankings or scores
    assert any(lines[0]["results"][i]["score"] != lines[1]["results"][i]["score"]
               for i in range(9))

    # a corrupt corpus image must fail LOUDLY, not silently truncate the
    # corpus (round-2 review finding on the loader's producer thread)
    (corpus / "broken.png").write_bytes(b"not an image")
    with pytest.raises(Exception):
        serve_main([
            "--resume", resume, "--database-path", str(db),
            "--target-data", str(corpus), "--query_file", str(queries),
            "--demo-out", str(tmp_path / "r2.jsonl"), "--batch-size", "4",
            "--db-topk", "4", "--precision", "fp32",
            "--logs", str(tmp_path / "logs2"), "--name", "serve2",
            "--no-time-suffix",
        ])


def test_serve_cli_topn_workers_device_rank(tmp_path, monkeypatch):
    """--topn + multi-worker query decode + the device-ranking path
    (threshold monkeypatched down so the tiny corpus exercises it)."""
    import keds_tpu.cli.serve as serve_mod

    monkeypatch.setattr(serve_mod, "DEVICE_RANK_MIN_ROWS", 1)
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
    resume = str(tmp_path / "ckpt.pt")
    save_train_checkpoint(resume, epoch=1, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=heads)
    rng = np.random.default_rng(0)
    db = tmp_path / "db"
    db.mkdir()
    save_pt(np.float32(rng.standard_normal((64, D))), str(db / "cc_image_databases.pt"))
    save_pt(np.float32(rng.standard_normal((64, D))), str(db / "cc_text_databases.pt"))
    (db / "database_names.txt").write_text("\n".join(f"n{i}" for i in range(64)))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(9):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            corpus / f"c{i}.png")
    queries = tmp_path / "queries.jsonl"
    qimg = str(corpus / "c0.png")
    queries.write_text("\n".join(
        json.dumps({"image": qimg, "text": f"make it {w} *"})
        for w in ("red", "blue", "green", "tiny", "huge")
    ))
    out = tmp_path / "results.jsonl"
    serve_main([
        "--resume", resume, "--database-path", str(db),
        "--target-data", str(corpus), "--query_file", str(queries),
        "--demo-out", str(out), "--batch-size", "2", "--db-topk", "4",
        "--topn", "3", "--workers", "2", "--precision", "fp32",
        "--logs", str(tmp_path / "logs"), "--name", "serve-topn",
        "--no-time-suffix",
    ])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 5
    for rec in lines:
        assert len(rec["results"]) == 3
        scores = [r["score"] for r in rec["results"]]
        assert scores == sorted(scores, reverse=True)

    # device ranking must agree with the host path on the same inputs
    monkeypatch.setattr(serve_mod, "DEVICE_RANK_MIN_ROWS", 10**9)
    out_host = tmp_path / "results_host.jsonl"
    serve_main([
        "--resume", resume, "--database-path", str(db),
        "--target-data", str(corpus), "--query_file", str(queries),
        "--demo-out", str(out_host), "--batch-size", "2", "--db-topk", "4",
        "--topn", "3", "--precision", "fp32",
        "--logs", str(tmp_path / "logs2"), "--name", "serve-host",
        "--no-time-suffix",
    ])
    host_lines = [json.loads(l) for l in out_host.read_text().splitlines()]
    for dev_rec, host_rec in zip(lines, host_lines):
        assert [r["name"] for r in dev_rec["results"]] == \
            [r["name"] for r in host_rec["results"]]
        np.testing.assert_allclose(
            [r["score"] for r in dev_rec["results"]],
            [r["score"] for r in host_rec["results"]], rtol=1e-5, atol=1e-5)


def test_serve_cli_db_shard_matches_single_device(tmp_path):
    """BASELINE config 4 serving at CLI level: --db-shard on the 8-device
    mesh must reproduce the single-device run's rankings and scores."""
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
    resume = str(tmp_path / "ckpt.pt")
    save_train_checkpoint(resume, epoch=1, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=heads)
    rng = np.random.default_rng(5)
    db = tmp_path / "db"
    db.mkdir()
    # non-divisible rows exercise sharded-merge pad masking end-to-end
    save_pt(np.float32(rng.standard_normal((261, D))), str(db / "cc_image_databases.pt"))
    save_pt(np.float32(rng.standard_normal((261, D))), str(db / "cc_text_databases.pt"))
    (db / "database_names.txt").write_text("\n".join(f"n{i}" for i in range(261)))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(9):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            corpus / f"c{i}.png")
    queries = tmp_path / "queries.jsonl"
    qimg = str(corpus / "c0.png")
    queries.write_text("\n".join(
        json.dumps({"image": qimg, "text": f"make it {w} *"})
        for w in ("red", "blue", "green")
    ))

    outs = {}
    for tag, extra in (("shard", ["--db-shard"]),
                       ("single", ["--num-partitions", "1"])):
        out = tmp_path / f"results_{tag}.jsonl"
        serve_main([
            "--resume", resume, "--database-path", str(db),
            "--target-data", str(corpus), "--query_file", str(queries),
            "--demo-out", str(out), "--batch-size", "4", "--db-topk", "4",
            "--precision", "fp32", "--logs", str(tmp_path / f"logs_{tag}"),
            "--name", tag, "--no-time-suffix",
        ] + extra)
        outs[tag] = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(outs["shard"]) == 3
    for a, b in zip(outs["shard"], outs["single"]):
        assert [r["name"] for r in a["results"]] == [r["name"] for r in b["results"]]
        np.testing.assert_allclose(
            [r["score"] for r in a["results"]],
            [r["score"] for r in b["results"]], atol=1e-5)


def test_serve_cli_orbax_resume(tmp_path):
    """--resume <orbax dir> serves with CLIP from --clip-weights (orbax
    checkpoints carry heads only)."""
    pytest.importorskip("orbax.checkpoint")
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
    clip_ckpt = str(tmp_path / "clip.pt")
    save_train_checkpoint(clip_ckpt, epoch=1, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=heads)
    orbax_dir = str(tmp_path / "epoch_1.pt")
    save_train_checkpoint(orbax_dir, epoch=1, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=heads, fmt="orbax")
    rng = np.random.default_rng(0)
    db = tmp_path / "db"
    db.mkdir()
    save_pt(np.float32(rng.standard_normal((32, D))), str(db / "cc_image_databases.pt"))
    save_pt(np.float32(rng.standard_normal((32, D))), str(db / "cc_text_databases.pt"))
    (db / "database_names.txt").write_text("\n".join(f"n{i}" for i in range(32)))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            corpus / f"c{i}.png")
    queries = tmp_path / "queries.jsonl"
    queries.write_text(json.dumps(
        {"image": str(corpus / "c0.png"), "text": "make it red *"}))
    out = tmp_path / "results.jsonl"
    serve_main([
        "--resume", orbax_dir, "--clip-weights", clip_ckpt,
        "--database-path", str(db), "--target-data", str(corpus),
        "--query_file", str(queries), "--demo-out", str(out),
        "--batch-size", "4", "--db-topk", "4", "--precision", "fp32",
        "--logs", str(tmp_path / "logs"), "--name", "orbserve",
        "--no-time-suffix",
    ])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 1 and len(lines[0]["results"]) == 5
