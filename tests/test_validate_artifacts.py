"""Turnkey real-artifact parity gate (tools/validate_artifacts.py): full
plumbing on synthetic stand-ins — fixed single-checkpoint branches, DB load,
CIRR eval dispatch, table/report emission, expected-number gating, and the
clean offline-HF failure mode."""

import json

import numpy as np
import pytest

import jax

pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from keds_tpu.io.checkpoint import save_train_checkpoint  # noqa: E402
from keds_tpu.io.pt import save_pt  # noqa: E402
from keds_tpu.models import clip as mclip, heads as mheads  # noqa: E402
from keds_tpu.models.composition import FusionHeads  # noqa: E402
from keds_tpu.tools.validate_artifacts import main as validate_main  # noqa: E402

D = 64


def _fixture(tmp_path):
    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=1,
    )
    clip_params = mclip.init_clip(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)

    def mk_heads(seed):
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        return FusionHeads(
            img2text=mheads.init_im2text(k1, D, 48, D),
            retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=3),
            text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=3),
        )

    # The published artifacts are SINGLE full checkpoints per stream.
    img_stream = str(tmp_path / "image_stream.pt")
    txt_stream = str(tmp_path / "text_stream.pt")
    save_train_checkpoint(img_stream, epoch=1, name="i", clip_params=clip_params,
                          clip_cfg=cfg, heads=mk_heads(2))
    save_train_checkpoint(txt_stream, epoch=1, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=mk_heads(3))

    db = tmp_path / "db"
    db.mkdir()
    save_pt(np.float32(rng.standard_normal((64, D))), str(db / "cc_image_databases.pt"))
    save_pt(np.float32(rng.standard_normal((64, D))), str(db / "cc_text_databases.pt"))
    (db / "database_names.txt").write_text("\n".join(f"n{i}" for i in range(64)))

    root = tmp_path / "data"
    base = root / "CIRR"
    (base / "dev").mkdir(parents=True)
    (base / "captions").mkdir()
    (base / "image_splits").mkdir()
    names = [f"img{i}" for i in range(8)]
    for n in names:
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(
            base / "dev" / f"{n}.png")
    caps = [{"reference": names[q], "target_hard": names[(q + 1) % 8],
             "caption": f"change {q}"} for q in range(4)]
    (base / "captions" / "cap.rc2.val.json").write_text(json.dumps(caps))
    (base / "image_splits" / "split.rc2.val.json").write_text(
        json.dumps({n: f"dev/{n}.png" for n in names}))
    return img_stream, txt_stream, str(db), str(root)


def test_validate_artifacts_cirr_plumbing(tmp_path, capsys):
    img_stream, txt_stream, db, root = _fixture(tmp_path)
    report = tmp_path / "report.json"
    validate_main([
        "--image-stream", img_stream, "--text-stream", txt_stream,
        "--db", db, "--data-root", root, "--eval-mode", "cirr",
        "--batch-size", "4", "--db-topk", "4", "--precision", "fp32",
        "--out", str(report),
    ])
    out = capsys.readouterr().out
    assert "CIRR" in out and "recall_R@1" in out
    rep = json.loads(report.read_text())
    table = rep["table"]
    assert set(table) == {"composed", "image", "mixture"}
    for row in table.values():
        for k in (1, 5, 10, 50, 100):
            assert f"recall_R@{k}" in row
    assert rep["parity_ok"] is None  # no expected numbers supplied

    # Gate PASSES when measured >= expected - tolerance ...
    expected = {"cirr": {"mixture": {"recall_R@1": table["mixture"]["recall_R@1"]}}}
    exp_file = tmp_path / "expected.json"
    exp_file.write_text(json.dumps(expected))
    validate_main([
        "--image-stream", img_stream, "--text-stream", txt_stream,
        "--db", db, "--data-root", root, "--eval-mode", "cirr",
        "--batch-size", "4", "--db-topk", "4", "--precision", "fp32",
        "--expected", str(exp_file), "--out", str(report),
    ])
    assert json.loads(report.read_text())["parity_ok"] is True

    # ... and FAILS (exit 1) when the target is unreachable.
    exp_file.write_text(json.dumps(
        {"cirr": {"mixture": {"recall_R@1": 200.0}}}))
    with pytest.raises(SystemExit) as e:
        validate_main([
            "--image-stream", img_stream, "--text-stream", txt_stream,
            "--db", db, "--data-root", root, "--eval-mode", "cirr",
            "--batch-size", "4", "--db-topk", "4", "--precision", "fp32",
            "--expected", str(exp_file),
        ])
    assert e.value.code == 1


def test_validate_artifacts_imgnet_plumbing(tmp_path):
    """ImageNet mode: ImageList trees, 4 domain prompts, the 0.1j mixture
    sweep with fixed-artifact heads, R@k/P@k table emission."""
    import json as _json

    img_stream, txt_stream, db, _ = _fixture(tmp_path)
    rng = np.random.default_rng(1)
    root = tmp_path / "data"
    imgdir = root / "imgnet" / "imgs"
    imgdir.mkdir(parents=True)
    q_lines, t_lines = [], []
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(
            imgdir / f"q{i}.png")
        q_lines.append(f"imgnet/imgs/q{i}.png {i % 3}")
    for i in range(9):
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(
            imgdir / f"t{i}.png")
        t_lines.append(f"imgnet/imgs/t{i}.png {i % 3}")
    (root / "imgnet" / "imgnet_real_query.txt").write_text("\n".join(q_lines))
    (root / "imgnet" / "imgnet_targets.txt").write_text("\n".join(t_lines))

    report = tmp_path / "imgnet_report.json"
    validate_main([
        "--image-stream", img_stream, "--text-stream", txt_stream,
        "--db", db, "--data-root", str(root), "--eval-mode", "imgnet",
        "--imgnet-epochs", "5", "--batch-size", "4", "--db-topk", "4",
        "--precision", "fp32", "--out", str(report),
    ])
    rep = _json.loads(report.read_text())
    # 1 j x 4 prompts x 3 feature keys
    assert len(rep["table"]) == 12
    for row, metrics in rep["table"].items():
        assert row.startswith("5|a ")
        for k in (1, 5, 10):
            assert f"Real2Sketch_R@{k}" in metrics
            assert f"Real2Sketch_P@{k}" in metrics


def test_validate_artifacts_hf_offline_fails_cleanly(tmp_path, monkeypatch):
    """hf:<filename> specs must exit 2 with a clear message when the fetch
    is impossible (the zero-egress case), not crash mid-pipeline."""
    import huggingface_hub

    def boom(**kwargs):
        raise OSError("offline")

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", boom)
    with pytest.raises(SystemExit) as e:
        validate_main([
            "--image-stream", "hf:image_stream.pt",
            "--text-stream", "hf:text_stream.pt",
            "--db", str(tmp_path), "--data-root", str(tmp_path),
        ])
    assert e.value.code == 2


def test_validate_artifacts_missing_local_path(tmp_path):
    with pytest.raises(SystemExit, match="artifact not found"):
        validate_main([
            "--image-stream", str(tmp_path / "nope.pt"),
            "--text-stream", str(tmp_path / "nope2.pt"),
            "--db", str(tmp_path), "--data-root", str(tmp_path),
        ])


def test_print_table_fails_on_unmatched_expected(capsys):
    """An expected row/metric the evaluator never emitted (typo'd key, wrong
    eval mode) must FAIL the gate, not pass by never being compared."""
    from keds_tpu.tools.validate_artifacts import _print_table

    table = {"mixture": {"recall_R@1": 30.0}}
    ok = _print_table("t", table, {"mixture": {"recall_R@1": 29.9}}, tol=0.5)
    assert ok
    # typo'd row key
    assert not _print_table("t", table, {"mixure": {"recall_R@1": 29.9}},
                            tol=0.5)
    # metric name the evaluator does not emit
    assert not _print_table("t", table, {"mixture": {"recall_R@7": 1.0}},
                            tol=0.5)
    out = capsys.readouterr().out
    assert "EXPECTED ENTRY NOT MEASURED" in out


def _fashion_root(tmp_path, rng):
    root = tmp_path / "data"
    base = root / "fashion-iq"
    (base / "images").mkdir(parents=True)
    (base / "json").mkdir()
    (base / "image_splits").mkdir()
    names = [f"d{i}" for i in range(8)]
    for n in names:
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(
            base / "images" / f"{n}.png")
    for cloth in ("dress", "shirt"):
        caps = [{"candidate": names[q], "target": names[(q + 2) % 8],
                 "captions": [f"is red {q}", f"has stripes {q}"]}
                for q in range(4)]
        (base / "json" / f"cap.{cloth}.val.json").write_text(json.dumps(caps))
        (base / "image_splits" / f"split.{cloth}.val.json").write_text(
            json.dumps(names))
    return str(root)


def test_validate_artifacts_fashion_plumbing(tmp_path):
    """Fashion mode: per-cloth loop, the 0.05j mixture sweep with fixed
    artifacts, cloth-prefixed rows, R@10/50 table."""
    img_stream, txt_stream, db, _ = _fixture(tmp_path)
    root = _fashion_root(tmp_path / "f", np.random.default_rng(2))
    report = tmp_path / "fashion_report.json"
    validate_main([
        "--image-stream", img_stream, "--text-stream", txt_stream,
        "--db", db, "--data-root", root, "--eval-mode", "fashion",
        "--source-data", "dress,shirt", "--sweep-epochs", "10",
        "--batch-size", "4", "--db-topk", "4", "--precision", "fp32",
        "--out", str(report),
    ])
    table = json.loads(report.read_text())["table"]
    # 2 cloths x 1 j x 3 feature keys
    assert len(table) == 6
    for row, metrics in table.items():
        cloth, j, key = row.split("|")
        assert cloth in ("dress", "shirt") and j == "10"
        assert key in ("composed", "image", "mixture")
        for k in (10, 50):
            assert f"R@{k}" in metrics


def test_validate_artifacts_coco_plumbing(tmp_path):
    import csv

    img_stream, txt_stream, db, _ = _fixture(tmp_path)
    rng = np.random.default_rng(3)
    root = tmp_path / "cdata"
    base = root / "coco"
    (base / "val2017").mkdir(parents=True)
    (base / "val2017_masked").mkdir()
    rows = []
    for i in range(6):
        name = f"{i:012d}.jpg"
        for d in ("val2017", "val2017_masked"):
            Image.fromarray(rng.integers(0, 255, (36, 36, 3),
                                         dtype=np.uint8)).save(base / d / name)
        rows.append({"id": name, "query_regions": "2;2;30;30",
                     "query_class": "dog", "classes": "cat;tree"})
    with open(base / "coco_eval.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    report = tmp_path / "coco_report.json"
    validate_main([
        "--image-stream", img_stream, "--text-stream", txt_stream,
        "--db", db, "--data-root", str(root), "--eval-mode", "coco",
        "--sweep-epochs", "10", "--batch-size", "3", "--db-topk", "4",
        "--precision", "fp32", "--out", str(report),
    ])
    table = json.loads(report.read_text())["table"]
    assert set(table) == {f"10|{k}" for k in ("composed", "image", "mixture")}
    for metrics in table.values():
        for k in (1, 5, 10):
            assert f"image_to_ref_R@{k}" in metrics


def test_validate_artifacts_cirr_test_submissions(tmp_path):
    """cirr_test mode writes the four test-server JSONs (no recall table
    exists client-side, so --expected must be refused)."""
    img_stream, txt_stream, db, _ = _fixture(tmp_path)
    rng = np.random.default_rng(4)
    root = tmp_path / "tdata"
    base = root / "CIRR"
    (base / "test1").mkdir(parents=True)
    (base / "captions").mkdir()
    (base / "image_splits").mkdir()
    names = [f"t{i}" for i in range(60)]
    for n in names:
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(
            base / "test1" / f"{n}.png")
    caps = [{"reference": names[q], "caption": f"modify {q}", "pairid": 1000 + q}
            for q in range(4)]
    (base / "captions" / "cap.rc2.test1.json").write_text(json.dumps(caps))
    (base / "image_splits" / "split.rc2.test1.json").write_text(
        json.dumps({n: f"test1/{n}.png" for n in names}))

    sub = tmp_path / "subs"
    report = tmp_path / "cirr_test_report.json"
    validate_main([
        "--image-stream", img_stream, "--text-stream", txt_stream,
        "--db", db, "--data-root", str(root), "--eval-mode", "cirr_test",
        "--submission-dir", str(sub), "--batch-size", "4", "--db-topk", "4",
        "--precision", "fp32", "--out", str(report),
    ])
    for key in ("composed", "image", "text", "mixture"):
        payload = json.loads((sub / f"{key}.json").read_text())
        assert payload["version"] == "rc2" and payload["metric"] == "recall"
        assert len(payload) == 2 + 4  # version/metric + the 4 queries
        for pid in range(1000, 1004):
            assert len(payload[str(pid)]) == 50
    assert json.loads(report.read_text())["table"]["mixture"]["n_queries"] == 4

    import pytest as _pytest
    with _pytest.raises(SystemExit, match="expected does not apply"):
        validate_main([
            "--image-stream", img_stream, "--text-stream", txt_stream,
            "--db", db, "--data-root", str(root), "--eval-mode", "cirr_test",
            "--submission-dir", str(sub), "--batch-size", "4",
            "--db-topk", "4", "--precision", "fp32",
            "--expected", str(report),
        ])


def test_validate_artifacts_quant_modes(tmp_path):
    """--quant-towers int8 + --retrieval int8 run through the same gate and
    report deltas vs the bf16/xla table (VERDICT round-4 missing #2: one
    command resolves the int8 accuracy asterisk when artifacts land)."""
    img_stream, txt_stream, db, root = _fixture(tmp_path)
    base_report = tmp_path / "base.json"
    validate_main([
        "--image-stream", img_stream, "--text-stream", txt_stream,
        "--db", db, "--data-root", root, "--eval-mode", "cirr",
        "--batch-size", "4", "--db-topk", "4", "--precision", "fp32",
        "--out", str(base_report),
    ])
    base = json.loads(base_report.read_text())
    assert base["quant_towers"] == "none" and base["retrieval"] == "xla"

    # the bf16-measured numbers as the --expected gate for the int8 run
    exp_file = tmp_path / "expected.json"
    exp_file.write_text(json.dumps(
        {"cirr": {"mixture": {
            "recall_R@50": base["table"]["mixture"]["recall_R@50"]}}}))
    q_report = tmp_path / "quant.json"
    validate_main([
        "--image-stream", img_stream, "--text-stream", txt_stream,
        "--db", db, "--data-root", root, "--eval-mode", "cirr",
        "--batch-size", "4", "--db-topk", "4", "--precision", "fp32",
        "--quant-towers", "int8", "--retrieval", "int8",
        "--expected", str(exp_file), "--tolerance", "100",
        "--out", str(q_report),
    ])
    rep = json.loads(q_report.read_text())
    assert rep["quant_towers"] == "int8" and rep["retrieval"] == "int8"
    assert rep["parity_ok"] is True
    assert set(rep["table"]) == {"composed", "image", "mixture"}
