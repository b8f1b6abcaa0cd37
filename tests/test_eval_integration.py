"""End-to-end evaluator integration on a synthetic CIRR/Fashion-shaped
dataset: tiny CLIP, real checkpoint files, real image files on disk, full
sweep through the evaluator — mirrors SURVEY.md §4's metric-level
integration-test requirement."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from keds_tpu.data.datasets import CIRR, FashionIQ  # noqa: E402
from keds_tpu.data.loader import DataLoader  # noqa: E402
from keds_tpu.evalkit.evaluators import (  # noqa: E402
    EvalContext,
    evaluate_cirr,
    evaluate_fashion,
)
from keds_tpu.io.checkpoint import save_train_checkpoint  # noqa: E402
from keds_tpu.models import clip as mclip  # noqa: E402
from keds_tpu.models import heads as mheads  # noqa: E402
from keds_tpu.models.composition import FusionHeads  # noqa: E402
from keds_tpu.retrieval.database import KnowledgeDB, Retriever  # noqa: E402
from keds_tpu.transforms import image_transform  # noqa: E402

D = 64
N_IMGS = 12
N_QUERIES = 6


def _rand_png(path, rng):
    arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=2,
    )
    clip_params = mclip.init_clip(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    db = KnowledgeDB.from_arrays(
        rng.standard_normal((128, D)), rng.standard_normal((128, D)),
        dtype=jnp.float32,
    )
    # two epochs of head checkpoints in both branch dirs
    root = tmp_path_factory.mktemp("branches")
    ib = str(root / "image_branch")
    tb = str(root / "text_branch")
    for branch in (ib, tb):
        for epoch in (1, 2):
            k = jax.random.key(hash((branch, epoch)) % (2**31))
            k1, k2, k3 = jax.random.split(k, 3)
            heads = FusionHeads(
                img2text=mheads.init_im2text(k1, D, 48, D),
                retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=3),
                text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=3),
            )
            save_train_checkpoint(
                os.path.join(branch, f"epoch_{epoch}.pt"), epoch=epoch, name="t",
                clip_params=clip_params, clip_cfg=cfg, heads=heads,
            )
    return cfg, clip_params, db, ib, tb


@pytest.fixture(scope="module")
def cirr_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    base = root / "CIRR"
    (base / "dev").mkdir(parents=True)
    (base / "captions").mkdir()
    (base / "image_splits").mkdir()
    rng = np.random.default_rng(1)
    names = [f"img{i}" for i in range(N_IMGS)]
    for n in names:
        _rand_png(base / "dev" / f"{n}.png", rng)
    caps = []
    for q in range(N_QUERIES):
        caps.append({
            "reference": names[q],
            "target_hard": names[(q + 1) % N_IMGS],
            "caption": f"make it more colorful {q}",
        })
    (base / "captions" / "cap.rc2.val.json").write_text(json.dumps(caps))
    (base / "image_splits" / "split.rc2.val.json").write_text(
        json.dumps({n: f"dev/{n}.png" for n in names})
    )
    return str(root)


def test_evaluate_cirr_end_to_end(tiny_model, cirr_root):
    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)
    src = CIRR(transforms=t_val, root=cirr_root)
    tgt = CIRR(transforms=t_val, root=cirr_root, mode="imgs")
    ctx = EvalContext(
        clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
        image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
    )
    results = evaluate_cirr(
        ctx, DataLoader(src, 4), DataLoader(tgt, 4), epochs=[1, 2]
    )
    assert set(results) == {(j, k) for j in (1, 2) for k in ("composed", "image", "mixture")}
    for m in results.values():
        assert set(m) == {f"recall_R@{k}" for k in (1, 5, 10, 50, 100)}
        assert all(0.0 <= v <= 100.0 for v in m.values())
        # recall is monotone in k and R@k==100 for k >= corpus-1
        assert m["recall_R@50"] == 100.0


@pytest.fixture(scope="module")
def fashion_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fdata")
    base = root / "fashion-iq"
    (base / "images").mkdir(parents=True)
    (base / "json").mkdir()
    (base / "image_splits").mkdir()
    rng = np.random.default_rng(2)
    names = [f"d{i}" for i in range(N_IMGS)]
    for n in names:
        _rand_png(base / "images" / f"{n}.png", rng)
    caps = [{
        "candidate": names[q],
        "target": names[(q + 2) % N_IMGS],
        "captions": [f"is red {q}", f"has stripes {q}"],
    } for q in range(N_QUERIES)]
    (base / "json" / "cap.dress.val.json").write_text(json.dumps(caps))
    (base / "image_splits" / "split.dress.val.json").write_text(json.dumps(names))
    return str(root)


@pytest.fixture(scope="module")
def cirr_test_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tdata")
    base = root / "CIRR"
    (base / "test1").mkdir(parents=True)
    (base / "captions").mkdir()
    (base / "image_splits").mkdir()
    rng = np.random.default_rng(3)
    names = [f"t{i}" for i in range(60)]
    for n in names:
        _rand_png(base / "test1" / f"{n}.png", rng)
    caps = [{"reference": names[q], "caption": f"modify {q}", "pairid": 1000 + q}
            for q in range(4)]
    (base / "captions" / "cap.rc2.test1.json").write_text(json.dumps(caps))
    (base / "image_splits" / "split.rc2.test1.json").write_text(
        json.dumps({n: f"test1/{n}.png" for n in names}))
    return str(root)


def test_evaluate_cirr_test_submission(tiny_model, cirr_test_root):
    from keds_tpu.evalkit.evaluators import evaluate_cirr_test

    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)
    src = CIRR(transforms=t_val, root=cirr_test_root, test=True)
    tgt = CIRR(transforms=t_val, root=cirr_test_root, mode="imgs", test=True)
    ctx = EvalContext(
        clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
        image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
    )
    results = evaluate_cirr_test(ctx, DataLoader(src, 4), DataLoader(tgt, 8),
                                 image_epoch=1, text_epoch=2)
    assert set(results) == {"composed", "image", "text", "mixture"}
    sub = results["composed"]
    assert sub["version"] == "rc2" and sub["metric"] == "recall"
    assert len(sub["1000"]) == 50
    assert not any(n.endswith(".png") for n in sub["1000"])


@pytest.fixture(scope="module")
def imgnet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("idata")
    imgdir = root / "imgnet" / "imgs"
    imgdir.mkdir(parents=True)
    rng = np.random.default_rng(4)
    q_lines, t_lines = [], []
    for i in range(6):
        _rand_png(imgdir / f"q{i}.png", rng)
        q_lines.append(f"imgnet/imgs/q{i}.png {i % 3}")
    for i in range(10):
        _rand_png(imgdir / f"t{i}.png", rng)
        t_lines.append(f"imgnet/imgs/t{i}.png {i % 3}")
    (root / "imgnet" / "imgnet_real_query.txt").write_text("\n".join(q_lines))
    (root / "imgnet" / "imgnet_targets.txt").write_text("\n".join(t_lines))
    return str(root)


def test_evaluate_imgnet_end_to_end(tiny_model, imgnet_root):
    from keds_tpu.data.datasets import ImageList
    from keds_tpu.evalkit.evaluators import evaluate_imgnet_retrieval

    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)
    src = ImageList(os.path.join(imgnet_root, "imgnet", "imgnet_real_query.txt"),
                    root=imgnet_root, transforms=t_val, is_labels=True)
    tgt = ImageList(os.path.join(imgnet_root, "imgnet", "imgnet_targets.txt"),
                    root=imgnet_root, transforms=t_val, is_labels=True)
    ctx = EvalContext(
        clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
        image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
    )
    # branch dirs hold epoch_{1,2}; sweep j=1 loads 2j-1=1 and 2j=2
    results = evaluate_imgnet_retrieval(
        ctx, ["a cartoon of *"], DataLoader(src, 3), DataLoader(tgt, 5),
        epochs=[1],
    )
    for m in results.values():
        for k in (1, 5):
            assert 0.0 <= m[f"Real2Sketch_R@{k}"] <= 1.0
            assert 0.0 <= m[f"Real2Sketch_P@{k}"] <= 1.0


def test_evaluate_fashion_end_to_end(tiny_model, fashion_root):
    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)
    src = FashionIQ(cloth="dress", transforms=t_val, root=fashion_root,
                    is_return_target_path=True)
    tgt = FashionIQ(cloth="dress", transforms=t_val, root=fashion_root, mode="imgs")
    ctx = EvalContext(
        clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
        image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
    )
    results = evaluate_fashion(ctx, DataLoader(src, 4), DataLoader(tgt, 4), epochs=[1])
    for m in results.values():
        assert all(0.0 <= v <= 100.0 for v in m.values())


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    import csv

    root = tmp_path_factory.mktemp("cdata")
    base = root / "coco"
    (base / "val2017").mkdir(parents=True)
    (base / "val2017_masked").mkdir()
    (base / "annotations").mkdir()
    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        name = f"{i:012d}.jpg"
        _rand_png(base / "val2017" / name, rng)
        _rand_png(base / "val2017_masked" / name, rng)
        rows.append({"id": name, "query_regions": "2;2;30;30",
                     "query_class": "dog", "classes": "cat;tree"})
    with open(base / "coco_eval.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    (base / "annotations" / "captions_val2017.json").write_text(
        json.dumps({"annotations": [{"image_id": i, "caption": f"c{i}"} for i in range(6)]})
    )
    return str(root)


def test_evaluate_coco_end_to_end(tiny_model, coco_root):
    from keds_tpu.data.datasets import CsvCOCO
    from keds_tpu.evalkit.evaluators import evaluate_coco
    from keds_tpu.transforms import region_transform

    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)
    ds = CsvCOCO(transforms=t_val,
                 transforms_region=region_transform(cfg.image_resolution),
                 root=coco_root)
    ctx = EvalContext(
        clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
        image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
    )
    results = evaluate_coco(ctx, DataLoader(ds, 3), epochs=[1])
    for m in results.values():
        assert m["image_to_ref_mean_rank"] >= 1.0
        for k in (1, 5):
            assert 0.0 <= m[f"image_to_ref_R@{k}"] <= 1.0


def test_evaluate_cirr_device_ranking_matches_host(tiny_model, cirr_root):
    """eval_ranking='device' (MXU score matmul + top-k, index-only fetch)
    must reproduce the host numpy sweep's recall cells exactly."""
    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)

    def run(ranking):
        src = CIRR(transforms=t_val, root=cirr_root)
        tgt = CIRR(transforms=t_val, root=cirr_root, mode="imgs")
        ctx = EvalContext(
            clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
            image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
            eval_ranking=ranking,
        )
        return evaluate_cirr(ctx, DataLoader(src, 4), DataLoader(tgt, 4),
                             epochs=[1, 2])

    host = run("host")
    device = run("device")
    assert host == device


def test_evaluate_fashion_device_ranking_matches_host(tiny_model, fashion_root):
    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)

    def run(ranking):
        src = FashionIQ(cloth="dress", transforms=t_val, root=fashion_root,
                        is_return_target_path=True)
        tgt = FashionIQ(cloth="dress", transforms=t_val, root=fashion_root,
                        mode="imgs")
        ctx = EvalContext(
            clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
            image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
            eval_ranking=ranking,
        )
        return evaluate_fashion(ctx, DataLoader(src, 4), DataLoader(tgt, 4),
                                epochs=[1])

    assert run("host") == run("device")


def test_evaluate_coco_device_ranking_matches_host(tiny_model, coco_root):
    from keds_tpu.data.datasets import CsvCOCO
    from keds_tpu.evalkit.evaluators import evaluate_coco
    from keds_tpu.transforms import region_transform

    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)

    def run(ranking):
        ds = CsvCOCO(transforms=t_val,
                     transforms_region=region_transform(cfg.image_resolution),
                     root=coco_root)
        ctx = EvalContext(
            clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
            image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
            eval_ranking=ranking,
        )
        return evaluate_coco(ctx, DataLoader(ds, 3), epochs=[1])

    assert run("host") == run("device")


def test_evaluate_imgnet_device_ranking_matches_host(tiny_model, imgnet_root):
    from keds_tpu.data.datasets import ImageList
    from keds_tpu.evalkit.evaluators import evaluate_imgnet_retrieval

    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)

    def run(ranking):
        src = ImageList(os.path.join(imgnet_root, "imgnet", "imgnet_real_query.txt"),
                        root=imgnet_root, transforms=t_val, is_labels=True)
        tgt = ImageList(os.path.join(imgnet_root, "imgnet", "imgnet_targets.txt"),
                        root=imgnet_root, transforms=t_val, is_labels=True)
        ctx = EvalContext(
            clip_params=clip_params, cfg=cfg, retriever=Retriever(db),
            image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
            eval_ranking=ranking,
        )
        return evaluate_imgnet_retrieval(
            ctx, ["a cartoon of *"], DataLoader(src, 3), DataLoader(tgt, 5),
            epochs=[1])

    assert run("host") == run("device")


def test_evaluate_cirr_device_ranking_matches_host_meshed(tiny_model, cirr_root):
    """Device ranking under a mesh (BASELINE config 4's eval shape): composed
    queries arrive sharded over the batch axis, the corpus is replicated, the
    rank reduction runs on device — metrics must equal the meshed host path's
    (same composed features, so equality is exact, not approximate)."""
    from keds_tpu.parallel.mesh import make_mesh

    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)
    mesh = make_mesh()
    if mesh.devices.size <= 1:
        pytest.skip("needs a multi-device mesh")
    db_sh = db.shard_over(mesh)

    def run(ranking):
        src = CIRR(transforms=t_val, root=cirr_root)
        tgt = CIRR(transforms=t_val, root=cirr_root, mode="imgs")
        ctx = EvalContext(
            clip_params=clip_params, cfg=cfg,
            retriever=Retriever(db_sh, mesh=mesh, sharded=True),
            image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
            eval_ranking=ranking, mesh=mesh,
        )
        return evaluate_cirr(ctx, DataLoader(src, 4), DataLoader(tgt, 4),
                             epochs=[1, 2])

    assert run("host") == run("device")


def test_evaluate_imgnet_device_ranking_matches_host_meshed(tiny_model, imgnet_root):
    """Same meshed-equality pin for an evaluator whose rank reduction is
    top-K rather than CIRR's masked top-101 (covers the generalized path)."""
    from keds_tpu.data.datasets import ImageList
    from keds_tpu.evalkit.evaluators import evaluate_imgnet_retrieval
    from keds_tpu.parallel.mesh import make_mesh

    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)
    mesh = make_mesh()
    if mesh.devices.size <= 1:
        pytest.skip("needs a multi-device mesh")
    db_sh = db.shard_over(mesh)

    def run(ranking):
        src = ImageList(os.path.join(imgnet_root, "imgnet", "imgnet_real_query.txt"),
                        root=imgnet_root, transforms=t_val, is_labels=True)
        tgt = ImageList(os.path.join(imgnet_root, "imgnet", "imgnet_targets.txt"),
                        root=imgnet_root, transforms=t_val, is_labels=True)
        ctx = EvalContext(
            clip_params=clip_params, cfg=cfg,
            retriever=Retriever(db_sh, mesh=mesh, sharded=True),
            image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
            eval_ranking=ranking, mesh=mesh,
        )
        return evaluate_imgnet_retrieval(
            ctx, ["a cartoon of *"], DataLoader(src, 3), DataLoader(tgt, 5),
            epochs=[1])

    assert run("host") == run("device")


def test_evaluate_fashion_coco_device_ranking_matches_host_meshed(
        tiny_model, fashion_root, coco_root):
    """Meshed equality for the two remaining device-ranking shapes: the
    weighted-mixture top-100 (Fashion) and the square diagonal-rank
    reduction (COCO, sharded over one axis of a (T, Q) logit matrix)."""
    from keds_tpu.data.datasets import CsvCOCO
    from keds_tpu.evalkit.evaluators import evaluate_coco
    from keds_tpu.parallel.mesh import make_mesh
    from keds_tpu.transforms import region_transform

    cfg, clip_params, db, ib, tb = tiny_model
    t_val = image_transform(cfg.image_resolution)
    mesh = make_mesh()
    if mesh.devices.size <= 1:
        pytest.skip("needs a multi-device mesh")
    db_sh = db.shard_over(mesh)

    def ctx(ranking):
        return EvalContext(
            clip_params=clip_params, cfg=cfg,
            retriever=Retriever(db_sh, mesh=mesh, sharded=True),
            image_branch=ib, text_branch=tb, compute_dtype=jnp.float32,
            eval_ranking=ranking, mesh=mesh,
        )

    def run_fashion(ranking):
        src = FashionIQ(cloth="dress", transforms=t_val, root=fashion_root,
                        is_return_target_path=True)
        tgt = FashionIQ(cloth="dress", transforms=t_val, root=fashion_root,
                        mode="imgs")
        return evaluate_fashion(ctx(ranking), DataLoader(src, 4),
                                DataLoader(tgt, 4), epochs=[1])

    def run_coco(ranking):
        ds = CsvCOCO(transforms=t_val,
                     transforms_region=region_transform(cfg.image_resolution),
                     root=coco_root)
        return evaluate_coco(ctx(ranking), DataLoader(ds, 3), epochs=[1])

    assert run_fashion("host") == run_fashion("device")
    assert run_coco("host") == run_coco("device")
