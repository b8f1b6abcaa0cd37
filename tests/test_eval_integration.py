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
