"""Quantized / approximate retrieval accuracy on REALISTIC embeddings.

Round-2 review (VERDICT weak #4): all quant/ANN accuracy numbers were
measured on i.i.d. Gaussian unit vectors — the easy case.  These tests pin
the behaviour on corpora with real CLIP-feature geometry
(:mod:`keds_tpu.retrieval.synth`: cone + clusters + anisotropy) where score
gaps shrink toward the quantization noise floor:

* dequant-row rescoring measurably degrades there (the round-2 int8 path),
* true-row rescoring (round 3, ``mips_topk_int8(db=...)``) restores exact
  neighbor sets — candidate recall at 4x oversample stays ~1.0 even on
  tight clusters,
* int8 towers hold their cosine even with injected outlier weight channels,
* the end metric (synthetic-tree CIRR recall cells) is unchanged under the
  int8 retrieval backend and stable under int8 towers.

TPU-measured companions (real ``approx_max_k``, ViT-L scale) live in
BENCH_NOTES' round-3 accuracy tables via ``tools/quant_accuracy.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keds_tpu.models import clip as mclip
from keds_tpu.ops.quant import quantize_clip_blocks
from keds_tpu.ops.topk import mips_topk, mips_topk_int8, quantize_int8
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.retrieval.synth import (
    correlated_embeddings,
    shared_geometry,
    structured_images,
)

D = 256
ROWS = 8000
NQ = 64
K = 16


def _overlap(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.mean([
        len(set(a[i].tolist()) & set(b[i].tolist())) / a.shape[1]
        for i in range(len(a))
    ])


def _corpus(spread, rows=ROWS, dim=D):
    geom = shared_geometry(np.random.default_rng(0), dim)
    db = correlated_embeddings(np.random.default_rng(0), rows, dim,
                               spread=spread, basis=geom)
    q = correlated_embeddings(np.random.default_rng(1), NQ, dim,
                              spread=spread, basis=geom)
    return db, q


def test_correlated_embedding_stats():
    """The generator actually produces CLIP-like geometry: narrow cone
    (mean pairwise cosine ~0.5, vs ~0 for Gaussian) and an anisotropic
    spectrum (top-5 principal directions carry far more than 5/D of the
    variance)."""
    db, _ = _corpus(0.35)
    cos = db[:512] @ db[512:1024].T
    assert 0.35 < cos.mean() < 0.65, cos.mean()
    sv = np.linalg.svd(db[:4096] - db[:4096].mean(0), compute_uv=False)
    var = sv**2
    top5 = var[:5].sum() / var.sum()
    assert top5 > 5 * (5 / D), top5


@pytest.mark.parametrize("spread,deq_max,true_min", [
    (0.35, 0.99, 0.995),   # CLIP-corpus-like concentration
    (0.15, 0.95, 0.99),    # adversarially tight clusters
])
def test_int8_true_rescore_fixes_correlated_degradation(spread, deq_max, true_min):
    """On correlated corpora the dequant-rescore int8 path flips neighbors
    (the int8 grid noise exceeds the shrunken score gaps) while true-row
    rescoring stays at exact parity — candidate recall at 4x oversample is
    the only limit and it is ~1.0 here."""
    db, q = _corpus(spread)
    jq, jdb = jnp.asarray(q), jnp.asarray(db)
    _, exact = mips_topk(jq, jdb, K)
    q8, sc = quantize_int8(jdb)
    _, deq = mips_topk_int8(jq, q8, sc, K, oversample=4)
    _, true = mips_topk_int8(jq, q8, sc, K, oversample=4, db=jdb)
    ov_deq, ov_true = _overlap(exact, deq), _overlap(exact, true)
    assert ov_true >= true_min, (ov_true, ov_deq)
    assert ov_deq <= deq_max, ov_deq      # the degradation is real ...
    assert ov_true > ov_deq               # ... and the fix beats it


def test_retriever_int8_matches_exact_on_correlated():
    """Retriever(backend='int8') now rescoring against the resident
    full-precision rows: neighbor sets match the exact backend's on a
    correlated corpus up to genuine score near-ties (the rescore einsum's
    accumulation order differs from the scan's dot_general by a few ulps, so
    only rows with near-equal scores may swap — asserted via score values)."""
    db_i, q = _corpus(0.15, rows=3000)
    kdb = KnowledgeDB.from_arrays(db_i, db_i, dtype=jnp.float32)
    r8 = Retriever(kdb, backend="int8")
    rx = Retriever(kdb, backend="xla")
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    v8, i8 = r8.search(jnp.asarray(qn), kdb.image_db, K, modality="image")
    vx, ix = rx.search(jnp.asarray(qn), kdb.image_db, K, modality="image")
    np.testing.assert_allclose(np.asarray(v8), np.asarray(vx),
                               atol=1e-5, rtol=1e-5)
    assert _overlap(ix, i8) >= 0.99


def test_int8_sharded_true_rescore_matches_unsharded():
    """The row-sharded int8 path threads the full-precision shard for
    rescoring; results equal the single-device search on correlated data."""
    from keds_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    db_i, q = _corpus(0.15, rows=1003)  # non-divisible by 8 -> pad rows
    db_t, _ = _corpus(0.15, rows=1003)
    kdb = KnowledgeDB.from_arrays(db_i, db_t, dtype=jnp.float32)
    r_plain = Retriever(kdb, backend="int8")
    kdb_s = KnowledgeDB.from_arrays(db_i, db_t, dtype=jnp.float32).shard_over(mesh)
    r_shard = Retriever(kdb_s, backend="int8", mesh=mesh, sharded=True)
    a, at = r_plain.retrieve_features(jnp.asarray(q), k=8, rng=None)
    b, bt = r_shard.retrieve_features(jnp.asarray(q), k=8, rng=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(at), np.asarray(bt), atol=1e-5, rtol=1e-5)


CFG = mclip.ClipConfig(
    embed_dim=64, image_resolution=32, vision_layers=3, vision_width=128,
    vision_patch_size=16, transformer_width=64, transformer_heads=2,
    transformer_layers=3,
)


def test_int8_tower_cosine_with_outlier_channels():
    """Per-token activation int8 vs a tower with injected outlier hidden
    channels (the known hazard of trained transformers — random-init weights
    have none, which flatters quantization) on structured images (spatially
    correlated activations, not pixel noise)."""
    from keds_tpu.retrieval.synth import inject_outlier_channels

    params = mclip.init_clip(jax.random.key(0), CFG, dtype=jnp.float32)
    params = inject_outlier_channels(params, towers=("visual",))
    pq = quantize_clip_blocks(params)
    x = jnp.asarray(structured_images(np.random.default_rng(2), 16, 32))
    f = np.asarray(mclip.encode_image(params, CFG, x), np.float64)
    g = np.asarray(mclip.encode_image(pq, CFG, x), np.float64)
    cos = (f * g).sum(1) / (np.linalg.norm(f, axis=1) * np.linalg.norm(g, axis=1))
    assert cos.min() > 0.99, cos.min()


def test_quant_accuracy_tool_smoke(capsys):
    """tools/quant_accuracy.py --quick runs end-to-end on CPU and emits the
    JSON results line (approx rows lower to exact off-TPU; the TPU-measured
    tables live in BENCH_NOTES round-3)."""
    import json

    from keds_tpu.tools.quant_accuracy import main as qa_main

    qa_main(["--quick", "--parts", "retrieval", "--rows", "4000",
             "--dim", "128", "--queries", "32", "--spreads", "0.35"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    row = out["retrieval"]["correlated s=0.35"]
    assert row["int8_true_rescore"] >= row["int8_deq_rescore"]
    assert 0.3 < row["mean_cos"] < 0.65


def test_cirr_eval_cells_exact_under_int8_backend(tmp_path):
    """End metric: synthetic-tree CIRR recall cells are IDENTICAL with the
    int8 retrieval backend (true-row rescore => same neighbor sets) and
    within one query flip under int8 towers (embedding cosine ~0.999)."""
    pytest.importorskip("PIL")
    import os

    from PIL import Image

    from keds_tpu.data.datasets import CIRR
    from keds_tpu.data.loader import DataLoader
    from keds_tpu.evalkit.evaluators import EvalContext, evaluate_cirr
    from keds_tpu.io.checkpoint import save_train_checkpoint
    from keds_tpu.models import heads as mheads
    from keds_tpu.models.composition import FusionHeads
    from keds_tpu.transforms import image_transform

    n_imgs, n_q = 12, 6
    clip_params = mclip.init_clip(jax.random.key(0), CFG)
    # correlated knowledge DB (the hard case), both modalities
    geom = shared_geometry(np.random.default_rng(0), CFG.embed_dim)
    db = KnowledgeDB.from_arrays(
        correlated_embeddings(np.random.default_rng(0), 128, CFG.embed_dim,
                              spread=0.15, basis=geom),
        correlated_embeddings(np.random.default_rng(1), 128, CFG.embed_dim,
                              spread=0.15, basis=geom),
        dtype=jnp.float32)
    ib = tmp_path / "image_branch"
    tb = tmp_path / "text_branch"
    for branch in (ib, tb):
        branch.mkdir()
        k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
        heads = FusionHeads(
            img2text=mheads.init_im2text(k1, CFG.embed_dim, 48, CFG.embed_dim),
            retrieval_fuse=mheads.init_crossformer(
                k2, CFG.embed_dim, CFG.embed_dim, CFG.embed_dim, num_layers=3),
            text_condition=mheads.init_crossformer(
                k3, CFG.embed_dim, CFG.embed_dim, CFG.embed_dim, num_layers=3),
        )
        save_train_checkpoint(os.path.join(str(branch), "epoch_1.pt"), epoch=1,
                              name="t", clip_params=clip_params, clip_cfg=CFG,
                              heads=heads)
    # synthetic CIRR tree
    import json

    base = tmp_path / "CIRR"
    (base / "dev").mkdir(parents=True)
    (base / "captions").mkdir()
    (base / "image_splits").mkdir()
    rng = np.random.default_rng(5)
    names = [f"img{i}" for i in range(n_imgs)]
    for n in names:
        arr = (structured_images(rng, 1, 40)[0] * 40 + 128).clip(0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(base / "dev" / f"{n}.png")
    caps = [{"reference": names[i], "target_hard": names[(i + 3) % n_imgs],
             "caption": f"make it {i} shiny"} for i in range(n_q)]
    (base / "captions" / "cap.rc2.val.json").write_text(json.dumps(caps))
    (base / "image_splits" / "split.rc2.val.json").write_text(
        json.dumps({n: f"dev/{n}.png" for n in names}))

    t_val = image_transform(CFG.image_resolution)
    src = CIRR(transforms=t_val, root=str(tmp_path))
    tgt = CIRR(transforms=t_val, root=str(tmp_path), mode="imgs")

    def run(backend, quant_towers):
        ctx = EvalContext(
            clip_params=clip_params, cfg=CFG,
            retriever=Retriever(db, backend=backend),
            image_branch=str(ib), text_branch=str(tb),
            compute_dtype=jnp.float32, quant_towers=quant_towers,
        )
        return evaluate_cirr(ctx, DataLoader(src, 4), DataLoader(tgt, 4),
                             epochs=[1])

    exact = run("xla", "none")
    int8_db = run("int8", "none")
    int8_tw = run("xla", "int8")
    one_flip = 100.0 / n_q + 1e-6
    for cell, metrics in exact.items():
        for m, v in metrics.items():
            assert int8_db[cell][m] == v, (cell, m, v, int8_db[cell][m])
            assert abs(int8_tw[cell][m] - v) <= one_flip, \
                (cell, m, v, int8_tw[cell][m])
