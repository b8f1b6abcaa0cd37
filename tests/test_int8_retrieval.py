"""Int8-quantized retrieval: recall overlap vs exact search and rescoring
behaviour."""

import numpy as np

import jax.numpy as jnp

from keds_tpu.ops.topk import mips_topk, mips_topk_int8, quantize_int8


def _db(n=5000, d=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_quantize_roundtrip_error():
    db = _db(200)
    q8, scale = quantize_int8(jnp.asarray(db))
    assert q8.dtype == jnp.int8 and scale.shape == (200,)
    deq = np.asarray(q8, np.float32) * np.asarray(scale)[:, None]
    err = np.abs(deq - db).max()
    assert err <= np.asarray(scale).max() * 0.51  # half-ulp of the quant grid


def test_int8_topk_overlap_with_exact():
    db = _db()
    rng = np.random.default_rng(1)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    _, exact_idx = mips_topk(jnp.asarray(q), jnp.asarray(db), 16)
    q8, scale = quantize_int8(jnp.asarray(db))
    _, approx_idx = mips_topk_int8(jnp.asarray(q), q8, scale, 16, oversample=4)
    overlaps = [
        len(set(np.asarray(exact_idx[i]).tolist())
            & set(np.asarray(approx_idx[i]).tolist())) / 16
        for i in range(16)
    ]
    assert np.mean(overlaps) >= 0.9, np.mean(overlaps)


def test_int8_rescoring_orders_by_exact_dequant():
    """With oversample>1 the returned candidates are ordered by exact f32
    scores against the dequantized rows."""
    db = _db(300)
    rng = np.random.default_rng(2)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    q8, scale = quantize_int8(jnp.asarray(db))
    vals, idx = mips_topk_int8(jnp.asarray(q), q8, scale, 8, oversample=4)
    deq = np.asarray(q8, np.float32) * np.asarray(scale)[:, None]
    for i in range(4):
        got = np.asarray(vals[i])
        expect = q[i] @ deq[np.asarray(idx[i])].T
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
        assert (np.diff(got) <= 1e-5).all()  # descending


def test_int8_retriever_backend():
    import jax

    from keds_tpu.retrieval.database import KnowledgeDB, Retriever

    db = _db(400)
    kdb = KnowledgeDB.from_arrays(db, _db(400, seed=5), dtype=jnp.float32)
    r8 = Retriever(kdb, backend="int8")
    rx = Retriever(kdb, backend="xla")
    rng = np.random.default_rng(3)
    q = rng.standard_normal((6, 64)).astype(np.float32)
    ti8, tt8 = r8.retrieve_features(jnp.asarray(q), k=8, rng=None)
    tix, ttx = rx.retrieve_features(jnp.asarray(q), k=8, rng=None)
    # int8-with-rescore neighbors overlap the exact set heavily
    close = np.mean(np.abs(np.asarray(ti8) - np.asarray(tix)) < 1e-3)
    assert ti8.shape == tix.shape
    assert close > 0.7


def test_int8_sharded_matches_unsharded():
    import jax.numpy as jnp

    from keds_tpu.parallel.mesh import make_mesh
    from keds_tpu.retrieval.database import KnowledgeDB, Retriever

    mesh = make_mesh()
    img, txt = _db(1003), _db(1003, seed=9)  # non-divisible by 8
    rng = np.random.default_rng(4)
    q = rng.standard_normal((5, 64)).astype(np.float32)
    kdb = KnowledgeDB.from_arrays(img, txt, dtype=jnp.float32)
    r_plain = Retriever(kdb, backend="int8")
    kdb_s = KnowledgeDB.from_arrays(img, txt, dtype=jnp.float32).shard_over(mesh)
    r_shard = Retriever(kdb_s, backend="int8", mesh=mesh, sharded=True)
    a, at = r_plain.retrieve_features(jnp.asarray(q), k=8, rng=None)
    b, bt = r_shard.retrieve_features(jnp.asarray(q), k=8, rng=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(at), np.asarray(bt), atol=1e-4, rtol=1e-4)


def test_sharded_pad_rows_cannot_win():
    """Adversarial case: a query anti-aligned with every DB row gives all
    negative scores; zero pad rows must not leak into the top-k."""
    import jax.numpy as jnp

    from keds_tpu.ops.topk import mips_topk_sharded
    from keds_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(5)
    base = -np.abs(rng.standard_normal((9, 16)).astype(np.float32))  # all-negative rows
    q = np.ones((1, 16), np.float32)  # scores all negative
    pad = 16 - 9  # pad up to 2 rows/shard on 8 devices
    db = np.concatenate([base, np.zeros((pad, 16), np.float32)])
    vals, idx = mips_topk_sharded(jnp.asarray(q), jnp.asarray(db), 4, mesh,
                                  n_real=9)
    assert (np.asarray(idx) < 9).all()
    assert (np.asarray(vals) < 0).all()


def test_prequantized_artifacts_are_loaded_and_used(tmp_path):
    """tools/build_database.py --int8 writes pre-quantized artifacts;
    KnowledgeDB.from_config must pick them up and Retriever(backend='int8')
    must score with THEM (proven by corrupting one artifact scale and
    observing the stage-1 candidate scores change)."""
    import json

    from keds_tpu.config import Config
    from keds_tpu.retrieval.database import KnowledgeDB, Retriever
    from keds_tpu.tools.build_database import main as build_db

    feats = tmp_path / "feats"
    feats.mkdir()
    img, txt = _db(64, 32, seed=7), _db(64, 32, seed=8)
    np.save(feats / "image_features.npy", img)
    np.save(feats / "text_features.npy", txt)
    (feats / "names.json").write_text(json.dumps([f"n{i}" for i in range(64)]))
    out = tmp_path / "db"
    build_db(["--features", str(feats), "--out", str(out), "--size", "64",
              "--no-pt", "--int8"])
    assert (out / "image_db_int8.npy").exists()

    cfg = Config(database_path=str(out))
    db = KnowledgeDB.from_config(cfg, dtype=jnp.float32)
    assert db.quant is not None and set(db.quant) == {"image", "text"}
    # same q8/scale as in-memory quantization of the same rows
    q8_mem, sc_mem = quantize_int8(db.image_db)
    np.testing.assert_array_equal(np.asarray(db.quant["image"][0]),
                                  np.asarray(q8_mem))
    np.testing.assert_allclose(np.asarray(db.quant["image"][1]),
                               np.asarray(sc_mem), rtol=1e-6)

    # corrupt one artifact scale -> raw (oversample=1) scores must change,
    # proving the retriever consumes the artifacts rather than requantizing
    scale = np.load(out / "image_db_scale.npy")
    scale[0] *= 50.0
    np.save(out / "image_db_scale.npy", scale)
    db2 = KnowledgeDB.from_config(cfg, dtype=jnp.float32)
    q = jnp.asarray(_db(4, 32, seed=9))
    r1 = Retriever(db, backend="int8")
    r2 = Retriever(db2, backend="int8")
    v1, _ = mips_topk_int8(q, *r1._int8["image"], 8, oversample=1)
    v2, _ = mips_topk_int8(q, *r2._int8["image"], 8, oversample=1)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))

    # STALE artifacts (row-count mismatch vs the float DB, e.g. a rebuild
    # without --int8) must be ignored with a warning, not silently used
    q8 = np.load(out / "image_db_int8.npy")
    np.save(out / "image_db_int8.npy", q8[:32])
    db3 = KnowledgeDB.from_config(cfg, dtype=jnp.float32)
    assert db3.quant is None
    np.testing.assert_allclose(  # and the backend falls back to requantizing
        np.asarray(Retriever(db3, backend="int8")._int8["image"][0]),
        np.asarray(quantize_int8(db3.image_db)[0]))


def test_int8_backend_correct_under_jit_with_traced_db_args():
    """Regression (round-2 review): inside jit the DB enters as tracers, so
    the old object-identity modality dispatch silently used the TEXT index
    for the IMAGE search.  With db_quant threaded as traced arguments, the
    jitted results must equal the eager int8 results for BOTH modalities —
    and the image/text neighbor sets must differ from each other."""
    import jax

    from keds_tpu.retrieval.database import KnowledgeDB, Retriever

    rng = np.random.default_rng(21)
    # deliberately different image/text DBs so a modality mixup is visible
    db_img = rng.standard_normal((256, 32)).astype(np.float32)
    db_txt = -rng.standard_normal((256, 32)).astype(np.float32)
    db = KnowledgeDB.from_arrays(db_img, db_txt, dtype=jnp.float32)
    r = Retriever(db, backend="int8")
    feats = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)

    eager_i, eager_t = r.retrieve_features(feats, k=8, rng=None)

    @jax.jit
    def jitted(f, dbi, dbt, quant):
        return r.retrieve_features(f, k=8, rng=None, db_arrays=(dbi, dbt),
                                   db_quant=quant)

    jit_i, jit_t = jitted(feats, db.image_db, db.text_db, r.quant_arrays())
    np.testing.assert_allclose(np.asarray(jit_i), np.asarray(eager_i), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jit_t), np.asarray(eager_t), rtol=1e-6)
    assert not np.allclose(np.asarray(jit_i), np.asarray(jit_t)), \
        "image and text neighbors identical — modality mixup"
