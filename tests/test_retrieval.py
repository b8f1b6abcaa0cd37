"""Retrieval engine tests: XLA vs numpy, Pallas kernel (interpret mode on
CPU), and the mesh-sharded merge on the 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keds_tpu.ops.topk import mips_topk, mips_topk_fused, mips_topk_sharded
from keds_tpu.parallel.mesh import make_mesh
from keds_tpu.retrieval.database import KnowledgeDB, Retriever


def _make_db(n=1000, d=64, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((n, d)).astype(np.float32)
    txt = rng.standard_normal((n, d)).astype(np.float32)
    return img, txt


def _np_topk(q, db, k):
    scores = q @ db.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


def test_mips_topk_matches_numpy():
    img, _ = _make_db()
    q = np.random.default_rng(1).standard_normal((7, 64)).astype(np.float32)
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(img), 16)
    ref_vals, ref_idx = _np_topk(q, img, 16)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


@pytest.mark.parametrize("n,b", [(1000, 7), (2048, 128), (3000, 33)])
def test_pallas_fused_matches_xla(n, b):
    img, _ = _make_db(n=n)
    q = np.random.default_rng(2).standard_normal((b, 64)).astype(np.float32)
    vals, idx = mips_topk_fused(jnp.asarray(q), jnp.asarray(img), 16,
                                block_q=32, block_n=256, interpret=True)
    ref_vals, ref_idx = _np_topk(q, img, 16)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    # indices can differ on exact score ties only; values determine parity
    mismatch = np.asarray(idx) != ref_idx
    if mismatch.any():
        np.testing.assert_allclose(
            np.asarray(vals)[mismatch], ref_vals[mismatch], rtol=1e-6, atol=1e-6
        )


def test_sharded_matches_global():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    img, _ = _make_db(n=4096)
    q = np.random.default_rng(3).standard_normal((9, 64)).astype(np.float32)
    gvals, gidx = mips_topk(jnp.asarray(q), jnp.asarray(img), 16)
    svals, sidx = mips_topk_sharded(jnp.asarray(q), jnp.asarray(img), 16, mesh)
    np.testing.assert_allclose(np.asarray(svals), np.asarray(gvals), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sidx), np.asarray(gidx))


def test_sharded_with_padding():
    """DB size not divisible by the mesh: sharding pads with zero rows, which
    can never win against real unit-norm rows for normalized queries."""
    mesh = make_mesh()
    img, txt = _make_db(n=1003)
    db = KnowledgeDB.from_arrays(img, txt, dtype=jnp.float32).shard_over(mesh)
    r = Retriever(db, mesh=mesh, sharded=True)
    q = np.random.default_rng(4).standard_normal((5, 64)).astype(np.float32)
    ti, tt = r.retrieve_features(jnp.asarray(q), k=16, rng=None)
    assert ti.shape == (5, 16, 64) and tt.shape == (5, 16, 64)
    # compare against replicated retrieval
    db_rep = KnowledgeDB.from_arrays(img, txt, dtype=jnp.float32)
    r2 = Retriever(db_rep)
    ti2, tt2 = r2.retrieve_features(jnp.asarray(q), k=16, rng=None)
    np.testing.assert_allclose(np.asarray(ti), np.asarray(ti2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tt), np.asarray(tt2), rtol=1e-5, atol=1e-5)


def test_sharded_pad_rows_cannot_displace_negative_scores():
    """Zero pad rows score exactly 0.0, which outranks NEGATIVE true scores
    (reachable for unit-norm CLIP features).  Regression: the sharded search
    once masked pads only AFTER the per-shard local top-k, so a pad row
    could displace the globally-best row from its shard's candidate set —
    here row 24 (the global top-1) shares a shard with three pad rows and
    was lost entirely."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    d = 64
    img = np.zeros((25, d), np.float32)
    img[:, 0] = -1.0          # every true score is negative for q = e0
    img[24, 0] = -0.05        # global best, lives in the pad-carrying shard
    q = np.zeros((3, d), np.float32)
    q[:, 0] = 1.0
    gvals, gidx = mips_topk(jnp.asarray(q), jnp.asarray(img), 2)
    assert int(np.asarray(gidx)[0, 0]) == 24
    padded = np.zeros((32, d), np.float32)
    padded[:25] = img
    svals, sidx = mips_topk_sharded(jnp.asarray(q), jnp.asarray(padded), 2,
                                    mesh, n_real=25)
    np.testing.assert_array_equal(np.asarray(sidx), np.asarray(gidx))
    np.testing.assert_allclose(np.asarray(svals), np.asarray(gvals),
                               rtol=1e-5, atol=1e-6)

    # Same displacement class in the int8 sharded path (pads quantize to
    # zero rows and still score 0.0).
    from keds_tpu.ops.topk import mips_topk_int8_sharded, quantize_int8

    db_i8, db_scale = quantize_int8(jnp.asarray(padded))
    ivals, iidx = mips_topk_int8_sharded(
        jnp.asarray(q), db_i8, db_scale, 2, mesh, n_real=25,
        db=jnp.asarray(padded))
    np.testing.assert_array_equal(np.asarray(iidx), np.asarray(gidx))
    np.testing.assert_allclose(np.asarray(ivals), np.asarray(gvals),
                               rtol=1e-4, atol=1e-4)


def test_retrieve_features_semantics():
    """Gathered rows must be the DB rows at the top-k indices; image-side
    shuffle is a permutation of the same 16 neighbors (reference
    src/trainer.py:213-227)."""
    img, txt = _make_db(n=500)
    db = KnowledgeDB.from_arrays(img, txt, dtype=jnp.float32)
    r = Retriever(db)
    q = np.random.default_rng(5).standard_normal((4, 64)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    ref_vals, ref_idx = _np_topk(qn, np.asarray(db.image_db), 16)

    no_shuffle, _ = r.retrieve_features(jnp.asarray(q), k=16, rng=None)
    np.testing.assert_allclose(
        np.asarray(no_shuffle), np.asarray(db.image_db)[ref_idx], rtol=1e-5, atol=1e-5
    )
    shuffled, _ = r.retrieve_features(jnp.asarray(q), k=16, rng=jax.random.key(0))
    # same multiset of neighbors, same permutation across the batch
    a = np.sort(np.asarray(no_shuffle), axis=1)
    b = np.sort(np.asarray(shuffled), axis=1)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_retrieval_is_jittable_and_composes():
    img, txt = _make_db(n=512)
    db = KnowledgeDB.from_arrays(img, txt, dtype=jnp.float32)
    r = Retriever(db)

    @jax.jit
    def step(feat, key):
        ti, tt = r.retrieve_features(feat, k=16, rng=key)
        return ti.mean() + tt.mean()

    out = step(jnp.ones((8, 64)), jax.random.key(1))
    assert np.isfinite(float(out))


def test_caption_neighbors_and_names():
    img, txt = _make_db(n=100)
    names = [f"img_{i:03d}.jpg" for i in range(100)]
    db = KnowledgeDB.from_arrays(img, txt, names=names, dtype=jnp.float32)
    r = Retriever(db)
    q = np.random.default_rng(6).standard_normal((3, 64)).astype(np.float32)
    feats, idx = r.retrieve_caption_neighbors(jnp.asarray(q), k=2)
    assert feats.shape == (3, 2, 64)
    got = r.names_for(np.asarray(idx))
    assert len(got) == 6 and all(n in names for n in got)


def test_approx_backend_matches_exact_on_cpu():
    """--retrieval-backend approx: on non-TPU backends approx_max_k lowers to
    an exact top-k, so results must equal the xla backend bit-for-bit."""
    import jax

    from keds_tpu.ops.topk import mips_topk, mips_topk_approx
    from keds_tpu.retrieval.database import KnowledgeDB, Retriever

    rng = np.random.default_rng(11)
    db_img = rng.standard_normal((512, 64)).astype(np.float32)
    db_txt = rng.standard_normal((512, 64)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)

    v_e, i_e = mips_topk(q, jnp.asarray(db_img), 16)
    v_a, i_a = mips_topk_approx(q, jnp.asarray(db_img), 16)
    np.testing.assert_array_equal(np.asarray(i_e), np.asarray(i_a))
    np.testing.assert_allclose(np.asarray(v_e), np.asarray(v_a), rtol=1e-6)

    db = KnowledgeDB.from_arrays(db_img, db_txt, dtype=jnp.float32)
    r_x = Retriever(db, backend="xla")
    r_a = Retriever(db, backend="approx")
    feats = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    tx_i, tx_t = r_x.retrieve_features(feats, k=16, rng=None)
    ta_i, ta_t = r_a.retrieve_features(feats, k=16, rng=None)
    np.testing.assert_allclose(np.asarray(tx_i), np.asarray(ta_i), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tx_t), np.asarray(ta_t), rtol=1e-6)


def test_approx_backend_sharded_matches_replicated():
    import jax

    from keds_tpu.parallel.mesh import make_mesh
    from keds_tpu.retrieval.database import KnowledgeDB, Retriever

    rng = np.random.default_rng(12)
    db_img = rng.standard_normal((96, 32)).astype(np.float32)
    db_txt = rng.standard_normal((96, 32)).astype(np.float32)
    db = KnowledgeDB.from_arrays(db_img, db_txt, dtype=jnp.float32)
    mesh = make_mesh(8)
    db_s = db.shard_over(mesh)
    r_rep = Retriever(db, backend="approx")
    r_sh = Retriever(db_s, backend="approx", mesh=mesh, sharded=True)
    feats = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    a_i, a_t = r_rep.retrieve_features(feats, k=8, rng=None)
    s_i, s_t = r_sh.retrieve_features(
        feats, k=8, rng=None, db_arrays=(db_s.image_db, db_s.text_db))
    np.testing.assert_allclose(np.asarray(a_i), np.asarray(s_i), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a_t), np.asarray(s_t), rtol=1e-6)


def test_crossformer_kv_permutation_invariance():
    """Eval omits the reference's unseeded neighbor shuffle
    (src/eval_utils.py:172-175) — a no-op because CrossAttention is
    permutation-invariant over key/value rows (PARITY.md entry)."""
    from keds_tpu.models.heads import crossformer_apply, init_crossformer

    key = jax.random.PRNGKey(0)
    params = init_crossformer(key, 768, 768, 768, num_layers=3)
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 768), jnp.float32)
    kv = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 768), jnp.float32)
    perm = jax.random.permutation(jax.random.PRNGKey(3), 16)
    out = crossformer_apply(params, q, kv, kv)
    out_perm = crossformer_apply(params, q, kv[:, perm], kv[:, perm])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_perm),
                               rtol=1e-5, atol=1e-5)
