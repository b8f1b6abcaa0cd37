"""ComposedQueryEngine: pipelined corpus encode + composed search."""

import numpy as np

import jax
import jax.numpy as jnp

from keds_tpu.engine import ComposedQueryEngine
from keds_tpu.models import clip as mclip, heads as mheads
from keds_tpu.models.composition import FusionHeads
from keds_tpu.retrieval.database import KnowledgeDB

D = 64


def test_engine_end_to_end():
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
    db = KnowledgeDB.from_arrays(rng.standard_normal((128, D)),
                                 rng.standard_normal((128, D)), dtype=jnp.float32)
    engine = ComposedQueryEngine(clip_params, cfg, heads, db,
                                 compute_dtype=jnp.float32, db_topk=8)

    corpus_batches = [rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
                      for _ in range(3)]
    corpus = engine.encode_corpus(corpus_batches)
    assert corpus.shape == (12, D)
    np.testing.assert_allclose(np.linalg.norm(corpus, axis=1), 1.0, atol=1e-4)

    text = np.zeros((2, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    q_imgs = [rng.standard_normal((2, 32, 32, 3)).astype(np.float32)]
    scores, idx = engine.search(q_imgs, [text], corpus, topn=5)
    assert scores.shape == (2, 5) and idx.shape == (2, 5)
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    assert (idx < 12).all() and (idx >= 0).all()


def test_engine_mesh_sharded_matches_single_device():
    """Mesh-sharded serving (batch over 'data', padded odd batches) must
    equal the unsharded engine bit-for-close."""
    import jax

    from keds_tpu.engine import ComposedQueryEngine
    from keds_tpu.models import clip as mclip, heads as mheads
    from keds_tpu.models.composition import FusionHeads
    from keds_tpu.parallel.mesh import make_mesh
    from keds_tpu.retrieval.database import KnowledgeDB

    D = 64
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
    rng = np.random.default_rng(0)
    db = KnowledgeDB.from_arrays(rng.standard_normal((64, D)),
                                 rng.standard_normal((64, D)), dtype=jnp.float32)
    mk = lambda mesh: ComposedQueryEngine(  # noqa: E731
        params, cfg, heads, db, compute_dtype=jnp.float32, db_topk=8, mesh=mesh)
    e1 = mk(None)
    e8 = mk(make_mesh(8))

    # odd batch size (5) forces padding on the 8-device mesh
    imgs = [rng.standard_normal((5, 32, 32, 3)).astype(np.float32)]
    text = np.zeros((5, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    corpus1 = e1.encode_corpus(imgs)
    corpus8 = e8.encode_corpus(imgs)
    np.testing.assert_allclose(corpus8, corpus1, rtol=1e-5, atol=1e-5)
    q1 = e1.compose(imgs, [text])
    q8 = e8.compose(imgs, [text])
    np.testing.assert_allclose(q8, q1, rtol=1e-5, atol=1e-5)


def test_engine_chunked_encode_matches_unchunked():
    import jax

    from keds_tpu.engine import ComposedQueryEngine
    from keds_tpu.models import clip as mclip, heads as mheads
    from keds_tpu.models.composition import FusionHeads
    from keds_tpu.retrieval.database import KnowledgeDB

    D = 64
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
    rng = np.random.default_rng(1)
    db = KnowledgeDB.from_arrays(rng.standard_normal((64, D)),
                                 rng.standard_normal((64, D)), dtype=jnp.float32)
    mk = lambda chunk: ComposedQueryEngine(  # noqa: E731
        params, cfg, heads, db, compute_dtype=jnp.float32, db_topk=8,
        encode_chunk=chunk)
    e_plain = mk(None)
    e_chunk = mk(4)
    imgs = [rng.standard_normal((8, 32, 32, 3)).astype(np.float32)]
    text = np.zeros((8, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    np.testing.assert_allclose(e_chunk.encode_corpus(imgs),
                               e_plain.encode_corpus(imgs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(e_chunk.compose(imgs, [text]),
                               e_plain.compose(imgs, [text]), rtol=1e-5, atol=1e-5)


def test_engine_compose_matches_manual_pipeline():
    """The two-program engine schedule must be mathematically identical to a
    manually composed encode->retrieve->fuse->text pipeline."""
    import jax

    from keds_tpu.engine import ComposedQueryEngine
    from keds_tpu.models import clip as mclip, heads as mheads
    from keds_tpu.models.composition import FusionHeads, compose_pseudo_tokens
    from keds_tpu.retrieval.database import KnowledgeDB, Retriever
    from keds_tpu.tokenizer import star_token_id

    D = 64
    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=2,
    )
    params = mclip.init_clip(jax.random.key(3), cfg)
    k1, k2, k3 = jax.random.split(jax.random.key(4), 3)
    heads = FusionHeads(
        img2text=mheads.init_im2text(k1, D, 48, D),
        retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=3),
        text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=3),
    )
    rng = np.random.default_rng(5)
    db = KnowledgeDB.from_arrays(rng.standard_normal((64, D)),
                                 rng.standard_normal((64, D)), dtype=jnp.float32)
    eng = ComposedQueryEngine(params, cfg, heads, db,
                              compute_dtype=jnp.float32, db_topk=8,
                              encode_chunk=4)
    imgs = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    text = np.zeros((8, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    got = eng.compose([imgs], [text])

    # manual single-shot pipeline (no chunking, no program split)
    f = mclip.encode_image(eng.clip_c, cfg, jnp.asarray(imgs))
    ti, tt = Retriever(db).retrieve_features(f.astype(jnp.float32), k=8, rng=None)
    tok = compose_pseudo_tokens(eng.heads, f, ti.astype(f.dtype),
                                tt.astype(f.dtype), train=False)
    out = mclip.encode_text_img_retrieval(eng.clip_c, cfg, jnp.asarray(text),
                                          tok, split_id=star_token_id())
    want = np.asarray(out / jnp.linalg.norm(out, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _tiny_setup(seed=0, n_db=128):
    cfg = mclip.ClipConfig(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=D, transformer_heads=1,
        transformer_layers=2,
    )
    params = mclip.init_clip(jax.random.key(seed), cfg)
    k1, k2, k3 = jax.random.split(jax.random.key(seed + 1), 3)
    heads = FusionHeads(
        img2text=mheads.init_im2text(k1, D, 48, D),
        retrieval_fuse=mheads.init_crossformer(k2, D, D, D, num_layers=3),
        text_condition=mheads.init_crossformer(k3, D, D, D, num_layers=3),
    )
    rng = np.random.default_rng(seed)
    db = KnowledgeDB.from_arrays(rng.standard_normal((n_db, D)),
                                 rng.standard_normal((n_db, D)), dtype=jnp.float32)
    return cfg, params, heads, db, rng


def test_device_corpus_search_matches_host():
    """Device-side ranking (DeviceCorpus + mips_topk) must equal the host
    numpy fallback — single device and on the 8-device mesh (row-sharded
    corpus with padding)."""
    from keds_tpu.parallel.mesh import make_mesh

    cfg, params, heads, db, rng = _tiny_setup(7)
    text = np.zeros((6, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    imgs = [rng.standard_normal((6, 32, 32, 3)).astype(np.float32)]
    corpus_imgs = [rng.standard_normal((5, 32, 32, 3)).astype(np.float32)
                   for _ in range(4)]  # 20 rows: not a multiple of 8
    for mesh in (None, make_mesh(8)):
        eng = ComposedQueryEngine(params, cfg, heads, db,
                                  compute_dtype=jnp.float32, db_topk=8,
                                  mesh=mesh)
        corpus = eng.encode_corpus(corpus_imgs)
        s_host, i_host = eng.search(imgs, [text], corpus, topn=5)
        dev = eng.corpus_to_device(corpus)
        assert dev.n_real == 20
        s_dev, i_dev = eng.search(imgs, [text], dev, topn=5)
        np.testing.assert_allclose(s_dev, s_host, rtol=1e-5, atol=1e-5)
        # indices may differ only on exact-tie scores
        mism = i_dev != i_host
        if mism.any():
            np.testing.assert_allclose(s_dev[mism], s_host[mism], atol=1e-6)


def test_engine_rank_topn_clamped():
    cfg, params, heads, db, rng = _tiny_setup(9)
    eng = ComposedQueryEngine(params, cfg, heads, db,
                              compute_dtype=jnp.float32, db_topk=8)
    corpus = rng.standard_normal((3, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    dev = eng.corpus_to_device(corpus)
    q = rng.standard_normal((2, D)).astype(np.float32)
    s, i = eng.rank(jnp.asarray(q), dev, topn=10)  # topn > corpus rows
    assert s.shape == (2, 3) and i.shape == (2, 3)


def test_engine_mesh_chunked_encode_matches_unsharded():
    """Per-shard chunking under the mesh (shard_map moves the chunk loop
    inside each shard) must equal the unsharded chunked engine — the
    round-2 conflict that silently disabled the macro schedule on meshes."""
    from keds_tpu.parallel.mesh import make_mesh

    cfg, params, heads, db, rng = _tiny_setup(21, n_db=64)
    mk = lambda mesh, chunk: ComposedQueryEngine(  # noqa: E731
        params, cfg, heads, db, compute_dtype=jnp.float32, db_topk=8,
        mesh=mesh, encode_chunk=chunk)
    e1 = mk(None, 2)
    e8 = mk(make_mesh(8), 2)   # 32 rows -> 4/shard -> 2 chunks per shard
    imgs = [rng.standard_normal((32, 32, 32, 3)).astype(np.float32)]
    text = np.zeros((32, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    np.testing.assert_allclose(e8.encode_corpus(imgs), e1.encode_corpus(imgs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(e8.compose(imgs, [text]), e1.compose(imgs, [text]),
                               rtol=1e-5, atol=1e-5)


def test_engine_text_bucketing_matches_full_width():
    """Host-side text-length bucketing (the serving analog of the train
    step's causal prompt truncation): a short-caption batch runs the
    compose program at S=16/32 instead of 77 with identical features —
    the splice pools at eot+2 and a causal tower's prefix outputs are
    independent of the dead zero tail.  Long captions must stay at 77."""
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
    db = KnowledgeDB.from_arrays(rng.standard_normal((128, D)),
                                 rng.standard_normal((128, D)), dtype=jnp.float32)
    eng = ComposedQueryEngine(clip_params, cfg, heads, db,
                              compute_dtype=jnp.float32, db_topk=8)
    eng_full = ComposedQueryEngine(clip_params, cfg, heads, db,
                                   compute_dtype=jnp.float32, db_topk=8)
    eng_full.TEXT_BUCKETS = (77,)  # disable bucketing on the reference engine

    # short caption: eot at 7 -> needs 10 -> bucket 16
    text = np.zeros((2, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    assert eng._bucket_text(text).shape[1] == 16
    imgs = [rng.standard_normal((2, 32, 32, 3)).astype(np.float32)]
    q_b = eng.compose(imgs, [text])
    q_f = eng_full.compose(imgs, [text])
    np.testing.assert_allclose(q_b, q_f, rtol=1e-5, atol=1e-6)

    # mid-length caption: eot at 20 -> needs 23 -> bucket 32
    text2 = np.zeros((2, 77), np.int32)
    text2[:, 0] = 49406
    text2[:, 1:20] = 320
    text2[:, 4] = 265  # the * placeholder
    text2[:, 20] = 49407
    assert eng._bucket_text(text2).shape[1] == 32
    np.testing.assert_allclose(eng.compose(imgs, [text2]),
                               eng_full.compose(imgs, [text2]),
                               rtol=1e-5, atol=1e-6)

    # caption running to the end of the context: no bucket covers it -> 77
    text3 = np.zeros((1, 77), np.int32)
    text3[:, 0] = 49406
    text3[:, 1:76] = 320
    text3[:, 4] = 265
    text3[:, 76] = 49407
    assert eng._bucket_text(text3).shape[1] == 77
