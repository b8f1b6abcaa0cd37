"""Accuracy validation of the approx / int8 serving modes on REALISTIC data.

Round-2 review finding (VERDICT weak #4): the 0.986/0.998 neighbor overlaps
behind the max-serving headline were measured on i.i.d. Gaussian unit
vectors — the easy case.  This harness re-measures every quantized /
approximate mode on corpora with real CLIP-feature geometry
(:mod:`keds_tpu.retrieval.synth`: narrow cone + clusters + power-law
anisotropy, ``spread`` controls cluster tightness) and on structured images
through the towers, at three levels:

1. **retrieval backends** (``--retrieval {approx,int8}`` accuracy):
   top-k overlap + top-1 agreement vs the exact scan, per corpus hardness —
   including the int8 dequant-rescore vs true-row-rescore split that round 3
   shipped (``mips_topk_int8(db=...)``).
2. **int8 towers** (``--quant-towers int8`` accuracy): embedding cosine and
   retrieval-neighbor overlap f32-tower vs int8-tower on structured images,
   with and without injected outlier weight channels (the known hazard of
   per-token activation quantization in trained transformers — no trained
   checkpoint ships in this environment, so outliers are injected
   synthetically and that limitation is documented in BENCH_NOTES).
3. **end-to-end pipeline** (``--pipeline``): the full composed-query
   pipeline (encode -> retrieve -> fuse -> compose -> rank a corpus) run
   exact vs each serving config; reports top-1 agreement and top-10 overlap
   of the FINAL corpus ranking — the end-metric the eval recalls are
   computed from.  (CIRR R@k deltas on the reference checkpoints need
   weights this zero-egress environment cannot fetch; ranking agreement on
   identical inputs is the strongest available end-metric statement.)

``approx_max_k`` only approximates on real TPU hardware (it lowers to exact
top-k on CPU), so run this on the TPU host for the approx rows; everything
else is backend-independent.  Results: one JSON line on stdout, human table
on stderr.  Reference anchor: the exact faiss scan these modes replace,
``/root/reference/src/trainer.py:198-259``.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _overlap(a: np.ndarray, b: np.ndarray) -> float:
    k = a.shape[1]
    return float(np.mean([
        len(set(a[i].tolist()) & set(b[i].tolist())) / k for i in range(len(a))
    ]))


def bench_retrieval_backends(args) -> dict:
    import jax.numpy as jnp

    from keds_tpu.ops.topk import (mips_topk, mips_topk_approx,
                                   mips_topk_int8, quantize_int8)
    from keds_tpu.retrieval.synth import correlated_embeddings, shared_geometry

    k = args.k
    out = {}
    cases = [("gaussian", None)] + [("correlated", s) for s in args.spreads]
    for name, spread in cases:
        rng = np.random.default_rng(0)
        if name == "gaussian":
            db = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
            q = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
            db /= np.linalg.norm(db, axis=1, keepdims=True)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            tag = "gaussian"
        else:
            geom = shared_geometry(rng, args.dim)
            db = correlated_embeddings(rng, args.rows, args.dim,
                                       spread=spread, basis=geom)
            q = correlated_embeddings(np.random.default_rng(1), args.queries,
                                      args.dim, spread=spread, basis=geom)
            tag = f"correlated s={spread}"
        jq, jdb = jnp.asarray(q), jnp.asarray(db)
        meancos = float((db[:256] @ db[256:512].T).mean())
        _, ei = mips_topk(jq, jdb, k)
        ei = np.asarray(ei)
        q8, sc = quantize_int8(jdb)
        row = {"mean_cos": round(meancos, 3)}

        _, ai = mips_topk_approx(jq, jdb, k)
        row["approx"] = _overlap(ei, np.asarray(ai))
        _, ai = mips_topk_int8(jq, q8, sc, k, oversample=1)
        row["int8_raw"] = _overlap(ei, np.asarray(ai))
        _, ai = mips_topk_int8(jq, q8, sc, k, oversample=4)
        row["int8_deq_rescore"] = _overlap(ei, np.asarray(ai))
        _, ai = mips_topk_int8(jq, q8, sc, k, oversample=4, db=jdb)
        ai = np.asarray(ai)
        row["int8_true_rescore"] = _overlap(ei, ai)
        row["int8_true_top1"] = float(np.mean(ai[:, 0] == ei[:, 0]))
        # f32 tie-noise floor: the same exact search with a different
        # accumulation order — overlap below this is unresolvable.
        exact_np = (q.astype(np.float64) @ db.T.astype(np.float64))
        ni = np.argsort(-exact_np, axis=1, kind="stable")[:, :k]
        row["f32_tie_floor"] = _overlap(ei, ni)
        out[tag] = {m: round(v, 4) if isinstance(v, float) else v
                    for m, v in row.items()}
        log(f"[retrieval] {tag:18s} " + "  ".join(
            f"{m}={v}" for m, v in out[tag].items()))
    return out


def bench_int8_towers(args) -> dict:
    import jax
    import jax.numpy as jnp

    from keds_tpu.models import clip as mclip
    from keds_tpu.ops.quant import quantize_clip_blocks
    from keds_tpu.ops.topk import mips_topk
    from keds_tpu.retrieval.synth import structured_images

    cfg = mclip.VIT_L_14 if not args.quick else mclip.ClipConfig(
        embed_dim=64, image_resolution=64, vision_layers=3, vision_width=128,
        vision_patch_size=16, transformer_width=64, transformer_heads=2,
        transformer_layers=3)
    dtype = jnp.bfloat16
    params = mclip.init_clip(jax.random.key(0), cfg, dtype=dtype)
    rng = np.random.default_rng(2)
    n_corpus, n_q = (256, 64) if args.quick else (1024, 128)
    res = cfg.image_resolution
    corpus_imgs = structured_images(rng, n_corpus, res)
    query_imgs = structured_images(np.random.default_rng(3), n_q, res)

    enc = jax.jit(lambda p, x: mclip.encode_image(p, cfg, x.astype(dtype)),
                  static_argnames=())

    def embed(p, imgs):
        outs = []
        for i in range(0, len(imgs), 32):
            f = np.asarray(enc(p, jnp.asarray(imgs[i:i + 32])), np.float32)
            outs.append(f / np.linalg.norm(f, axis=1, keepdims=True))
        return np.concatenate(outs)

    from keds_tpu.retrieval.synth import inject_outlier_channels

    out = {}
    for variant in ("plain", "outlier"):
        p = params if variant == "plain" else inject_outlier_channels(params)
        pq = quantize_clip_blocks(p)
        f_ref = embed(p, query_imgs)
        f_q = embed(pq, query_imgs)
        cos = np.sum(f_ref * f_q, axis=1)
        db_ref = embed(p, corpus_imgs)
        _, ei = mips_topk(jnp.asarray(f_ref), jnp.asarray(db_ref), args.k)
        _, qi = mips_topk(jnp.asarray(f_q), jnp.asarray(db_ref), args.k)
        out[variant] = {
            "cos_mean": round(float(cos.mean()), 5),
            "cos_min": round(float(cos.min()), 5),
            "nbr_overlap": round(_overlap(np.asarray(ei), np.asarray(qi)), 4),
        }
        log(f"[int8 towers] {variant:8s} {out[variant]}")
    return out


def bench_pipeline(args) -> dict:
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from keds_tpu.models import clip as mclip
    from keds_tpu.models.composition import compose_pseudo_tokens
    from keds_tpu.ops.quant import maybe_quantize_clip
    from keds_tpu.ops.topk import mips_topk
    from keds_tpu.retrieval.database import KnowledgeDB, Retriever
    from keds_tpu.retrieval.synth import (correlated_embeddings,
                                          shared_geometry, structured_images)

    cfg = mclip.VIT_L_14 if not args.quick else mclip.ClipConfig(
        embed_dim=64, image_resolution=64, vision_layers=3, vision_width=128,
        vision_patch_size=16, transformer_width=64, transformer_heads=2,
        transformer_layers=3)
    dtype = jnp.bfloat16
    rows = args.rows
    batch = 64
    clip_params, heads, _ = ge._build(cfg, db_rows=8, dtype=dtype)
    # Knowledge DB + final-ranking corpus share the correlated geometry.
    rng = np.random.default_rng(5)
    geom = shared_geometry(rng, cfg.embed_dim)
    img_db = correlated_embeddings(rng, rows, cfg.embed_dim, spread=0.35,
                                   basis=geom)
    txt_db = correlated_embeddings(rng, rows, cfg.embed_dim, spread=0.35,
                                   basis=geom)
    corpus = jnp.asarray(correlated_embeddings(
        rng, args.corpus_rows, cfg.embed_dim, spread=0.35, basis=geom))
    db = KnowledgeDB.from_arrays(img_db, txt_db, dtype=jnp.float32)
    images = jnp.asarray(
        structured_images(np.random.default_rng(6), batch, cfg.image_resolution),
        dtype)
    text = np.zeros((batch, 77), np.int32)
    text[:, :8] = [49406, 320, 1125, 539, 265, 267, 1929, 49407]
    text = jnp.asarray(text)

    def run(backend: str, quant_towers: str):
        retr = Retriever(db, backend=backend)
        cp = maybe_quantize_clip(clip_params, quant_towers)
        dbq = retr.quant_arrays()

        @jax.jit
        def prog(cp, heads, db_img, db_txt, dbq, images, text, corpus):
            f = mclip.encode_image_chunked(cp, cfg, images,
                                           mclip.DEFAULT_ENCODE_CHUNK)
            ti, tt = retr.retrieve_features(
                f.astype(jnp.float32), k=16, db_arrays=(db_img, db_txt),
                db_quant=dbq)
            tok = compose_pseudo_tokens(heads, f, ti.astype(f.dtype),
                                        tt.astype(f.dtype), train=False)
            out = mclip.encode_text_img_retrieval(cp, cfg, text, tok,
                                                  split_id=265)
            out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
            _, idx = mips_topk(out.astype(jnp.float32),
                               corpus.astype(jnp.float32), 10)
            return idx

        return np.asarray(prog(cp, heads, db.image_db, db.text_db, dbq,
                               images, text, corpus))

    ref = run("xla", "none")
    out = {}
    for tag, backend, qt in (("approx", "approx", "none"),
                             ("int8_db", "int8", "none"),
                             ("int8_towers", "xla", "int8"),
                             ("int8_both", "int8", "int8")):
        idx = run(backend, qt)
        out[tag] = {
            "top1_agree": round(float(np.mean(idx[:, 0] == ref[:, 0])), 4),
            "top10_overlap": round(_overlap(ref, idx), 4),
        }
        log(f"[pipeline] {tag:12s} {out[tag]}")
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--rows", type=int, default=200_000,
                   help="knowledge-DB rows (retrieval + pipeline parts)")
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--spreads", type=float, nargs="+",
                   default=[0.35, 0.15, 0.05],
                   help="correlated-corpus cluster tightness sweep "
                        "(0.35 ~ real CLIP corpora; smaller = harder)")
    p.add_argument("--corpus-rows", type=int, default=4096,
                   help="final-ranking corpus size for --pipeline")
    p.add_argument("--parts", nargs="+",
                   default=["retrieval", "towers", "pipeline"],
                   choices=["retrieval", "towers", "pipeline"])
    p.add_argument("--quick", action="store_true",
                   help="small sizes / tiny tower (CPU smoke)")
    args = p.parse_args(argv)
    if args.quick:
        args.rows = min(args.rows, 20_000)
        args.queries = min(args.queries, 64)
        args.corpus_rows = min(args.corpus_rows, 512)

    from keds_tpu.runtime import setup_jax

    setup_jax()
    import jax

    log(f"quant_accuracy: backend={jax.default_backend()} rows={args.rows} "
        f"(approx rows are only meaningful on TPU)")
    results = {}
    if "retrieval" in args.parts:
        results["retrieval"] = bench_retrieval_backends(args)
    if "towers" in args.parts:
        results["towers"] = bench_int8_towers(args)
    if "pipeline" in args.parts:
        results["pipeline"] = bench_pipeline(args)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
