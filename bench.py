"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: **composed queries / sec / chip** on the flagship pipeline
(BASELINE.json config 3): CLIP ViT-L/14 image encode -> top-16 MIPS retrieval
over the 0.5M x 768 bi-modality knowledge DB -> dual-stream fusion -> frozen
text-tower compose.  This is the reference's core inference primitive
(SURVEY.md §3.5), jitted in bf16 under the macro serving schedule: a
256-query macro batch runs as TWO programs — chunk-16 encode, then
retrieval+fusion+compose — with features staying on device (the fused
single program measures ~15% slower; batch/chunk sweeps in BENCH_NOTES.md).

``vs_baseline`` divides by an analytic estimate of the reference
PyTorch+Faiss pipeline on one A100 — the repo publishes no numbers
(BASELINE.md), so the estimate is derived from first principles and kept
fixed across rounds so the ratio is comparable:

  per batch of 64 composed queries on A100 (fp16):
    ViT-L/14 encode  ~162 GFLOP/img -> 312 TFLOPS @ 40% MFU  ~ 83 ms
    faiss L2 scan    2 x (64 x 0.5M x 768) w/ GPU<->CPU hop   ~ 10 ms
    fusion + text tower + host glue                           ~ 10 ms
  => ~64 / 0.103 s  ~ 620 q/s theoretical; with the reference's per-step
     host round-trips and unpipelined eval loop, ~400 q/s is a generous
     realistic figure.  A100_BASELINE_QPS = 400.

Stage timings (image encode, retrieval xla vs pallas, fusion+compose) are
printed to stderr for diagnosis; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

A100_BASELINE_QPS = 400.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _sync(x) -> float:
    """Force completion by fetching one scalar to host.  On the axon tunnel
    ``block_until_ready`` does NOT block; a data fetch is the only reliable
    barrier."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def timeit_chain(step, state, iters: int, warmup: int = 2):
    """LATENCY: time ``state -> step(state) -> ...`` with a data dependency
    between iterations and a single scalar fetch at the end.  Includes the
    per-dispatch tunnel gap, so this upper-bounds single-stream latency."""
    for _ in range(warmup):
        state = step(state)
    _sync(state)
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s = step(s)
    _sync(s)
    return (time.perf_counter() - t0) / iters


def timeit_pipelined(step, inputs, warmup: int = 2):
    """THROUGHPUT: dispatch independent batches back-to-back (async dispatch
    pipelines host->device gaps behind execution, as a serving loop would)
    and fetch every scalar output at the end.  Each ``step(x)`` must return a
    scalar.  Verified against the device time reported by jax.profiler."""
    for x in inputs[:warmup]:
        _ = float(np.asarray(step(x)))
    t0 = time.perf_counter()
    outs = [step(x) for x in inputs]
    for o in outs:
        float(np.asarray(o))
    return (time.perf_counter() - t0) / len(inputs)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small DB / few iters")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--db-rows", type=int, default=None)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--stages", action="store_true",
                   help="also time encode/retrieval stages separately "
                        "(compiles extra programs; slow on cold caches)")
    p.add_argument("--train", action="store_true",
                   help="measure the training step instead (image stream, "
                        "precomputed features, reference recipe batch)")
    p.add_argument("--raw", action="store_true",
                   help="with --train: feed RAW uint8 images (in-graph "
                        "frozen-CLIP encode inside the step — the wds "
                        "training path's device rate, isolated from the "
                        "host JPEG decode that bounds the CLI on 1 core)")
    p.add_argument("--stream", choices=["image", "text"], default="image",
                   help="with --train: which stream's step to measure "
                        "(text adds the top-2 caption retrieval + the "
                        "device-gathered neighbor-template loss terms)")
    p.add_argument("--quant", choices=["none", "int8"], default="none",
                   help="W8A8-quantize the tower GEMMs (BENCH_NOTES: ~parity "
                        "speed on v5e via XLA — int8 is not double-rate on "
                        "this stack; 4x smaller tower weights)")
    p.add_argument("--retrieval", choices=["xla", "approx", "int8", "pallas"],
                   default="xla", help="retrieval backend for the headline")
    p.add_argument("--encode-chunk", type=int, default=None,
                   help="encode the batch in chunks of this size inside the "
                        "composed program (encode is fastest at the chunk-16 "
                        "schedule; retrieval/text-tower MXU utilization grows "
                        "with batch — chunked encode decouples the two)")
    p.add_argument("--neighbors", action="store_true",
                   help="train bench: precomputed-neighbor mode — the step "
                        "gathers DB rows by index instead of searching "
                        "(tools/precompute_neighbors.py; exact, features "
                        "mode only)")
    p.add_argument("--scan", action="store_true",
                   help="train bench: measure the step by an in-jit x8 "
                        "varied-batch scan instead of per-dispatch chaining "
                        "— required for sub-RTT steps (a ~10 ms step "
                        "chain-measures the tunnel dispatch floor); implied "
                        "by --neighbors.  The approx scoreboard number is "
                        "`--train --retrieval approx --scan`")
    p.add_argument("--query-tokens", type=int, default=None,
                   help="composed-query caption length in tokens (default "
                        "14, a typical CIRR relative caption -> the S=32 "
                        "text bucket; 76 forces the full-width program)")
    p.add_argument("--u8", action="store_true",
                   help="feed uint8 images + in-graph normalization (the "
                        "device-preprocess wire format; 2x less transfer "
                        "than bf16, 4x less than f32)")
    p.add_argument("--latency", action="store_true",
                   help="serving LATENCY curve instead of the throughput "
                        "headline: chained wall latency (includes one ~30 ms "
                        "tunnel RTT per dispatch) + in-jit x8 device latency "
                        "of the fused composed-query program at b1/b32/"
                        "b{batch} — the SLO numbers the pipelined headline "
                        "must not be mistaken for (round-4 VERDICT weak #4)")
    args = p.parse_args()
    if args.train:
        bench_train(args)
        return

    import jax
    import jax.numpy as jnp

    from keds_tpu.runtime import setup_jax

    setup_jax()

    from keds_tpu.models import clip as mclip
    from keds_tpu.models.composition import compose_pseudo_tokens
    from keds_tpu.ops.topk import mips_topk, mips_topk_fused
    from keds_tpu.retrieval.database import Retriever
    import __graft_entry__ as ge

    quick = args.quick
    # Headline schedule: macro-batch 256 with chunked encode — encode runs at
    # its optimal chunk while retrieval/text-tower amortize their lane-bound
    # costs over 16x the queries.  Re-swept on the round-4 final pipeline
    # (pooled tail + text buckets + chunk-16): 64/128/256/512 -> 768/785/794/
    # 796 q/s — 256 is the knee (512 ties at double the latency); the round-3
    # "macro 256 loses" note is superseded (sweeps in BENCH_NOTES).
    batch = args.batch or 256
    _chunk = mclip.DEFAULT_ENCODE_CHUNK
    if args.encode_chunk is None and batch > _chunk and batch % _chunk == 0:
        args.encode_chunk = _chunk  # macro schedule; --encode-chunk 0 disables
    if args.encode_chunk == 0:
        args.encode_chunk = None
    db_rows = args.db_rows or (50_000 if quick else 500_000)
    iters = args.iters or (5 if quick else 15)
    dtype = jnp.bfloat16
    cfg = mclip.VIT_L_14

    log(f"bench: devices={jax.devices()} batch={batch} db_rows={db_rows} iters={iters}"
        f" quant={args.quant} u8={args.u8}")
    clip_params, heads, db = ge._build(cfg, db_rows=db_rows, dtype=dtype)
    from keds_tpu.ops.quant import maybe_quantize_clip

    clip_params = maybe_quantize_clip(clip_params, args.quant)
    retriever = Retriever(db, backend=args.retrieval)
    rng = np.random.default_rng(0)

    def make_images(r):
        if args.u8:
            return jnp.asarray(r.integers(0, 256, (batch, 224, 224, 3)), jnp.uint8)
        return jnp.asarray(r.standard_normal((batch, 224, 224, 3)), dtype)

    images = make_images(rng)
    # Realistic CIRR-length composed query: "a photo of * , {caption}" with
    # a ~14-token relative caption (EOT at 20).  The engine buckets text by
    # the batch's host-known max length (keds_tpu.engine.bucket_text;
    # equality-tested vs full width) — this lands in the S=32 bucket, the
    # one typical CIRR/serving captions hit.  Overridable for sweeps:
    # --query-tokens 76 forces the full-width S=77 program.
    from keds_tpu.engine import bucket_text

    n_cap = max(args.query_tokens or 14, 1)
    text = np.zeros((batch, 77), np.int32)
    text[:, 0] = 49406
    text[:, 1:4] = [320, 1125, 539]           # "a photo of"
    text[:, 4:6] = [265, 267]                 # "* ,"
    end = min(6 + n_cap, 76)
    text[:, 6:end] = rng.integers(1000, 40000, (batch, end - 6))
    text[:, end] = 49407
    text = jnp.asarray(bucket_text(text))
    log(f"query text: caption {n_cap} tokens -> S={text.shape[1]} bucket")

    # --- optional stage timings (stderr) ----------------------------------
    # Big arrays (CLIP params, DB) are always jit ARGUMENTS, never closures.
    # Each timed step returns a tensor that feeds the next iteration's input,
    # serializing execution (see timeit_chain).  Off by default: every extra
    # jitted program costs minutes of remote compile on a cold cache.
    if args.stages:
        @jax.jit
        def enc_tp(cp, im):
            return jnp.sum(mclip.encode_image_chunked(cp, cfg, im,
                                                      args.encode_chunk))

        enc_inputs = [make_images(rng) for _ in range(iters)]
        t_enc = timeit_pipelined(lambda im: enc_tp(clip_params, im), enc_inputs)
        log(f"stage encode_image (DB-encode rate): {t_enc*1e3:.2f} ms/batch "
            f"({batch/t_enc:.0f} img/s)")

        # Sub-RTT programs (a few ms) are unmeasurable through the tunnel by
        # chained or pipelined dispatch (~30 ms relay floor per dispatch);
        # repeat the body REP times INSIDE one jit with a scalar-feedback
        # loop and divide (BENCH_NOTES round-4 methodology).
        REP = 8

        def repeat_retr(search):
            @jax.jit
            def fn(q_, d_):
                def body(i, carry):
                    vals, _ = search(carry, d_)
                    return carry + (jnp.sum(vals) * 1e-30).astype(carry.dtype)
                out = jax.lax.fori_loop(0, REP, body, q_)
                return jnp.sum(out.astype(jnp.float32))
            return fn

        retr_xla = repeat_retr(lambda q_, d_: mips_topk(q_, d_, 16))
        retr_pal = repeat_retr(lambda q_, d_: mips_topk_fused(q_, d_, 16))
        q_inputs = [jnp.asarray(rng.standard_normal((batch, cfg.embed_dim)),
                                db.image_db.dtype) for _ in range(iters)]
        t_xla = timeit_pipelined(lambda q_: retr_xla(q_, db.image_db), q_inputs) / REP
        t_pal = timeit_pipelined(lambda q_: retr_pal(q_, db.image_db), q_inputs) / REP
        log(f"stage retrieval (1 modality, {db_rows} rows, x{REP} in-jit): "
            f"xla {t_xla*1e3:.2f} ms, pallas {t_pal*1e3:.2f} ms")

    # --- headline: full composed-query pipeline ---------------------------
    # The int8 index (when --retrieval int8) is threaded as jit ARGUMENTS
    # like the DB itself — rule 3: closed-over arrays inline into the HLO
    # and the remote-compile path rejects the result.
    db_quant = retriever.quant_arrays()

    def rest_body(clip_params, heads, db_img, db_txt, dbq, f, text):
        """retrieval+fusion+compose tail, shared by the fused latency
        program and the two-program throughput pipeline."""
        ti, tt = retriever.retrieve_features(
            f.astype(jnp.float32), k=16, db_arrays=(db_img, db_txt),
            db_quant=dbq,
        )
        tok = compose_pseudo_tokens(heads, f, ti.astype(f.dtype),
                                    tt.astype(f.dtype), train=False)
        out = mclip.encode_text_img_retrieval(clip_params, cfg, text, tok,
                                              split_id=265)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    @jax.jit
    def composed_latency_step(clip_params, heads, db_img, db_txt, dbq, images, text):
        f = mclip.encode_image_chunked(clip_params, cfg, images,
                                       args.encode_chunk)
        out = rest_body(clip_params, heads, db_img, db_txt, dbq, f, text)
        return images + (jnp.sum(out) * 1e-30).astype(images.dtype)

    # Two-program serving pipeline (the engine's schedule): encode program,
    # then retrieval+fusion+compose, features staying on device.  The fused
    # single-program variant measures ~15% slower (XLA's merged-HLO schedule
    # loses prefetch overlap; BENCH_NOTES.md round-2).
    @jax.jit
    def enc_prog(clip_params, images):
        return mclip.encode_image_chunked(clip_params, cfg, images,
                                          args.encode_chunk)

    @jax.jit
    def rest_prog(clip_params, heads, db_img, db_txt, dbq, f, text):
        return jnp.sum(rest_body(clip_params, heads, db_img, db_txt, dbq, f, text))

    # --- serving latency curve (--latency) --------------------------------
    # The pipelined headline is THROUGHPUT; a serving SLO needs the chained
    # latency-vs-batch curve (round-4 VERDICT weak #4).  Two readings per
    # batch size: chained wall (one dispatch per batch — includes the ~30 ms
    # tunnel RTT a locally-attached host would not pay) and the in-jit
    # x-REP device latency (the fused program repeated with a data-dependent
    # carry inside one jit; RTT amortized to RTT/REP).
    if args.latency:
        def make_lat_steps(chunk, reps):
            # clip/heads/DB are jit ARGUMENTS (rule 3: closures inline ~2.4 GB
            # of constants into the HLO; the remote-compile path rejects it).
            def body_fn(cp, hd, dbi, dbt, dbq, im, tx):
                f = mclip.encode_image_chunked(cp, cfg, im, chunk)
                out = rest_body(cp, hd, dbi, dbt, dbq, f, tx)
                return im + (jnp.sum(out) * 1e-30).astype(im.dtype)

            @jax.jit
            def step(cp, hd, dbi, dbt, dbq, im, tx):
                return body_fn(cp, hd, dbi, dbt, dbq, im, tx)

            @jax.jit
            def step_rep(cp, hd, dbi, dbt, dbq, im, tx):
                return jax.lax.fori_loop(
                    0, reps,
                    lambda i, c: body_fn(cp, hd, dbi, dbt, dbq, c, tx), im)
            return step, step_rep

        curve = {}
        for b in sorted({1, 32, batch}):
            chunk = _chunk if (b > _chunk and b % _chunk == 0) else None
            # more in-jit reps at small batches: the residual RTT/reps bias
            # must stay well under the device latency being measured
            reps = max(8, min(64, 512 // b))
            im_b, tx_b = images[:b], text[:b]
            step, step_rep = make_lat_steps(chunk, reps)

            # (1) the ENGINE's request path: two-program schedule (encode,
            # then rest), one synchronous result fetch per request — the
            # wall a client of THIS deployment sees (includes ~2 dispatch
            # RTTs + the fetch RTT of the tunnel; a locally-attached host
            # saves ~30 ms per hop).
            @jax.jit
            def enc_b(cp, im):
                return mclip.encode_image_chunked(cp, cfg, im, chunk)

            def two_prog_req(im):
                f = enc_b(clip_params, im)
                return rest_prog(clip_params, heads, db.image_db, db.text_db,
                                 db_quant, f, tx_b)

            for _ in range(2):  # warmup/compile
                float(np.asarray(two_prog_req(im_b)))
            n_it = max(iters // 2, 3)
            t0 = time.perf_counter()
            for _ in range(n_it):
                float(np.asarray(two_prog_req(im_b)))  # sync per request
            t_2p = (time.perf_counter() - t0) / n_it

            # (2) fused single-program latencies: chained wall + in-jit
            # device time.  NOTE the b256 finding (BENCH_NOTES round 5):
            # the fused chunked-encode lowering is ~2.6x worse than the
            # two-program schedule the engine actually runs — these numbers
            # bound a single-dispatch deployment, not the engine.
            t_ch = timeit_chain(
                lambda im: step(clip_params, heads, db.image_db, db.text_db,
                                db_quant, im, tx_b),
                im_b, max(iters // 2, 3))
            t_dev = timeit_chain(
                lambda im: step_rep(clip_params, heads, db.image_db,
                                    db.text_db, db_quant, im, tx_b),
                im_b, max(iters // 4, 2)) / reps
            curve[b] = {"two_prog_chained_ms": round(t_2p * 1e3, 2),
                        "fused_chained_ms": round(t_ch * 1e3, 2),
                        "fused_device_ms": round(t_dev * 1e3, 2)}
            log(f"latency b{b}: two-prog request {t_2p*1e3:.2f} ms "
                f"({t_2p*1e3/b:.2f} ms/q), fused chained {t_ch*1e3:.2f} ms "
                f"({t_ch*1e3/b:.2f} ms/q), fused in-jit x{reps} device "
                f"{t_dev*1e3:.2f} ms ({t_dev*1e3/b:.2f} ms/q)")
        print(json.dumps({
            "metric": "composed_query_latency_ms_per_batch",
            "value": curve[batch]["two_prog_chained_ms"],
            "unit": f"ms/b{batch}",
            "method": "two-program request, sync fetch per batch",
            "curve": curve,
            "vs_baseline": None,
        }))
        return

    t_lat = timeit_chain(
        lambda im: composed_latency_step(clip_params, heads, db.image_db,
                                         db.text_db, db_quant, im, text),
        images, max(iters // 2, 3),
    )
    log(f"composed query latency (chained, fused program): {t_lat*1e3:.2f} ms/batch")

    batch_inputs = [make_images(rng) for _ in range(iters)]

    def two_prog(im):
        f = enc_prog(clip_params, im)
        return rest_prog(clip_params, heads, db.image_db, db.text_db,
                         db_quant, f, text)

    t = timeit_pipelined(two_prog, batch_inputs)
    qps = batch / t
    log(f"composed query two-program pipeline: {t*1e3:.2f} ms/batch -> {qps:.1f} q/s/chip")

    print(json.dumps({
        "metric": "composed_queries_per_sec_per_chip",
        "value": round(qps, 2),
        "unit": "query/s",
        "vs_baseline": round(qps / A100_BASELINE_QPS, 3),
    }))


def bench_train(args) -> None:
    """Training-step throughput (BASELINE.json config 5): image-stream loss
    on precomputed features — retrieval + fusion + frozen text tower + AdamW
    in one jitted step (reference recipe: batch 128, src/README.md:23)."""
    import jax
    import jax.numpy as jnp

    from keds_tpu.runtime import setup_jax

    setup_jax()

    from keds_tpu.config import Config
    from keds_tpu.models import clip as mclip
    from keds_tpu.retrieval.database import Retriever
    from keds_tpu.train.losses import TrainBatch
    from keds_tpu.train.trainer import make_optimizer, make_train_step
    import __graft_entry__ as ge

    # Flag-conflict refusals BEFORE the expensive device DB build
    if args.neighbors and args.retrieval != "xla":
        raise SystemExit(
            f"--neighbors bypasses the in-step search, which would silently "
            f"override --retrieval {args.retrieval} — same refusal as the "
            "train CLI")
    if args.neighbors and args.raw:
        raise SystemExit("--neighbors is a features-mode gather (raw "
                         "batches compute features on the fly) — same "
                         "refusal as the train CLI")
    if args.scan and args.raw:
        raise SystemExit("--scan is for sub-RTT feature-mode steps; the raw "
                         "step (~200 ms) chain-measures fine")
    batch = args.batch or 128
    db_rows = args.db_rows or (50_000 if args.quick else 500_000)
    iters = args.iters or (5 if args.quick else 15)
    cfg = mclip.VIT_L_14
    log(f"train bench: batch={batch} db_rows={db_rows} iters={iters}")
    clip_params, heads, db = ge._build(cfg, db_rows=db_rows, dtype=jnp.bfloat16)
    # --retrieval selects the train-step search backend exactly as the train
    # CLI's --retrieval-backend does (load_database); approx trades the
    # exact neighbor scan for the hardware ANN (accuracy tables in
    # BENCH_NOTES round-3) inside the step.
    retriever = Retriever(db, backend=args.retrieval)
    ccfg = Config(lr=1e-4, beta1=0.9, beta2=0.98, eps=1e-6, wd=0.1, warmup=10000)
    opt, _ = make_optimizer(ccfg, total_steps=600_000)
    opt_state = opt.init(heads)
    rng = np.random.default_rng(0)
    prompt = np.zeros((1, 77), np.int32)
    prompt[0, :5] = [49406, 320, 1125, 539, 49407]
    db_other = None
    if args.stream == "text":
        if args.raw:
            raise SystemExit("--stream text trains from precomputed features "
                             "(no raw mode; see cli/main.py)")
        # Synthetic "a photo of * * {other}" templates for every DB row —
        # the device-side table the text-stream loss gathers by neighbor
        # index (real runs build it once from cc_other.json).  Realistic
        # {other} length (~8 tokens, a CC3M caption minus its subject) ->
        # eot at 14 -> the S=16 causal-prefix bucket (make_train_step trims
        # the table; BENCH_NOTES round-4).
        oth = np.zeros((db_rows, 77), np.int32)
        oth[:, 0] = 49406
        oth[:, 1:4] = [320, 1125, 539]
        oth[:, 4:6] = 265                      # "* *"
        oth[:, 6:14] = rng.integers(1000, 40000, (db_rows, 8))
        oth[:, 14] = 49407
        db_other = jnp.asarray(oth)
    step = make_train_step(
        clip_params, cfg, retriever, opt, stream=args.stream,
        prompt_tokens=prompt, split_id=265, db_topk=16,
        db_other_tokens=db_other, compute_dtype=jnp.bfloat16,
    )
    if args.raw:
        from keds_tpu.train.losses import RawBatch

        from keds_tpu.tokenizer import bucket_text

        # Realistic caption (EOT at 14, like the text-stream bench) bucketed
        # at the feed like the train CLI does (S=16; encode_text pools at
        # EOT -> exact by causality).
        text = np.zeros((batch, 77), np.int32)
        text[:, :6] = [49406, 320, 1125, 539, 265, 267]
        text[:, 6:14] = rng.integers(1000, 40000, (batch, 8))
        text[:, 14] = 49407
        batch_data = RawBatch(
            images=jnp.asarray(
                rng.integers(0, 256, (batch, cfg.image_resolution,
                                      cfg.image_resolution, 3)), jnp.uint8),
            caption_tokens=jnp.asarray(bucket_text(text, n_pseudo=1)),
            other_tokens=jnp.zeros((batch, 77), jnp.int32),
        )
    else:
        if args.stream == "text":
            # Realistic OWN templates, bucketed like the train CLI feed
            # (cli/main batches(): per-batch causal-prefix bucket).
            from keds_tpu.tokenizer import bucket_text

            own = np.zeros((batch, 77), np.int32)
            own[:, 0] = 49406
            own[:, 1:4] = [320, 1125, 539]
            own[:, 4:7] = 265                  # "* * *" (dataset template)
            own[:, 7:14] = rng.integers(1000, 40000, (batch, 7))
            own[:, 14] = 49407
            own_tokens = jnp.asarray(bucket_text(own, n_pseudo=1))
        else:
            own_tokens = jnp.zeros((batch, 77), jnp.int32)
        nb = {}
        if args.neighbors:
            # Precomputed-neighbor mode (tools/precompute_neighbors.py): the
            # step gathers DB rows by index instead of searching.  Random
            # valid indices give the identical gather/compute shape.
            nb = dict(
                img_idx=jnp.asarray(rng.integers(0, db_rows, (batch, 16)), jnp.int32),
                txt_idx=jnp.asarray(rng.integers(0, db_rows, (batch, 16)), jnp.int32),
                cap2_idx=jnp.asarray(rng.integers(0, db_rows, (batch, 2)), jnp.int32),
            )
        batch_data = TrainBatch(
            image_features=jnp.asarray(rng.standard_normal((batch, cfg.embed_dim)), jnp.float32),
            caption_features=jnp.asarray(rng.standard_normal((batch, cfg.embed_dim)), jnp.float32),
            other_tokens=own_tokens,
            **nb,
        )

    def chain_step(state):
        heads_, opt_state_, i = state
        h, o, _ = step(heads_, opt_state_, batch_data, jax.random.key(0))
        return (h, o, i)

    t = timeit_chain(chain_step, (heads, opt_state, jnp.zeros(())), iters)
    sps = batch / t
    if args.neighbors or args.scan:
        # Sub-RTT steps (neighbors ~8 ms, approx ~10 ms) chain-measure the
        # host dispatch-rate floor, not the device (bimodal 9-17 ms
        # observed).  Same fix as --stages: scan 8 steps inside ONE program
        # (params chained through the scan) and divide — the device rate a
        # locally-attached host would sustain.
        raw, bound = step.raw_step, step.bound_args
        # Scan over 8 DIFFERENT batches: with a constant batch the whole
        # retrieval/gather is loop-invariant and XLA hoists it out of the
        # scan, silently amortizing it across the 8 steps (measured: the
        # SEARCH step reads 8.9 ms with a constant batch vs ~19 ms real).
        batches8 = jax.tree.map(
            lambda a: jnp.stack([jnp.roll(a, i, axis=0) for i in range(8)]),
            batch_data)

        @jax.jit
        def multi8(h, o, bs, *bound_args):
            def body(c, xs):
                b, i = xs
                h_, o_ = c
                # Per-step key fold (the train CLI's fold_in(base, step)):
                # a CONSTANT key would make the dropout-mask bit generation
                # loop-invariant — XLA hoists it out of the scan, amortizing
                # per-step RNG work across the 8 steps (the same trap as the
                # constant batch above, just smaller).
                h2, o2, loss = raw(h_, o_, b,
                                   jax.random.fold_in(jax.random.key(0), i),
                                   *bound_args)
                return (h2, o2), loss

            (hf, of), losses = jax.lax.scan(body, (h, o),
                                            (bs, jnp.arange(8)))
            return hf, of, losses[-1]

        def chain8(state):
            h, o, i = state
            hf, of, _ = multi8(h, o, batches8, *bound)
            return (hf, of, i)

        t8 = timeit_chain(chain8, (heads, opt_state, jnp.zeros(())),
                          max(iters // 4, 3)) / 8.0
        log(f"train step (in-jit x8 scan): "
            f"{t8*1e3:.2f} ms -> {batch/t8:.0f} samples/s/chip "
            f"(per-dispatch chained: {t*1e3:.2f} ms — dispatch-floor-bound "
            f"through this tunnel)")
        t, sps = t8, batch / t8
    tag = " (raw images)" if args.raw else (
        " (text stream)" if args.stream == "text" else "")
    if args.neighbors:
        tag += " (precomputed neighbors)"
    if args.scan and not args.neighbors:
        tag += " (in-jit scan)"
    log(f"train step{tag}: {t*1e3:.2f} ms -> {sps:.0f} samples/s/chip")
    # Analytic A100 baselines (fixed across rounds): features mode ~2000/s
    # (faiss round-trip + heads fwd/bwd + text tower); raw mode adds the
    # frozen ViT-L encode — fp16 encode ~166 ms/b128 at 40% MFU + faiss
    # 10 ms + step ~64 ms + host glue ~20 ms -> ~260 ms -> ~490/s.
    # Text stream, derived from the SAME per-component numbers as the
    # image-stream estimate (text tower fwd/bwd ~37 ms/b128 fp16): image
    # step 64 ms + two extra tower passes 74 ms + top-2 faiss search ~5 ms
    # + per-step HOST tokenization of 2x128 neighbor templates
    # (src/trainer.py:321-326, ~15 ms) -> ~158 ms/b128 -> ~810/s.
    base = 490.0 if args.raw else (810.0 if args.stream == "text" else 2000.0)
    metric = ("raw_" if args.raw else "") + (
        "text_stream_" if args.stream == "text" else ""
    ) + ("neighbors_" if args.neighbors else "") + \
        "train_samples_per_sec_per_chip"
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 2),
        "unit": "sample/s",
        # Self-describing methodology (advisor round-4): x8-scan numbers are
        # the in-jit device rate, chained ones include the per-dispatch
        # tunnel gap — ~2x apart for sub-RTT steps, so JSON consumers must
        # be able to tell them apart without the human-readable log.
        "method": "x8-scan" if (args.neighbors or args.scan) else "chained",
        "vs_baseline": round(sps / base, 3),
    }))


if __name__ == "__main__":
    main()
