"""Batch serving CLI — rank a corpus for a file of composed queries.

The reference has no serving entry point beyond the single-query demo
(``src/demo.py``); this CLI exposes :class:`keds_tpu.engine.
ComposedQueryEngine` (the bench headline pipeline: two programs per
macro batch, chunked encode, optional int8 towers / approx-ANN retrieval /
mesh sharding) as a production batch server:

    python -m keds_tpu.cli.serve \
        --resume <ckpt.pt> --database-path <db> \
        --target-data <corpus image dir> \
        --query_file queries.jsonl --demo-out results.jsonl

``queries.jsonl``: one ``{"image": <path>, "text": "<prompt with *>"}`` per
line.  Output: one ``{"query", "text", "results": [{"name", "score"}, ...]}``
per line, plus a throughput summary on stderr.

``--batch-size`` keeps the reference flag's default (64); throughput peaks
at the bench headline's macro batch, ``--batch-size 256`` (the 64/128/256/
512 sweep is in BENCH_NOTES round-4 "cont. 2").
"""

from __future__ import annotations

import json
import logging
import os
import time

# Corpora at or above this many rows rank on device (only (B, topn) crosses
# the wire); smaller ones keep the host matmul, where the extra program
# dispatch would cost more than the host GEMM it replaces.  Paths are
# equality-tested (tests/test_engine.py::test_device_corpus_search_matches_host).
DEVICE_RANK_MIN_ROWS = 4096


class _QueryDataset:
    """queries.jsonl rows -> (transformed image, tokenized prompt).  A real
    dataset so query decode rides the shared DataLoader pools (threads or
    spawned processes — the reference's worker decode, src/data.py:839-863)."""

    def __init__(self, queries, transform):
        self.queries = queries
        self.transform = transform

    def __len__(self):
        return len(self.queries)

    def __getitem__(self, i):
        import numpy as np
        from PIL import Image

        from keds_tpu.tokenizer import tokenize

        q = self.queries[i]
        img = self.transform(Image.open(q["image"]))
        text = np.asarray(tokenize(str(q.get("text", "a photo of *"))))[0]
        return img, text


def main(argv=None) -> None:
    import jax.numpy as jnp
    import numpy as np

    from keds_tpu.cli.common import (
        compute_dtype,
        load_database,
        setup_experiment,
        setup_runtime,
    )
    from keds_tpu.config import parse_args
    from keds_tpu.data.datasets import CustomFolder
    from keds_tpu.data.loader import DataLoader
    from keds_tpu.engine import ComposedQueryEngine
    from keds_tpu.io.checkpoint import load_heads_checkpoint
    from keds_tpu.models.loader import load_clip
    cfg = parse_args(argv)
    cfg = setup_experiment(cfg, require_fresh=False)
    mesh = setup_runtime(cfg)
    if not cfg.resume:
        raise SystemExit("--resume <checkpoint.pt> is required (heads + CLIP)")
    if not cfg.target_data:
        raise SystemExit("--target-data <corpus image dir> is required")
    if not cfg.query_file:
        raise SystemExit("--query_file <queries.jsonl> is required")

    # Orbax checkpoints (directories) carry the heads only — CLIP must then
    # come from --clip-weights / --model.
    clip_source = cfg.resume
    if os.path.isdir(cfg.resume):
        clip_source = cfg.clip_weights or cfg.model
        if not cfg.clip_weights:
            # The heads were trained against SOME frozen CLIP; pairing them
            # with a different tower produces garbage rankings with exit 0.
            logging.warning(
                "orbax --resume carries heads only and no --clip-weights was "
                "given: using CLIP from --model %r — make sure it is the "
                "tower the heads were trained against", cfg.model)
    clip_params, clip_cfg, _, t_val = load_clip(
        clip_source, target_pad=1.25 if cfg.target_pad else None,
        normalize_on_host=not cfg.device_preprocess,
    )
    heads, _ = load_heads_checkpoint(cfg.resume)
    retriever = load_database(cfg, mesh)
    engine = ComposedQueryEngine(
        clip_params, clip_cfg, heads, retriever.db,
        retriever=retriever, db_topk=cfg.db_topk,
        compute_dtype=compute_dtype(cfg),
        quant_towers=cfg.quant_towers,
        mesh=mesh if mesh.devices.size > 1 else None,
    )

    from keds_tpu.cli.common import pad_batch as _pad

    # ---- corpus (streamed: one batch in flight, never materialized) -------
    corpus_ds = CustomFolder(cfg.target_data, transform=t_val)
    loader = DataLoader(corpus_ds, cfg.batch_size, num_workers=cfg.workers,
                        worker_processes=cfg.worker_processes)
    t0 = time.time()
    names: list = []

    def corpus_batches():
        for images, paths in loader:
            names.extend(os.path.basename(p) for p in paths)
            yield _pad(np.asarray(images), cfg.batch_size)

    try:
        corpus = engine.encode_corpus(corpus_batches())
    finally:
        loader.close()  # release the (possibly process-) decode pool even
        # on error; it would otherwise contend with the query loader (or a
        # retrying wrapper) for the host core
    # only the final loader batch can be short, so padding rows are all at
    # the tail — trim them
    corpus = corpus[: len(names)]
    logging.info("corpus: %d images encoded in %.1fs", len(names), time.time() - t0)

    # ---- ranking placement (see DEVICE_RANK_MIN_ROWS) ----------------------
    dev_corpus = (engine.corpus_to_device(corpus)
                  if len(names) >= DEVICE_RANK_MIN_ROWS else None)

    # ---- queries (macro batches; decode overlaps compute via the loader's
    # prefetch, with --workers threads or --worker-processes processes) ------
    with open(cfg.query_file) as f:
        queries = [json.loads(line) for line in f if line.strip()]
    out_path = cfg.demo_out if cfg.demo_out.endswith(".jsonl") else (
        cfg.demo_out + ".jsonl")
    macro = cfg.batch_size
    chunks = [queries[lo:lo + macro] for lo in range(0, len(queries), macro)]
    q_loader = DataLoader(_QueryDataset(queries, t_val), macro,
                          num_workers=cfg.workers,
                          worker_processes=cfg.worker_processes)

    topn = min(cfg.topn, len(names))
    t0 = time.time()
    n_done = 0
    # Multi-process serving: every process feeds the same global batches
    # (the engine's global-feed contract) and computes identical results;
    # only the primary writes them so ranks sharing a filesystem don't
    # clobber one file.
    import jax

    primary = jax.process_index() == 0
    write_path = out_path if primary else os.devnull
    with open(write_path, "w") as out:
        for chunk, (imgs, text) in zip(chunks, q_loader):
            imgs = _pad(np.asarray(imgs), macro)
            text = _pad(np.asarray(text), macro)
            # engine.search owns BOTH ranking branches (device rank for a
            # DeviceCorpus, host matmul+stable argsort otherwise) and is
            # equality-tested across them — don't re-implement it here.
            scores, idx = engine.search(
                [imgs], [text], dev_corpus if dev_corpus is not None else corpus,
                topn)
            scores, idx = scores[: len(chunk)], idx[: len(chunk)]
            for qi, q in enumerate(chunk):
                out.write(json.dumps({
                    "query": q["image"],
                    "text": q.get("text", "a photo of *"),
                    "results": [
                        {"name": names[j], "score": float(scores[qi][r])}
                        for r, j in enumerate(idx[qi])
                    ],
                }) + "\n")
            out.flush()  # results stream as chunks complete
            n_done += len(chunk)
    q_loader.close()
    dt = time.time() - t0
    logging.info("served %d composed queries in %.2fs (%.1f q/s incl. decode)",
                 n_done, dt, n_done / max(dt, 1e-9))
    if primary:
        print(out_path)


if __name__ == "__main__":
    main()
