"""Offline neighbor precomputation for features-mode training.

In the reference recipe the training "features" ARE the frozen CLIP
embeddings loaded from disk (``image_features = images``,
``src/trainer.py:48-50``), and the knowledge DB is frozen too — so the
top-16 bi-modality neighbors (``src/trainer.py:198-259``) and the top-2
caption neighbors of the text stream (``:262-283``) are a pure function of
the sample, constant across every step and epoch.  The reference still runs
a faiss scan per step because torch+faiss makes hoisting awkward; here the
whole search moves offline into this tool and the train step becomes a
device gather — removing the ~47% of the exact image-stream step that was
retrieval (BENCH_NOTES round-4 step accounting), with BIT-identical
training semantics (same neighbor sets from the same exact search; the
per-step image-neighbor shuffle stays in-step with the same PRNG stream).

    python -m keds_tpu.tools.precompute_neighbors \
        --train-data /data/cc3m_features --database-path /data/db \
        --out /data/cc3m_features/neighbors.npz

Consume with ``cli/main.py --neighbors <path|auto>``.  The pack is
fingerprinted against BOTH the knowledge DB (row identity/content) and the
feature set (length + names) and refused loudly on mismatch — the same
staleness discipline as the text-stream template cache.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import logging
import os

import numpy as np

META_KEY = "meta_json"


def dataset_fingerprint(names) -> dict:
    return {
        "dataset_len": len(names),
        "dataset_names_sha1": hashlib.sha1(
            "\n".join(names).encode()).hexdigest(),
    }


def load_neighbors(path: str):
    """Load a neighbor pack -> (img_idx, txt_idx, cap2_idx, meta dict)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z[META_KEY]).decode())
        return z["img_idx"], z["txt_idx"], z["cap2_idx"], meta


def main(argv=None) -> None:
    from keds_tpu.logging_utils import setup_logging

    p = argparse.ArgumentParser()
    p.add_argument("--train-data", required=True,
                   help="feature dir (packed image_features.npy/... or the "
                        "reference per-file layout)")
    p.add_argument("--database-path", required=True)
    p.add_argument("--out", default=None,
                   help="output .npz (default <train-data>/neighbors.npz)")
    p.add_argument("--db-topk", type=int, default=16)
    p.add_argument("--batch", type=int, default=1024,
                   help="queries per device search")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"],
                   help="DB/search dtype — MUST match the --precision you "
                        "train with (the in-step search scores in the DB "
                        "dtype, and near-tie rankings depend on it); "
                        "checked at train time via the pack fingerprint")
    args = p.parse_args(argv)
    setup_logging()

    import jax
    import jax.numpy as jnp

    from keds_tpu.data.datasets import FeaturePairDataset
    from keds_tpu.ops.topk import mips_topk
    from keds_tpu.retrieval.database import KnowledgeDB, db_fingerprint

    ds = FeaturePairDataset(args.train_data)

    class _Shim:  # the config resolver handles every DB artifact layout
        database_path = args.database_path
        db_image_file = db_text_file = db_names_file = None

    dtype = jnp.float32 if args.precision == "fp32" else jnp.bfloat16
    db = KnowledgeDB.from_config(_Shim(), dtype=dtype)
    k = args.db_topk

    @jax.jit
    def search(img_f, txt_f, db_img, db_txt):
        # Mirrors the in-step query math OP FOR OP — bit-identical indices
        # require it.  retrieve_features: normalize once, cast, search.
        q = img_f / jnp.linalg.norm(img_f, axis=1, keepdims=True)
        q = q.astype(db_img.dtype)
        _, ii = mips_topk(q, db_img, k)
        _, ti = mips_topk(q, db_txt, k)
        # Caption query: the trainer normalizes (trainer.py caps_n) and
        # retrieve_caption_neighbors normalizes AGAIN — mathematically a
        # no-op, but the second f32 rounding moves ~1/3 of the elements by
        # one ulp, which can flip near-tie top-2 picks.  Reproduce both.
        qc = txt_f / jnp.linalg.norm(txt_f, axis=-1, keepdims=True)
        qc = qc / jnp.linalg.norm(qc, axis=1, keepdims=True)
        qc = qc.astype(db_txt.dtype)
        _, ci = mips_topk(qc, db_txt, 2)
        return ii, ti, ci

    n = len(ds)
    img_idx = np.empty((n, k), np.int32)
    txt_idx = np.empty((n, k), np.int32)
    cap2_idx = np.empty((n, 2), np.int32)
    if ds.mode == "packed":
        feats = lambda lo, hi: (np.asarray(ds.image_feats[lo:hi], np.float32),
                                np.asarray(ds.text_feats[lo:hi], np.float32))
    else:
        from keds_tpu.io import load_pt

        def feats(lo, hi):
            # read the raw .pt pairs directly — ds[i] would also tokenize
            # the caption template per sample (hours of wasted host work at
            # CC3M scale for data this tool never uses)
            img = [np.asarray(load_pt(os.path.join(ds.image_dir, ds.files[i])),
                              np.float32).reshape(-1) for i in range(lo, hi)]
            txt = [np.asarray(load_pt(os.path.join(ds.text_dir, ds.files[i])),
                              np.float32).reshape(-1) for i in range(lo, hi)]
            return np.stack(img), np.stack(txt)

    for lo in range(0, n, args.batch):
        hi = min(lo + args.batch, n)
        fi, ft = feats(lo, hi)
        ii, ti, ci = search(jnp.asarray(fi), jnp.asarray(ft),
                            db.image_db, db.text_db)
        img_idx[lo:hi] = np.asarray(ii)
        txt_idx[lo:hi] = np.asarray(ti)
        cap2_idx[lo:hi] = np.asarray(ci)
        if (lo // args.batch) % 50 == 0:
            logging.info("neighbors: %d / %d samples", hi, n)

    # backend: bf16 dot products round differently across platforms (MXU vs
    # CPU), so a pack built elsewhere could pass the DB/dataset fingerprint
    # while its near-tie rankings differ from the in-step search — record
    # where the search ran and refuse cross-platform packs at train time.
    meta = dict(db_fingerprint(db), k=k, precision=args.precision,
                backend=jax.default_backend(),
                **dataset_fingerprint(ds.names))
    out = args.out or os.path.join(args.train_data, "neighbors.npz")
    tmp = out + ".tmp.npz"
    np.savez(tmp, img_idx=img_idx, txt_idx=txt_idx, cap2_idx=cap2_idx,
             **{META_KEY: np.frombuffer(json.dumps(meta).encode(), np.uint8)})
    os.replace(tmp, out)  # atomic: a crash never leaves a half-written pack
    logging.info("wrote %s: img/txt top-%d + caption top-2 for %d samples "
                 "(%s)", out, k, n, meta)


if __name__ == "__main__":
    main()
