"""Offline CLIP feature extraction (the reference's ``save_feature`` pass,
``src/trainer.py:511-585`` + ``src/main.py:319-321``, made into a real tool).

Encodes an image folder (or tar shards) and a caption map into packed
features:

    image_features.npy  (N, D) float32/float16
    text_features.npy   (N, D)
    names.json          [basename, ...]

These feed :class:`keds_tpu.data.datasets.FeaturePairDataset` and
``build_database.py``.  Device-side: batched jitted CLIP encodes; host-side:
threaded decode.  DB-encode imgs/sec is a tracked north-star metric
(BASELINE.md).

    python -m keds_tpu.tools.extract_features \
        --images /data/cc3m_images --captions captions.json \
        --clip-weights ViT-L-14.pt --out /data/cc3m_features --batch-size 256
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from keds_tpu.data.datasets import CustomFolder
    from keds_tpu.data.loader import DataLoader
    from keds_tpu.logging_utils import setup_logging
    from keds_tpu.models import clip as mclip
    from keds_tpu.models.loader import load_clip
    from keds_tpu.tokenizer import tokenize

    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True, help="folder of images")
    p.add_argument("--captions", required=True,
                   help="json {basename: caption} (or cc3m_have*.pkl-style list)")
    p.add_argument("--clip-weights", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--dtype", choices=["float32", "float16"], default="float32")
    p.add_argument("--no-device-preprocess", dest="device_preprocess",
                   action="store_false", default=True,
                   help="normalize on host (f32 transfer) instead of shipping "
                        "uint8 and normalizing in-graph")
    args = p.parse_args(argv)
    setup_logging()

    clip_params, cfg, _, t_val = load_clip(
        args.clip_weights, normalize_on_host=not args.device_preprocess)
    from keds_tpu.models.convert import cast_floating

    clip_c = cast_floating(clip_params, jnp.bfloat16)

    if args.captions.endswith(".pkl"):
        import pickle

        with open(args.captions, "rb") as f:
            entries = pickle.load(f)
        cap_map = {e["filename"]: e["text"] for e in entries}
    else:
        with open(args.captions) as f:
            cap_map = json.load(f)

    dataset = CustomFolder(args.images, transform=t_val)
    loader = DataLoader(dataset, args.batch_size, num_workers=args.workers)

    # chunked encode: b32 chunks inside one program — the macro-batch
    # schedule measures 786 img/s (round-3 encode) vs flat batches for
    # ViT-L on v5e (BENCH_NOTES)
    enc_img = jax.jit(
        lambda cp, im: mclip.encode_image_chunked(cp, cfg, im,
                                                  mclip.DEFAULT_ENCODE_CHUNK))
    enc_txt = jax.jit(lambda cp, tt: mclip.encode_text(cp, cfg, tt))

    os.makedirs(args.out, exist_ok=True)
    n = len(dataset)
    out_dtype = np.dtype(args.dtype)
    img_mm = np.lib.format.open_memmap(
        os.path.join(args.out, "image_features.npy"), mode="w+",
        dtype=out_dtype, shape=(n, cfg.embed_dim))
    txt_mm = np.lib.format.open_memmap(
        os.path.join(args.out, "text_features.npy"), mode="w+",
        dtype=out_dtype, shape=(n, cfg.embed_dim))
    names: list = []
    row = 0
    t0 = time.time()

    # Two-deep in-flight window: dispatch batch i+1 before fetching batch
    # i's results, so the per-batch fetch round trip (2 syncs x ~30 ms
    # through a tunneled backend) hides behind device execution — the same
    # pipelined-dispatch discipline as the serving engine.  At CC3M scale
    # the synchronous loop idled the device ~13% per batch.
    import collections

    inflight: collections.deque = collections.deque()

    def drain_one():
        nonlocal row
        img_f, txt_f, r0, b = inflight.popleft()
        img_mm[r0:r0 + b] = np.asarray(img_f.astype(jnp.float32), out_dtype)
        txt_mm[r0:r0 + b] = np.asarray(txt_f.astype(jnp.float32), out_dtype)
        row = r0 + b
        if row % (args.batch_size * 20) == 0:
            rate = row / (time.time() - t0)
            logging.info("encoded %d/%d (%.0f imgs/s)", row, n, rate)

    next_row = 0
    for images, paths in loader:
        basenames = [os.path.basename(p).split(".")[0] for p in paths]
        caps = [str(cap_map.get(b, "")) for b in basenames]
        images = np.asarray(images)
        if images.dtype != np.uint8:  # host-normalized parity path
            images = images.astype(jnp.bfloat16)
        img_f = enc_img(clip_c, jnp.asarray(images))
        txt_f = enc_txt(clip_c, jnp.asarray(tokenize(caps)))
        inflight.append((img_f, txt_f, next_row, len(basenames)))
        names.extend(basenames)
        next_row += len(basenames)
        if len(inflight) >= 2:
            drain_one()
    while inflight:
        drain_one()
    img_mm.flush()
    txt_mm.flush()
    with open(os.path.join(args.out, "names.json"), "w") as f:
        json.dump(names, f)
    logging.info("done: %d pairs -> %s (%.0f imgs/s overall)",
                 row, args.out, row / (time.time() - t0))


if __name__ == "__main__":
    main()
