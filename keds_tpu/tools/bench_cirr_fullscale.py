"""Config-3 (dual-stream CIRR eval) at TRUE reference scale, through the
real eval CLI (round-4 VERDICT weak #3 / next-round item 4).

The real CIRR val protocol (reference ``src/eval_utils.py:578-740`` +
``src/data.py:233-333``) is ~4181 composed queries over a ~2297-image target
corpus, retrieval against the 0.5M-row CC3M knowledge DB, and a
30-checkpoint x 2-branch sweep.  The repo's eval-speed claim — the
head-independent query cache makes sweeps cheap — had only been measured at
512-corpus/100k-DB scale; this tool builds a synthetic tree at the real
protocol size and drives ``keds_tpu.cli.eval_retrieval`` end-to-end on it,
reporting total wall + the per-phase walls logged by ``evaluate_cirr``.

Synthetic-vs-real deviations (documented, none change the measured path):

* Images are random-noise PNGs at ``--image-px`` (default 224).  Decode cost
  scales with pixel count, not content; real NLVR2 photos are a similar
  size.  The loader, transform and device path are the real ones.
* Branch checkpoints are HEADS-ONLY files (epoch/name + the three head
  state_dicts) read through the real ``load_heads_checkpoint``.  The
  reference's own training emits full ~1.7 GB files (CLIP weights embedded,
  src/main.py:330-341); at 10 MB/s host disk, 60 of those cannot be staged
  here.  The extra cost of full-format sweeps is quantified separately: the
  (full, reference-format) resume checkpoint is load-timed once and reported
  as ``full_ckpt_probe_s`` — per-epoch full-file sweeps add ~2x that each.
* Model weights are random-init (no real artifacts in this environment —
  BENCH_NOTES); wall clocks do not depend on weight values.

Usage (real chip, ~cold first run pays remote compiles for the tail-batch
shapes; re-run warm for the honest number):

    python -m keds_tpu.tools.bench_cirr_fullscale            # build + run
    python -m keds_tpu.tools.bench_cirr_fullscale --epochs 2 # short sweep

Prints ONE JSON line on stdout with the wall-clock accounting.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_CHILD_ENV = "_KEDS_CIRR_FULLSCALE_BUILD_CHILD"

# ~8-14 word relative captions (typical CIRR length -> the S=32 compose
# bucket); ~3% of queries get a long caption so the sweep also exercises the
# mixed-bucket path (a batch's bucket is its max caption need).
_WORDS = ("remove change swap the a one two red blue green small large dog "
          "cat bird table chair plate glass window tree person car sign wall "
          "light left right background holding standing sitting near behind "
          "with without into onto under over against beside").split()


def _fingerprint(args) -> dict:
    return {
        "queries": args.queries, "corpus": args.corpus,
        "db_rows": args.db_rows, "epochs": args.epochs,
        "image_px": args.image_px, "model_scale": args.model_scale,
        "version": 2,
    }


def _clip_cfg(args):
    from keds_tpu.models import clip as mclip

    if args.model_scale == "vitl":
        return mclip.VIT_L_14
    return mclip.ClipConfig(
        embed_dim=64, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, transformer_width=64, transformer_heads=1,
        transformer_layers=2,
    )


def build_artifacts(args) -> None:
    """Runs in a JAX_PLATFORMS=cpu child: stage the synthetic tree, the DB
    files and the checkpoint sweep under ``--workdir``."""
    import numpy as np

    import jax

    from keds_tpu.io.checkpoint import save_train_checkpoint
    from keds_tpu.io.pt import save_pt
    from keds_tpu.models import clip as mclip, convert, heads as mheads
    from keds_tpu.models.composition import FusionHeads

    from PIL import Image

    wd = args.workdir
    fp_path = os.path.join(wd, "fingerprint.json")
    want = _fingerprint(args)
    if os.path.exists(fp_path):
        with open(fp_path) as f:
            if json.load(f) == want and os.path.exists(
                    os.path.join(wd, "resume.pt")):
                print(f"bench_cirr_fullscale: artifacts up to date in {wd}",
                      file=sys.stderr)
                return
    os.makedirs(wd, exist_ok=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()

    # --- CIRR tree ---------------------------------------------------------
    base = os.path.join(wd, "data", "CIRR")
    dev = os.path.join(base, "dev")
    os.makedirs(dev, exist_ok=True)
    os.makedirs(os.path.join(base, "captions"), exist_ok=True)
    os.makedirs(os.path.join(base, "image_splits"), exist_ok=True)
    names = [f"img{i:05d}" for i in range(args.corpus)]
    px = args.image_px
    for n in names:
        arr = rng.integers(0, 255, (px, px, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(dev, f"{n}.png"))
    caps = []
    for q in range(args.queries):
        r = int(rng.integers(0, args.corpus))
        t = int(rng.integers(0, args.corpus - 1))
        if t >= r:
            t += 1  # target != reference (the metric masks the reference)
        n_words = 30 if rng.random() < 0.03 else int(rng.integers(8, 15))
        cap = " ".join(rng.choice(_WORDS, n_words))
        caps.append({"reference": names[r], "target_hard": names[t],
                     "caption": cap})
    with open(os.path.join(base, "captions", "cap.rc2.val.json"), "w") as f:
        json.dump(caps, f)
    with open(os.path.join(base, "image_splits", "split.rc2.val.json"), "w") as f:
        json.dump({n: f"dev/{n}.png" for n in names}, f)
    print(f"  tree: {args.corpus} imgs / {args.queries} queries "
          f"({time.perf_counter()-t0:.1f} s)", file=sys.stderr)

    # --- knowledge DB (reference file layout) ------------------------------
    t1 = time.perf_counter()
    d_emb = _clip_cfg(args).embed_dim
    db_dir = os.path.join(wd, "db")
    os.makedirs(db_dir, exist_ok=True)
    for fname, seed in (("cc_image_databases.pt", 1), ("cc_text_databases.pt", 2)):
        r = np.random.default_rng(seed)
        a = r.standard_normal((args.db_rows, d_emb), dtype=np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        save_pt(a, os.path.join(db_dir, fname))
        del a
    with open(os.path.join(db_dir, "database_names.txt"), "w") as f:
        f.write("\n".join(f"cc3m_{i}" for i in range(args.db_rows)))
    print(f"  db: 2 x {args.db_rows} x {d_emb} f32 "
          f"({time.perf_counter()-t1:.1f} s)", file=sys.stderr)

    # --- checkpoints -------------------------------------------------------
    t2 = time.perf_counter()
    cfg = _clip_cfg(args)
    d = cfg.embed_dim
    clip_params = mclip.init_clip(jax.random.key(0), cfg)

    def mk_heads(seed):
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        return FusionHeads(
            img2text=mheads.init_im2text(k1, d, 512 if d >= 512 else d, d),
            retrieval_fuse=mheads.init_crossformer(k2, d, d, d, num_layers=3),
            text_condition=mheads.init_crossformer(k3, d, d, d, num_layers=3),
        )

    # The resume checkpoint is FULL reference format (CLIP embedded) — the
    # eval CLI reads CLIP weights from it, and it doubles as the
    # full-checkpoint IO probe.
    save_train_checkpoint(os.path.join(wd, "resume.pt"), epoch=30, name="fs",
                          clip_params=clip_params, clip_cfg=cfg,
                          heads=mk_heads(10))
    to_np = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
    head_sds = []
    for seed in (11, 12):
        h = mk_heads(seed)
        head_sds.append({
            "state_dict_img2text":
                convert.im2text_pytree_to_state_dict(to_np(h.img2text)),
            "state_dict_retrieval_fuse":
                convert.crossformer_pytree_to_state_dict(to_np(h.retrieval_fuse)),
            "state_dict_text_condition":
                convert.crossformer_pytree_to_state_dict(to_np(h.text_condition)),
        })
    for branch in ("image_branch", "text_branch"):
        bdir = os.path.join(wd, branch)
        os.makedirs(bdir, exist_ok=True)
        for ep in range(1, args.epochs + 1):
            payload = {"epoch": ep, "name": "fs", "optimizer": {},
                       **head_sds[ep % 2]}
            save_pt(payload, os.path.join(bdir, f"epoch_{ep}.pt"))
    print(f"  checkpoints: resume (full ViT-L) + 2 x {args.epochs} "
          f"heads-only ({time.perf_counter()-t2:.1f} s)", file=sys.stderr)

    with open(fp_path, "w") as f:
        json.dump(want, f)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir",
                   default=os.path.expanduser("~/.cache/keds_tpu/cirr_fullscale"))
    p.add_argument("--queries", type=int, default=4181)
    p.add_argument("--corpus", type=int, default=2297)
    p.add_argument("--db-rows", type=int, default=500_000)
    p.add_argument("--epochs", type=int, default=30,
                   help="sweep length per branch (reference: 30)")
    p.add_argument("--image-px", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--workers", type=int, default=2,
                   help="loader decode threads (1 host core here; threads "
                        "overlap libpng decode with dispatch waits)")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--no-device-preprocess", dest="device_preprocess",
                   action="store_false",
                   help="ship f32 images instead of the u8 wire format "
                        "(the CLI default is u8 + in-graph normalize; this "
                        "matches and exposes the same switch)")
    p.add_argument("--db-shard", action="store_true")
    p.add_argument("--eval-ranking", default="host", choices=["host", "device"],
                   help="pass-through to the eval CLI: 'device' ranks the "
                        "sweep on the MXU (see --eval-ranking there)")
    p.add_argument("--model-scale", default="vitl", choices=["vitl", "tiny"],
                   help="'tiny' swaps the 2-layer test ClipConfig in for "
                        "plumbing tests; wall numbers are only meaningful "
                        "at 'vitl'")
    p.add_argument("--build-only", action="store_true")
    args = p.parse_args(argv)

    if os.environ.get(_CHILD_ENV) == "1":
        build_artifacts(args)
        return

    # Stage artifacts in a CPU child (same pattern as __graft_entry__
    # .dryrun_multichip): building ViT-L init tensors on the tunneled TPU
    # backend would round-trip ~2 GB for nothing, and env vars cannot
    # force CPU once this process has imported jax.
    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    rc = subprocess.call([sys.executable, os.path.abspath(__file__)]
                         + (argv if argv is not None else sys.argv[1:]),
                         env=env)
    if rc != 0:
        raise SystemExit(f"artifact build child exited rc={rc}")
    if args.build_only:
        return

    # --- full-checkpoint IO probe (see module docstring) -------------------
    from keds_tpu.io.pt import load_pt

    t0 = time.perf_counter()
    ck = load_pt(os.path.join(args.workdir, "resume.pt"))
    full_ckpt_probe_s = time.perf_counter() - t0
    del ck

    import keds_tpu.evalkit.evaluators as ev
    from keds_tpu.cli.eval_retrieval import main as eval_main

    wd = args.workdir
    argv_eval = [
        "--eval-mode", "cirr",
        "--resume", os.path.join(wd, "resume.pt"),
        "--root-data", os.path.join(wd, "data"),
        "--database-path", os.path.join(wd, "db"),
        "--image-branch", os.path.join(wd, "image_branch"),
        "--text-branch", os.path.join(wd, "text_branch"),
        "--batch-size", str(args.batch_size),
        "--workers", str(args.workers),
        "--db-topk", "16",
        "--precision", args.precision,
        "--logs", os.path.join(wd, "logs"),
        "--name", "cirr_fullscale",
        "--eval-ranking", args.eval_ranking,
    ]
    if not args.device_preprocess:
        argv_eval.append("--no-device-preprocess")
    if args.db_shard:
        argv_eval.append("--db-shard")

    orig = ev.evaluate_cirr
    if args.epochs != 30:
        ev.evaluate_cirr = (lambda ctx, s, t, epochs=None:
                            orig(ctx, s, t, epochs=range(1, args.epochs + 1)))
    try:
        t0 = time.perf_counter()
        eval_main(argv_eval)
        total = time.perf_counter() - t0
    finally:
        ev.evaluate_cirr = orig

    walls = dict(ev.last_cirr_walls)
    phases = {k: round(v, 2) for k, v in walls.items() if k != "epochs"}
    setup = total - walls.get("corpus_s", 0) - walls.get("queries_s", 0) \
        - walls.get("sweep_s", 0)
    print(json.dumps({
        "metric": "cirr_fullscale_eval_wall_s",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": None,
        "scale": _fingerprint(args),
        "batch_size": args.batch_size,
        "precision": args.precision,
        "device_preprocess": args.device_preprocess,
        "db_shard": args.db_shard,
        "eval_ranking": args.eval_ranking,
        "setup_s": round(setup, 2),  # CLIP resume load+upload, DB load+upload
        "full_ckpt_probe_s": round(full_ckpt_probe_s, 2),
        **phases,
    }))


if __name__ == "__main__":
    main()
