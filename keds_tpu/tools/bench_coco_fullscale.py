"""COCO composed-region eval at TRUE reference scale, through the real eval
CLI (companion to ``bench_cirr_fullscale`` — same synthetic-at-real-scale
methodology, documented there).

The real COCO protocol (reference ``src/eval_utils.py:451-575`` +
``src/data.py:433-509``) runs the 5000-image val2017 split: every row is both
a composed query (masked-region crop + class prompt) AND a corpus member, so
the score matrix is square (5000 x 5000) and the host ranking path pays SIX
full stable argsorts of 25M floats per sweep epoch (3 feature types x 2
directions) plus 3 full feature fetches.  The device-ranking path
(``--eval-ranking device``) replaces all of that with one jitted program per
epoch — score matmul at Precision.HIGHEST + the diagonal-rank reduction — and
fetches six (5000,) int vectors.  Sweep: j=1..25 over 50 image-branch
checkpoints (eval_utils.py:478-484).

Synthetic-vs-real deviations mirror bench_cirr_fullscale's (random-noise
images at --image-px, heads-only sweep checkpoints, random-init weights);
none change the measured path.

Usage (real chip; re-run warm for the honest number):

    python -m keds_tpu.tools.bench_coco_fullscale                       # host
    python -m keds_tpu.tools.bench_coco_fullscale --eval-ranking device

Prints ONE JSON line on stdout with the wall-clock accounting.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_CHILD_ENV = "_KEDS_COCO_FULLSCALE_BUILD_CHILD"

# COCO class-ish vocabulary for query_class / classes prompts (the prompt
# string length drives the compose bucket, as in the real protocol).
_CLASSES = ("person dog cat car bus train boat bird horse sheep cow bottle "
            "chair couch bed tv laptop phone book clock vase fork knife bowl "
            "banana apple pizza donut cake sink bench kite skis surfboard").split()


def _fingerprint(args) -> dict:
    return {
        "rows": args.rows, "db_rows": args.db_rows, "epochs": args.epochs,
        "image_px": args.image_px, "model_scale": args.model_scale,
        "version": 1,
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
    """Runs in a JAX_PLATFORMS=cpu child: stage the synthetic COCO tree, the
    DB files and the image-branch checkpoint sweep under ``--workdir``."""
    import csv

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
                print(f"bench_coco_fullscale: artifacts up to date in {wd}",
                      file=sys.stderr)
                return
    os.makedirs(wd, exist_ok=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()

    # --- COCO tree ----------------------------------------------------------
    base = os.path.join(wd, "data", "coco")
    val = os.path.join(base, "val2017")
    masked = os.path.join(base, "val2017_masked")
    os.makedirs(val, exist_ok=True)
    os.makedirs(masked, exist_ok=True)
    px = args.image_px
    rows = []
    for i in range(args.rows):
        name = f"{i:012d}.jpg"
        # Noise JPEGs: same decode family as the real split (val2017 is JPEG)
        Image.fromarray(rng.integers(0, 255, (px, px, 3), dtype=np.uint8)
                        ).save(os.path.join(val, name), quality=90)
        Image.fromarray(rng.integers(0, 255, (px, px, 3), dtype=np.uint8)
                        ).save(os.path.join(masked, name), quality=90)
        x1 = int(rng.integers(0, px // 2))
        y1 = int(rng.integers(0, px // 2))
        w = int(rng.integers(px // 8, px // 2))
        h = int(rng.integers(px // 8, px // 2))
        n_others = int(rng.integers(1, 4))
        rows.append({
            "id": name,
            "query_regions": f"{x1};{y1};{min(px, x1 + w)};{min(px, y1 + h)}",
            "query_class": str(rng.choice(_CLASSES)),
            "classes": ";".join(rng.choice(_CLASSES, n_others)),
        })
    with open(os.path.join(base, "coco_eval.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"  tree: {args.rows} rows x 2 imgs ({time.perf_counter()-t0:.1f} s)",
          file=sys.stderr)

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

    # --- checkpoints: 2*epochs heads-only files in the IMAGE branch --------
    # (evaluate_coco loads both sweep members from the image branch,
    # eval_utils.py:478-484; the text branch arg is unused there)
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

    save_train_checkpoint(os.path.join(wd, "resume.pt"), epoch=50, name="fs",
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
    bdir = os.path.join(wd, "image_branch")
    os.makedirs(bdir, exist_ok=True)
    for ep in range(1, 2 * args.epochs + 1):
        payload = {"epoch": ep, "name": "fs", "optimizer": {},
                   **head_sds[ep % 2]}
        save_pt(payload, os.path.join(bdir, f"epoch_{ep}.pt"))
    print(f"  checkpoints: resume (full) + {2 * args.epochs} heads-only "
          f"({time.perf_counter()-t2:.1f} s)", file=sys.stderr)

    with open(fp_path, "w") as f:
        json.dump(want, f)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir",
                   default=os.path.expanduser("~/.cache/keds_tpu/coco_fullscale"))
    p.add_argument("--rows", type=int, default=5000,
                   help="val2017 split size (reference: 5000)")
    p.add_argument("--db-rows", type=int, default=500_000)
    p.add_argument("--epochs", type=int, default=25,
                   help="sweep length (reference: 25, over 50 checkpoints)")
    p.add_argument("--image-px", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--eval-ranking", default="host", choices=["host", "device"])
    p.add_argument("--model-scale", default="vitl", choices=["vitl", "tiny"],
                   help="'tiny' for plumbing tests; walls only meaningful "
                        "at 'vitl'")
    p.add_argument("--build-only", action="store_true")
    args = p.parse_args(argv)

    if os.environ.get(_CHILD_ENV) == "1":
        build_artifacts(args)
        return

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

    import keds_tpu.evalkit.evaluators as ev
    from keds_tpu.cli.eval_retrieval import main as eval_main

    wd = args.workdir
    argv_eval = [
        "--eval-mode", "coco",
        "--resume", os.path.join(wd, "resume.pt"),
        "--root-data", os.path.join(wd, "data"),
        "--database-path", os.path.join(wd, "db"),
        "--image-branch", os.path.join(wd, "image_branch"),
        "--text-branch", os.path.join(wd, "image_branch"),  # unused by COCO
        "--batch-size", str(args.batch_size),
        "--workers", str(args.workers),
        "--db-topk", "16",
        "--precision", args.precision,
        "--logs", os.path.join(wd, "logs"),
        "--name", "coco_fullscale",
        "--eval-ranking", args.eval_ranking,
    ]

    orig = ev.evaluate_coco
    if args.epochs != 25:
        ev.evaluate_coco = (lambda ctx, loader, epochs=None:
                            orig(ctx, loader, epochs=range(1, args.epochs + 1)))
    try:
        t0 = time.perf_counter()
        eval_main(argv_eval)
        total = time.perf_counter() - t0
    finally:
        ev.evaluate_coco = orig

    walls = dict(ev.last_coco_walls)
    phases = {k: round(v, 2) for k, v in walls.items() if k != "epochs"}
    setup = total - walls.get("corpus_s", 0) - walls.get("queries_s", 0) \
        - walls.get("sweep_s", 0)
    print(json.dumps({
        "metric": "coco_fullscale_eval_wall_s",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": None,
        "scale": _fingerprint(args),
        "batch_size": args.batch_size,
        "precision": args.precision,
        "eval_ranking": args.eval_ranking,
        "setup_s": round(setup, 2),
        **phases,
    }))


if __name__ == "__main__":
    main()
