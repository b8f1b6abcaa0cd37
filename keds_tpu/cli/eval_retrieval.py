"""Benchmark evaluation CLI (reference ``src/eval_retrieval.py``).

    python -m keds_tpu.cli.eval_retrieval --eval-mode cirr \
        --resume /path/to/epoch_k.pt --root-data /path/to/comp_data \
        --database-path /path/to/db \
        --image-branch ./image_branch/checkpoints \
        --text-branch ./text_branch/checkpoints
"""

from __future__ import annotations

import json
import logging
import os


def main(argv=None) -> None:
    from keds_tpu.cli.common import (
        compute_dtype,
        load_database,
        setup_experiment,
        setup_runtime,
    )
    from keds_tpu.config import parse_args
    from keds_tpu.data.datasets import CIRR, CsvCOCO, FashionIQ, ImageList
    from keds_tpu.data.loader import DataLoader
    from keds_tpu.evalkit.evaluators import (
        EvalContext,
        evaluate_cirr,
        evaluate_cirr_test,
        evaluate_coco,
        evaluate_fashion,
        evaluate_imgnet_retrieval,
    )
    from keds_tpu.models.loader import load_clip
    from keds_tpu.transforms import region_transform

    cfg = parse_args(argv)
    cfg = setup_experiment(cfg, require_fresh=False)
    mesh = setup_runtime(cfg)

    clip_source = cfg.resume or cfg.clip_weights or cfg.model
    clip_params, clip_cfg, _, t_val = load_clip(
        clip_source, target_pad=1.25 if cfg.target_pad else None,
        normalize_on_host=not cfg.device_preprocess,
    )
    retriever = load_database(cfg, mesh)
    ctx = EvalContext(
        clip_params=clip_params, cfg=clip_cfg, retriever=retriever,
        image_branch=cfg.image_branch, text_branch=cfg.text_branch,
        batch_size=cfg.batch_size, db_topk=cfg.db_topk,
        compute_dtype=compute_dtype(cfg),
        mesh=mesh if mesh.devices.size > 1 else None,
        quant_towers=cfg.quant_towers,
        eval_ranking=cfg.eval_ranking,
    )
    root = cfg.root_data
    mk_loader = lambda ds: DataLoader(ds, cfg.batch_size, num_workers=cfg.workers,
                                      worker_processes=cfg.worker_processes)  # noqa: E731

    if cfg.eval_mode == "cirr":
        src = CIRR(transforms=t_val, root=root)
        tgt = CIRR(transforms=t_val, root=root, mode="imgs")
        evaluate_cirr(ctx, mk_loader(src), mk_loader(tgt))
    elif cfg.eval_mode == "cirr_test":
        src = CIRR(transforms=t_val, root=root, test=True)
        tgt = CIRR(transforms=t_val, root=root, mode="imgs", test=True)
        results = evaluate_cirr_test(ctx, mk_loader(src), mk_loader(tgt))
        os.makedirs("res_cirr", exist_ok=True)
        for key, value in results.items():
            with open(os.path.join("res_cirr", key + ".json"), "w") as f:
                json.dump(value, f)
        logging.info("wrote res_cirr/{composed,image,text,mixture}.json")
    elif cfg.eval_mode == "fashion":
        assert cfg.source_data in ("dress", "shirt", "toptee")
        src = FashionIQ(cloth=cfg.source_data, transforms=t_val, root=root,
                        is_return_target_path=True)
        tgt = FashionIQ(cloth=cfg.source_data, transforms=t_val, root=root,
                        mode="imgs")
        evaluate_fashion(ctx, mk_loader(src), mk_loader(tgt))
    elif cfg.eval_mode == "coco":
        src = CsvCOCO(transforms=t_val,
                      transforms_region=region_transform(
                          clip_cfg.image_resolution,
                          normalize=not cfg.device_preprocess),
                      root=root)
        evaluate_coco(ctx, mk_loader(src))
    elif cfg.eval_mode == "imgnet":
        domains = ["cartoon", "origami", "toy", "sculpture"]
        prompts = [f"a {d} of *" for d in domains]
        src = ImageList(os.path.join(root, "imgnet", "imgnet_real_query.txt"),
                        root=root, transforms=t_val, is_labels=True)
        tgt = ImageList(os.path.join(root, "imgnet", "imgnet_targets.txt"),
                        root=root, transforms=t_val, is_labels=True)
        evaluate_imgnet_retrieval(ctx, prompts, mk_loader(src), mk_loader(tgt))
    else:
        raise SystemExit(f"unknown --eval-mode {cfg.eval_mode}")


if __name__ == "__main__":
    main()
