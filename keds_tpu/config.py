"""Typed configuration with the reference CLI flag surface.

The reference shares one ~60-flag argparse namespace between its three CLIs
(``src/params.py:33-355``).  Here the same flags populate a typed dataclass;
per-model default hyperparameters replicate ``get_default_params``
(``src/params.py:20-30``).  GPU/NCCL-specific knobs (``--dist-backend``,
``--gpu``, ``--dp``, ``--multigpu``) are accepted for CLI compatibility but map
onto the JAX mesh runtime.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional

MODEL_CHOICES = [
    "RN50", "RN101", "RN50x4", "RN50x64", "RN50x16",
    "ViT-B/16", "ViT-B/32", "ViT-L/14", "ViT-H-14",
]


def get_default_params(model_name: str) -> dict:
    """CLIP-paper defaults keyed by backbone (reference src/params.py:20-30)."""
    if model_name in ("ViT-B/32", "ViT-L/14", "ViT-B/16"):
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6}
    if model_name.startswith("RN") or model_name == "ViT-H-14":
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8}
    return {}


@dataclass
class Config:
    # data
    train_data: Optional[str] = None
    val_data: Optional[str] = None
    dataset_type: str = "auto"
    dataset_type_val: str = "auto"
    csv_separator: str = "\t"
    csv_img_key: str = "filepath"
    csv_caption_key: str = "title"
    imagenet_val: Optional[str] = None
    imagenet_v2: Optional[str] = None
    root_data: str = "./data"
    train_num_samples: Optional[int] = None
    dataset_resampled: bool = False
    caption_map: Optional[str] = None  # {key: caption} json/pkl for tar streaming
    train_data_upsampling_factors: Optional[str] = None
    workers: int = 1
    # retrieval / demo
    prompts: Optional[str] = None
    retrieval_data: Optional[str] = None
    demo_out: str = "demo"
    query_file: Optional[str] = None
    topn: int = 10  # results returned per query (serve CLI ranking depth)
    source_data: Optional[str] = None
    target_data: Optional[str] = None
    target_pad: bool = False
    eval_mode: str = "coco"
    # knowledge database
    database_path: Optional[str] = None  # dir or prefix holding image/text DB + names
    db_image_file: Optional[str] = None
    db_text_file: Optional[str] = None
    db_names_file: Optional[str] = None
    db_topk: int = 16
    db_shard: bool = False  # shard DB rows over the mesh instead of replicating
    neighbors: Optional[str] = None  # precomputed-neighbor pack for training
    retrieval_backend: str = "auto"  # auto | xla | pallas | int8 | approx
    # TPU-native extensions (no reference counterpart)
    quant_towers: str = "none"  # none | int8: W8A8 tower GEMMs (inference)
    eval_ranking: str = "host"  # host | device: CIRR sweep ranking on the MXU
    device_preprocess: bool = True  # ship uint8, normalize on device
    worker_processes: bool = False  # decode in worker processes, not threads
    # model
    model: str = "ViT-L/14"
    middle_dim: int = 512
    droprate: float = 0.1
    n_layer: int = 2
    openai_pretrained: bool = False
    clip_weights: Optional[str] = None  # path to CLIP .pt weights (no download)
    # optimization
    batch_size: int = 64
    epochs: int = 32
    lr: Optional[float] = None
    beta1: Optional[float] = None
    beta2: Optional[float] = None
    eps: Optional[float] = None
    wd: float = 0.2
    warmup: int = 10000
    skip_scheduler: bool = False
    precision: str = "amp"  # amp -> bf16 compute on TPU; fp16 -> bf16; fp32
    seed: int = 0
    # streams / eval branches
    stream: str = "image"  # which stream to train: image | text
    image_branch: str = "./image_branch/checkpoints"
    text_branch: str = "./text_branch/checkpoints"
    # checkpointing / logging
    logs: str = "./logs/"
    name: Optional[str] = None
    time_suffix: bool = True
    save_frequency: int = 1
    save_most_recent: bool = False
    resume: Optional[str] = None
    checkpoint_format: str = "pt"  # pt (reference-compatible) | orbax
    report_to: str = ""
    wandb_notes: str = ""
    profile_dir: Optional[str] = None  # capture a device trace of train steps
    debug: bool = False
    copy_codebase: bool = False
    # distribution (JAX mesh; GPU-era flags kept for CLI compatibility)
    distributed: bool = False
    skip_aggregate: bool = False
    dist_url: str = "tcp://127.0.0.1:6100"
    dist_backend: str = "ici"
    gpu: Optional[int] = None
    dp: bool = False
    multigpu: Optional[List[int]] = None
    use_bn_sync: bool = False
    use_debiased_sampler: bool = False
    use_prefix: bool = False
    num_partitions: int = 0  # 0 = all local devices on the data axis
    # misc / feature toggles
    # pre_save_feature routes to tools/extract_features (the reference's
    # save_feature pass); load_feature is the default precomputed-feature
    # train path (only guarded against webdataset input).
    pre_save_feature: bool = False
    load_feature: bool = False
    # open_clip-heritage flags that are inert in the reference too (parsed
    # by src/params.py, consumed by no live code path): the zeroshot/
    # regression eval cadence and its LogReg C, and the imagenet val roots
    # (src/data.py builds loaders that training never reads).  Accepted for
    # flag-surface parity; see tests/test_flag_census.py.
    zeroshot_frequency: int = 2
    regression_frequency: int = 2
    C: float = 3.16

    # derived at parse time
    aggregate: bool = field(default=True)
    world_size: int = 1
    rank: int = 0

    def finalize(self) -> "Config":
        self.aggregate = not self.skip_aggregate
        for k, v in get_default_params(self.model).items():
            if getattr(self, k) is None:
                setattr(self, k, v)
        return self


def _add_flags(parser: argparse.ArgumentParser) -> None:
    add = parser.add_argument
    add("--train-data", type=str, default=None)
    add("--val-data", type=str, default=None)
    add("--dataset-type", type=str, default="auto",
        choices=["webdataset", "csv", "inet", "auto", "directory",
                 "fashion-iq", "cirr", "imgnet_r"])
    add("--dataset-type-val", type=str, default="auto")
    add("--csv-separator", type=str, default="\t")
    add("--csv-img-key", type=str, default="filepath")
    add("--csv-caption-key", type=str, default="title")
    add("--imagenet-val", type=str, default=None)
    add("--imagenet-v2", type=str, default=None)
    add("--root-data", type=str, default="./data")
    add("--train-num-samples", type=int, default=None)
    add("--dataset-resampled", action="store_true", default=False)
    add("--caption-map", type=str, default=None)
    add("--train-data-upsampling-factors", type=str, default=None)
    add("--workers", type=int, default=1)
    add("--prompts", type=str, default=None)
    add("--retrieval-data", type=str, default=None)
    add("--demo-out", type=str, default="demo")
    add("--query_file", type=str, default=None)
    add("--topn", type=int, default=10,
        help="results returned per query (serve CLI ranking depth)")
    add("--source-data", type=str, default=None)
    add("--target-data", type=str, default=None)
    add("--target-pad", action="store_true", default=False)
    add("--eval-mode", type=str, default="coco",
        choices=["coco", "cirr", "cirr_test", "fashion", "imgnet"])
    add("--database-path", type=str, default=None)
    add("--db-image-file", type=str, default=None)
    add("--db-text-file", type=str, default=None)
    add("--db-names-file", type=str, default=None)
    add("--db-topk", type=int, default=16)
    add("--db-shard", action="store_true", default=False)
    add("--neighbors", type=str, default=None,
        help="precomputed-neighbor pack (tools/precompute_neighbors.py) for "
             "features-mode training, or 'auto' for "
             "<train-data>/neighbors.npz: replaces the in-step top-k search "
             "with a device gather — bit-identical trajectory, the exact "
             "image-stream step drops its ~47%% retrieval share "
             "(BENCH_NOTES round-4); fingerprint-checked against the DB "
             "and feature set (row count + names sha1 + a 64-row strided "
             "content subsample — edits confined to un-sampled rows of a "
             "same-name DB pass undetected), refused loudly when stale")
    add("--retrieval-backend", type=str, default="auto",
        choices=["auto", "xla", "pallas", "int8", "approx"],
        help="approx: TPU hardware partial-reduce ANN with exact re-rank of "
             "4x-oversampled candidates (top-16 recall 0.995 on Gaussian AND "
             "0.993-0.995 on realistically correlated corpora, 200k rows; "
             "also selects the in-train-step search: +18%% step throughput, "
             "opt-in); int8: int8-MXU candidate scan + true-row rescore "
             "(1.0 overlap at CLIP-like correlation; the HBM-footprint "
             "mode — BENCH_NOTES round-3 accuracy tables)")
    add("--quant-towers", type=str, default="none", choices=["none", "int8"],
        help="int8: W8A8-quantize the CLIP tower GEMMs for inference "
             "(4x smaller weights; ~0.999 embedding cosine and 0.97 top-16 "
             "neighbor overlap on structured images incl. injected outlier "
             "channels — BENCH_NOTES round-3; v5e speed findings ibid.)")
    add("--eval-ranking", type=str, default="host",
        choices=["host", "device"],
        help="device: sweep ranking on the MXU (CIRR/Fashion/COCO/ImageNet "
             "evaluators) — score matmul at Precision.HIGHEST + the rank "
             "reduction on device, only the integer result fetched per "
             "epoch; equals the host recall cells given the corpus "
             "contracts checked up front; works under a mesh / multi-"
             "process (queries stay sharded, corpus replicated, integer "
             "result gathered).  Removes the two dominant sweep phases at "
             "true CIRR scale: 823 -> 330 s end-to-end (BENCH_NOTES round "
             "5).  host: the formula-literal numpy path (default)")
    add("--no-device-preprocess", dest="device_preprocess",
        action="store_false", default=True,
        help="disable uint8 transfer + on-device normalization (ship f32 "
             "host-normalized images instead, bit-exact with the reference "
             "PIL pipeline)")
    add("--worker-processes", action="store_true", default=False,
        help="run --workers as spawned processes instead of threads "
             "(the reference's worker-process decode, src/data.py:839-863; "
             "use on many-core hosts where transforms serialize on the GIL)")
    add("--model", type=str, default="ViT-L/14", choices=MODEL_CHOICES)
    add("--middle_dim", type=int, default=512)
    add("--droprate", type=float, default=0.1)
    add("--n-layer", type=int, default=2)
    add("--openai-pretrained", action="store_true", default=False)
    add("--clip-weights", type=str, default=None)
    add("--batch-size", type=int, default=64)
    add("--epochs", type=int, default=32)
    add("--lr", type=float, default=None)
    add("--beta1", type=float, default=None)
    add("--beta2", type=float, default=None)
    add("--eps", type=float, default=None)
    add("--wd", type=float, default=0.2)
    add("--warmup", type=int, default=10000)
    add("--skip-scheduler", action="store_true", default=False)
    add("--precision", type=str, default="amp", choices=["amp", "fp16", "fp32", "bf16"])
    add("--seed", type=int, default=0)
    add("--stream", type=str, default="image", choices=["image", "text"])
    add("--image-branch", type=str, default="./image_branch/checkpoints")
    add("--text-branch", type=str, default="./text_branch/checkpoints")
    add("--logs", type=str, default="./logs/")
    add("--name", type=str, default=None)
    add("--no-time-suffix", dest="time_suffix", action="store_false", default=True)
    add("--save-frequency", type=int, default=1)
    add("--save-most-recent", action="store_true", default=False)
    add("--resume", type=str, default=None)
    add("--checkpoint-format", type=str, default="pt", choices=["pt", "orbax"])
    add("--report-to", type=str, default="")
    add("--profile-dir", type=str, default=None,
        help="write a TensorBoard-compatible jax.profiler trace of a "
             "mid-epoch step window to this directory")
    add("--wandb-notes", type=str, default="")
    add("--debug", action="store_true", default=False)
    add("--copy-codebase", action="store_true", default=False)
    add("--distributed", action="store_true", default=False)
    add("--skip-aggregate", action="store_true", default=False)
    add("--dist-url", type=str, default="tcp://127.0.0.1:6100")
    add("--dist-backend", type=str, default="ici")
    add("--gpu", type=int, default=None)
    add("--dp", action="store_true", default=False)
    add("--multigpu", type=lambda x: [int(a) for a in x.split(",")], default=None)
    add("--use-bn-sync", action="store_true", default=False)
    add("--use-debiased-sampler", action="store_true", default=False)
    add("--use-prefix", action="store_true", default=False)
    add("--num-partitions", type=int, default=0)
    add("--pre-save-feature", action="store_true", default=False)
    add("--load-feature", action="store_true", default=False)
    add("--zeroshot-frequency", type=int, default=2)
    add("--regression-frequency", type=int, default=2)
    add("--C", type=float, default=3.16)


def parse_args(argv: Optional[List[str]] = None) -> Config:
    parser = argparse.ArgumentParser(prog="keds_tpu")
    _add_flags(parser)
    ns = parser.parse_args(argv)
    fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in fields})
    return cfg.finalize()
