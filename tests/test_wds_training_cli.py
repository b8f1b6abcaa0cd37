"""Train CLI in tar-streaming (webdataset) mode: raw JPEG shards + caption
map, on-the-fly frozen-CLIP encoding inside the jitted step."""

import io
import json
import tarfile

import numpy as np
import pytest

import jax

pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def test_train_cli_webdataset_mode(tmp_path):
    from keds_tpu.cli.main import main as train_main
    from keds_tpu.io.checkpoint import save_train_checkpoint
    from keds_tpu.io.pt import save_pt
    from keds_tpu.models import clip as mclip, heads as mheads
    from keds_tpu.models.composition import FusionHeads

    D = 64
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
    ckpt = str(tmp_path / "clip.pt")
    save_train_checkpoint(ckpt, epoch=0, name="t", clip_params=clip_params,
                          clip_cfg=cfg, heads=heads)

    # two tar shards of jpeg images
    rng = np.random.default_rng(0)
    caps = {}
    for s in range(2):
        with tarfile.open(tmp_path / f"cc-0000{s}.tar", "w") as tf:
            for i in range(8):
                key = f"s{s}_{i}"
                buf = io.BytesIO()
                Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
                    buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.image_byte")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                caps[key] = f"a photo number {s} {i}"
    (tmp_path / "caps.json").write_text(json.dumps(caps))

    db = tmp_path / "db"
    db.mkdir()
    save_pt(np.float32(rng.standard_normal((32, D))), str(db / "cc_image_databases.pt"))
    save_pt(np.float32(rng.standard_normal((32, D))), str(db / "cc_text_databases.pt"))
    (db / "database_names.txt").write_text("\n".join(f"n{i}" for i in range(32)))

    train_main([
        "--train-data", str(tmp_path / "cc-{00000..00001}.tar"),
        "--dataset-type", "webdataset",
        "--caption-map", str(tmp_path / "caps.json"),
        "--train-num-samples", "16",
        "--clip-weights", ckpt, "--database-path", str(db),
        "--batch-size", "4", "--epochs", "1", "--warmup", "2",
        "--lr", "1e-3", "--precision", "fp32", "--db-topk", "4",
        "--logs", str(tmp_path / "logs"), "--name", "wds_smoke",
        "--stream", "image",
    ])
    assert (tmp_path / "logs" / "wds_smoke" / "checkpoints" / "epoch_1.pt").is_file()
