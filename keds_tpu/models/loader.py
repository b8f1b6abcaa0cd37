"""CLIP weight resolution (reference ``src/model/clip.py:132-234``).

``load_clip`` accepts, in order of preference:

* a local ``.pt`` path (raw OpenAI state dict, torch.jit archive, or one of
  our train checkpoints containing ``state_dict``),
* a model name + ``download_root`` where the standard OpenAI artifact is
  already cached (``~/.cache/clip``),
* a model name with network access, in which case the official URL is
  downloaded and SHA256-checked.

Returns ``(params_pytree, ClipConfig, transform_train, transform_val)``.
"""

from __future__ import annotations

import hashlib
import logging
import os
import urllib.request
from typing import Optional, Tuple

from keds_tpu.models import convert
from keds_tpu.models.clip import ClipConfig
from keds_tpu.transforms import image_transform

# Official OpenAI CLIP artifacts (URL path carries the SHA256).
OPENAI_MODEL_URLS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
}


def _download(url: str, root: str) -> str:
    os.makedirs(root, exist_ok=True)
    filename = os.path.basename(url)
    expected_sha256 = url.split("/")[-2]
    target = os.path.join(root, filename)
    if os.path.isfile(target):
        with open(target, "rb") as f:
            if hashlib.sha256(f.read()).hexdigest() == expected_sha256:
                return target
        logging.warning("%s exists with wrong checksum; re-downloading", target)
    logging.info("downloading %s", url)
    # tmp + atomic rename: a process killed mid-download must never leave a
    # truncated file at the final path — resolve_clip_weights short-circuits
    # on existence, so a partial file there would be served forever
    # (round-3 review finding).
    tmp = target + ".part"
    urllib.request.urlretrieve(url, tmp)
    with open(tmp, "rb") as f:
        if hashlib.sha256(f.read()).hexdigest() != expected_sha256:
            os.remove(tmp)
            raise RuntimeError("downloaded model failed its SHA256 check")
    os.replace(tmp, target)
    return target


def _state_dict_from_file(path: str) -> dict:
    from keds_tpu.io import load_pt

    try:
        obj = load_pt(path)
    except Exception:
        obj = None
    if isinstance(obj, dict):
        if "state_dict" in obj:  # our / reference train checkpoint
            return obj["state_dict"]
        if any(k.startswith("visual.") for k in obj):
            return obj
    # torch.jit archive (the original OpenAI distribution format)
    import torch

    model = torch.jit.load(path, map_location="cpu")
    return {k: v.numpy() for k, v in model.state_dict().items()}


def resolve_clip_weights(name_or_path: str,
                         download_root: Optional[str] = None) -> str:
    if os.path.isfile(name_or_path):
        return name_or_path
    url = OPENAI_MODEL_URLS.get(name_or_path)
    if url is None:
        raise FileNotFoundError(
            f"CLIP weights {name_or_path!r}: not a file and not a known model name"
        )
    root = download_root or os.path.expanduser("~/.cache/clip")
    cached = os.path.join(root, os.path.basename(url))
    if os.path.isfile(cached):
        return cached
    return _download(url, root)


def load_clip(name_or_path: str, download_root: Optional[str] = None,
              target_pad: Optional[float] = None,
              normalize_on_host: bool = True) -> Tuple[dict, ClipConfig, object, object]:
    """``normalize_on_host=False`` builds uint8-output transforms for the
    device-preprocess path (host: decode+resize+crop only; /255 + CLIP
    normalization run in-graph, 4x less host->device traffic)."""
    path = resolve_clip_weights(name_or_path, download_root)
    sd = _state_dict_from_file(path)
    params, cfg = convert.clip_state_dict_to_pytree(sd)
    t_train = image_transform(cfg.image_resolution, is_train=True,
                              target_pad=target_pad, normalize=normalize_on_host)
    t_val = image_transform(cfg.image_resolution, is_train=False,
                            target_pad=target_pad, normalize=normalize_on_host)
    logging.info("loaded CLIP %s from %s", cfg, path)
    return params, cfg, t_train, t_val
