"""Benchmark + training datasets (reference ``src/data.py:233-774``).

Map-style datasets returning numpy arrays / strings; batching is done by
:class:`keds_tpu.data.loader.DataLoader`.  Images come back as normalized
float32 NHWC arrays.

Directory layouts match the reference exactly (CIRR under
``<root>/CIRR/{dev,test1,captions,image_splits}``, Fashion-IQ under
``<root>/fashion-iq/{images,json,image_splits}``, COCO under
``<root>/coco/{val2017,val2017_masked,coco_eval.csv,annotations}``) so a
reference user's data tree drops in unchanged.
"""

from __future__ import annotations

import csv
import json
import logging
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from keds_tpu.tokenizer import tokenize

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


def _open_image(path: str):
    img = Image.open(path)
    img.load()
    return img


def _texts_token_needs(texts: Sequence[str], n_pseudo: int,
                       chunk: int = 65536) -> np.ndarray:
    """Per-text causal-prefix bucket need (EOT index + n_pseudo), tokenized
    in bounded chunks so CC3M-scale lists never materialize an (N, 77)
    token matrix (~860 MB at 2.8M rows — only the i32 needs survive)."""
    from keds_tpu.tokenizer import token_needs

    out = np.empty(len(texts), np.int32)
    for i in range(0, len(texts), chunk):
        out[i:i + chunk] = token_needs(tokenize(texts[i:i + chunk]),
                                       n_pseudo=n_pseudo)
    return out


class CIRR:
    """CIRR val/test (reference src/data.py:233-333).

    mode='caps'  -> composed-query samples
    mode='imgs'  -> target-corpus samples
    """

    def __init__(self, transforms: Callable, mode: str = "caps",
                 vis_mode: bool = False, test: bool = False, root: str = "./data"):
        self.mode = mode
        self.transforms = transforms
        self.vis_mode = vis_mode
        self.test = test
        self.root = os.path.join(root, "CIRR")
        self.root_img = os.path.join(self.root, "test1" if test else "dev")
        split = "test1" if test else "val"
        if mode == "caps":
            path = os.path.join(self.root, f"captions/cap.rc2.{split}.json")
        else:
            path = os.path.join(self.root, f"image_splits/split.rc2.{split}.json")
        with open(path) as f:
            data = json.load(f)
        self.ref_imgs: List[str] = []
        self.target_imgs: List[str] = []
        self.target_caps: List[str] = []
        self.pairids: List[int] = []
        if mode == "caps":
            for d in data:
                self.ref_imgs.append(d["reference"] + ".png")
                self.target_caps.append(d["caption"])
                if test:
                    self.pairids.append(d["pairid"])
                    self.target_imgs.append("dummy")
                else:
                    self.target_imgs.append(d["target_hard"] + ".png")
        else:
            self.target_imgs = [k + ".png" for k in data]
        if vis_mode:
            self.target_imgs = sorted(set(self.target_imgs))
        logging.info("CIRR: %d samples", len(self))

    def __len__(self):
        return len(self.target_imgs)

    def __getitem__(self, idx: int):
        if self.mode != "caps" or self.vis_mode:
            tar = str(self.target_imgs[idx])
            img = self.transforms(_open_image(os.path.join(self.root_img, tar)))
            # val corpus returns the full path, test corpus the bare name
            # (reference return_valdata vs return_testdata).
            path = tar if self.test else os.path.join(self.root_img, tar)
            return img, path
        ref = str(self.ref_imgs[idx])
        ref_img = self.transforms(_open_image(os.path.join(self.root_img, ref)))
        cap = self.target_caps[idx]
        text_with_blank = f"a photo of * , {cap}"
        if self.test:
            return (ref_img, tokenize(text_with_blank)[0], tokenize(cap)[0],
                    ref, self.pairids[idx], text_with_blank)
        return (ref_img, tokenize(text_with_blank)[0], tokenize(cap)[0],
                ref, str(self.target_imgs[idx]), text_with_blank, cap)


class FashionIQ:
    """Fashion-IQ per cloth type (reference src/data.py:339-427); the two
    captions are joined "a photo of * , {cap2} and {cap1}"."""

    def __init__(self, cloth: str, transforms: Callable, mode: str = "caps",
                 is_return_target_path: bool = False, vis_mode: bool = False,
                 root: str = "./data"):
        base = os.path.join(root, "fashion-iq")
        self.root_img = os.path.join(base, "images")
        self.mode = mode
        self.vis_mode = vis_mode
        self.is_return_target_path = is_return_target_path
        self.transforms = transforms
        self.ref_imgs: List[str] = []
        self.target_imgs: List[str] = []
        self.ref_caps: List = []
        if mode == "imgs":
            path = os.path.join(base, "image_splits", f"split.{cloth}.val.json")
            with open(path) as f:
                self.target_imgs = [k + ".png" for k in json.load(f)]
        else:
            path = os.path.join(base, "json", f"cap.{cloth}.val.json")
            with open(path) as f:
                data = json.load(f)
            for d in data:
                ref = os.path.join(self.root_img, d["candidate"] + ".png")
                tar = os.path.join(self.root_img, d["target"] + ".png")
                if os.path.isfile(ref) and os.path.isfile(tar):
                    self.ref_imgs.append(ref)
                    self.target_imgs.append(tar)
                    self.ref_caps.append((d["captions"][0], d["captions"][1]))
                else:
                    logging.warning("cannot load %s", d["candidate"])
        logging.info("FashionIQ %s: %d samples", cloth, len(self))

    def __len__(self):
        return len(self.ref_imgs) if self.mode == "caps" else len(self.target_imgs)

    def __getitem__(self, idx: int):
        if self.mode == "imgs" or self.vis_mode:
            tar = str(self.target_imgs[idx])
            path = tar if self.vis_mode else os.path.join(self.root_img, tar)
            return self.transforms(_open_image(path)), path
        ref_img = self.transforms(_open_image(str(self.ref_imgs[idx])))
        tar_img = self.transforms(_open_image(str(self.target_imgs[idx])))
        cap1, cap2 = self.ref_caps[idx]
        text_with_blank = f"a photo of * , {cap2} and {cap1}"
        tokens = tokenize(text_with_blank)[0]
        if self.is_return_target_path:
            return (ref_img, tar_img, tokens, tokens,
                    str(self.target_imgs[idx]), str(self.ref_imgs[idx]), text_with_blank)
        return ref_img, tar_img, text_with_blank


class CsvCOCO:
    """COCO composed-region queries (reference src/data.py:433-509): the
    query is a masked-region crop; prompts are assembled from query_class and
    the other classes present in the target."""

    def __init__(self, transforms: Callable, transforms_region: Callable,
                 root: str = "./data", sep: str = ","):
        self.transforms = transforms
        self.transforms_region = transforms_region
        self.root = os.path.join(root, "coco")
        self.root_img = os.path.join(self.root, "val2017")
        rows = []
        with open(os.path.join(self.root, "coco_eval.csv")) as f:
            rows = list(csv.DictReader(f, delimiter=sep))
        self.images = [r["id"] for r in rows]
        self.regions = []
        for r in rows:
            x1, y1, x2, y2 = (int(float(v)) for v in r["query_regions"].split(";"))
            self.regions.append((x1, y1, x2, y2))
        self.query_classes = [r["query_class"] for r in rows]
        self.classes = [
            r["classes"].split(";") if r.get("classes") else [""] for r in rows
        ]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        name = str(self.images[idx])
        img_path = os.path.join(self.root_img, name)
        basename = os.path.basename(img_path).split(".")[0]
        image = _open_image(img_path)
        masked = _open_image(os.path.join(self.root_img.replace("val2017", "val2017_masked"), name))
        region = masked.crop(self.regions[idx])
        image_t = self.transforms(image)
        region_t = self.transforms_region(region)
        qc = self.query_classes[idx]
        others = " and ".join(self.classes[idx])
        text_with_blank = f"a photo of * and {others}"
        text_with_queryclass = f"a photo of * and {qc} and {others}"
        text_full = f"a photo of {qc} and {others}"
        return (image_t, region_t, tokenize(text_full)[0], tokenize(text_with_blank)[0],
                tokenize(text_with_queryclass)[0], name, text_with_queryclass, basename)


class ImageList:
    """Images from a txt listing, optionally "path label" pairs (reference
    src/data.py:512-546) — used by the ImageNet domain-transfer eval."""

    def __init__(self, input_filename: str, transforms: Callable,
                 root: Optional[str] = None, is_labels: bool = False,
                 return_filename: bool = False):
        with open(input_filename) as f:
            lines = [line.strip() for line in f if line.strip()]
        if is_labels:
            self.images = [ln.split(" ")[0] for ln in lines]
            self.labels = [int(ln.split(" ")[1]) for ln in lines]
        else:
            self.images = lines
            self.labels = None
        self.transforms = transforms
        self.root = root
        self.return_filename = return_filename

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        path = str(self.images[idx])
        if self.root is not None:
            path = os.path.join(self.root, path)
        img = self.transforms(_open_image(path))
        basename = os.path.basename(path).split(".")[0]
        if self.return_filename:
            return img, path
        if self.labels is not None:
            return img, self.labels[idx], basename
        return img


class CustomFolder:
    """All images in one folder (reference src/data.py:549-571)."""

    def __init__(self, folder: str, transform: Callable):
        self.samples = [os.path.join(folder, n) for n in sorted(os.listdir(folder))]
        self.transform = transform

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        path = self.samples[idx]
        return self.transform(_open_image(path)), path


class CsvDataset:
    """(image, tokenized caption) rows from a csv (reference
    src/data.py:673-696)."""

    def __init__(self, input_filename: str, transforms: Callable, img_key: str,
                 caption_key: str, sep: str = "\t", return_filename: bool = False):
        with open(input_filename) as f:
            rows = list(csv.DictReader(f, delimiter=sep))
        self.images = [r[img_key] for r in rows]
        self.captions = [r[caption_key] for r in rows]
        self.transforms = transforms
        self.return_filename = return_filename

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx: int):
        img = self.transforms(_open_image(str(self.images[idx])))
        if self.return_filename:
            return img, str(self.images[idx])
        return img, tokenize([str(self.captions[idx])])[0]

    def caption_token_needs(self, n_pseudo: int = 1) -> np.ndarray:
        """Per-sample bucket need of the caption tokens — a pure function
        of the csv, so every rank computes the identical array and the
        per-step GLOBAL bucket (max over the shared permutation slice)
        without communication.  One tokenizer pass over the file (~30 s at
        CC3M scale); multi-process runs pay it once at startup in exchange
        for S=16/32 caption programs instead of 77."""
        logging.info("tokenizing %d captions for rank-consistent bucketing",
                     len(self.captions))
        return _texts_token_needs([str(c) for c in self.captions], n_pseudo)


class FeaturePairDataset:
    """Precomputed CC3M (image, caption) CLIP-feature pairs — the training
    dataset (reference ``CustomFolderCC`` feature mode, src/data.py:601-634).

    Two storage layouts:

    * **packed** (fast path): ``image_features.npy`` (N, D) +
      ``text_features.npy`` (N, D) + ``names.json`` in one directory —
      memory-mapped, zero per-sample file IO.
    * **per-file** (reference layout): ``cc_image_feature_folder_clipl/*.pt``
      and ``cc_text_feature_folder_clipl/*.pt``.

    Each sample returns (image_feature, caption_feature, subject, other_tokens)
    where ``other_tokens`` is the tokenized template
    ``"a photo of * * * " + other.replace('*', ' ')`` (src/data.py:627).

    :meth:`attach_neighbors` optionally attaches a precomputed-neighbor pack
    (``tools/precompute_neighbors.py``) as a (img_idx, txt_idx, cap2_idx)
    array triple aligned with this dataset's sample order; samples then
    return three extra i32 index rows.  Validation (fingerprints, k) is the
    caller's job (cli/main) — the dataset only asserts alignment by length.
    """

    TEMPLATE_PREFIX = "a photo of * * * "

    def __init__(self, folder: str, subject_json: Optional[str] = None,
                 other_json: Optional[str] = None):
        self.folder = folder
        packed_img = os.path.join(folder, "image_features.npy")
        if os.path.isfile(packed_img):
            self.mode = "packed"
            self.image_feats = np.load(packed_img, mmap_mode="r")
            self.text_feats = np.load(os.path.join(folder, "text_features.npy"), mmap_mode="r")
            with open(os.path.join(folder, "names.json")) as f:
                self.names = json.load(f)
        else:
            self.mode = "per-file"
            self.image_dir = os.path.join(folder, "cc_image_feature_folder_clipl")
            self.text_dir = os.path.join(folder, "cc_text_feature_folder_clipl")
            self.files = sorted(os.listdir(self.image_dir))
            self.names = [os.path.basename(f).split(".")[0] for f in self.files]
        self.subject: Dict[str, str] = _load_json_maybe(subject_json, folder, "cc_subject.json")
        self.other: Dict[str, str] = _load_json_maybe(other_json, folder, "cc_other.json")
        self.neighbors = None

    def own_token_needs(self, n_pseudo: int = 1) -> np.ndarray:
        """Per-sample bucket need of the OWN template tokens (the exact
        ``TEMPLATE_PREFIX + other`` strings ``__getitem__`` tokenizes) — a
        pure function of (names, other map), so every rank derives the same
        per-step GLOBAL causal-prefix bucket from the shared permutation
        with no cross-host communication (the rank-consistent multi-process
        bucketing contract; see DataLoader.global_batch_indices).

        Cached as ``own_token_needs.npy`` next to the features, keyed on a
        sha1 of the template strings themselves (the true input: renames,
        edited captions and prefix changes all move it) — tokenizing 2.8M
        templates costs ~30 s, hashing them is pennies."""
        import hashlib

        h = hashlib.sha1(f"n_pseudo={n_pseudo}".encode())
        texts = []
        for name in self.names:
            t = self.TEMPLATE_PREFIX + self.other.get(name, "*").replace("*", " ")
            texts.append(t)
            h.update(t.encode())
        meta = {"templates_sha1": h.hexdigest(), "rows": len(texts)}
        cache = os.path.join(self.folder, "own_token_needs.npy")
        meta_path = cache + ".meta.json"
        if os.path.isfile(cache) and os.path.isfile(meta_path):
            with open(meta_path) as f:
                if json.load(f) == meta:
                    return np.load(cache)
        logging.info("tokenizing %d own templates for rank-consistent "
                     "bucketing", len(texts))
        needs = _texts_token_needs(texts, n_pseudo)
        try:
            # temp-then-rename: co-located ranks may write concurrently; the
            # content is identical, but a partially written npy must never be
            # loadable (meta lands only after its npy is complete)
            tmp = f"{cache}.{os.getpid()}.tmp.npy"  # .npy: np.save appends otherwise
            np.save(tmp, needs)
            os.replace(tmp, cache)
            tmp_m = f"{meta_path}.tmp.{os.getpid()}"
            with open(tmp_m, "w") as f:
                json.dump(meta, f)
            os.replace(tmp_m, meta_path)
        except OSError:  # read-only feature dirs are fine — just recompute
            logging.info("could not cache %s; will recompute next run", cache)
        return needs

    def attach_neighbors(self, neighbors: tuple) -> None:
        """Attach a validated neighbor pack after construction (lets the CLI
        fingerprint-check against the already-built dataset instead of
        loading the large subject/other JSONs twice)."""
        if any(len(a) != len(self.names) for a in neighbors):
            raise ValueError(
                f"neighbor pack rows {[len(a) for a in neighbors]} do not "
                f"match the dataset ({len(self.names)} samples)")
        self.neighbors = neighbors

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx: int):
        name = self.names[idx]
        if self.mode == "packed":
            img = np.asarray(self.image_feats[idx], np.float32)
            txt = np.asarray(self.text_feats[idx], np.float32)
        else:
            from keds_tpu.io import load_pt

            img = np.asarray(load_pt(os.path.join(self.image_dir, self.files[idx])),
                             np.float32).reshape(-1)
            txt = np.asarray(load_pt(os.path.join(self.text_dir, self.files[idx])),
                             np.float32).reshape(-1)
        subject = self.subject.get(name, "")
        other = self.other.get(name, "*")
        template = self.TEMPLATE_PREFIX + other.replace("*", " ")
        base = (img, txt, subject, tokenize(template)[0])
        if self.neighbors is not None:
            return base + tuple(np.asarray(a[idx], np.int32)
                                for a in self.neighbors)
        return base


class ImageFolderByClass:
    """<root>/<class_dir>/<image> tree with integer labels by sorted class
    order (torchvision ImageFolder semantics; used by the ImageNet zero-shot
    path, reference src/data.py:732-774)."""

    def __init__(self, root: str, transform: Callable):
        self.transform = transform
        self.samples: List[tuple] = []
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                self.samples.append((os.path.join(cdir, fn), self.class_to_idx[c]))
        self.targets = [t for _, t in self.samples]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, target = self.samples[idx]
        return self.transform(_open_image(path)), target


def imagenet_train_subset_indices(targets: Sequence[int], per_class: int = 50,
                                  n_classes: int = 1000, seed: int = 0) -> np.ndarray:
    """50-per-class random subset (reference get_imagenet train sampler,
    src/data.py:751-764)."""
    rng = np.random.default_rng(seed)
    targets = np.asarray(targets)
    keep = []
    for c in range(n_classes):
        idx = np.where(targets == c)[0]
        if len(idx) == 0:
            continue
        rng.shuffle(idx)
        keep.append(idx[:per_class])
    return np.sort(np.concatenate(keep)) if keep else np.empty(0, np.int64)


def _load_json_maybe(path: Optional[str], folder: str, default_name: str) -> dict:
    candidates = [path] if path else []
    candidates.append(os.path.join(folder, default_name))
    candidates.append(default_name)
    for c in candidates:
        if c and os.path.isfile(c):
            with open(c) as f:
                return json.load(f)
    return {}


def build_other_tokens(names: Sequence[str], other: Dict[str, str],
                       template_prefix: str = "a photo of * * ") -> np.ndarray:
    """Tokenize the neighbor-caption templates for every DB row once
    ("a photo of * * " + other, src/trainer.py:323), so the text-stream loss
    can gather them on device by neighbor index instead of tokenizing per
    step on host."""
    keys = [n.split(".")[0] for n in names]
    missing = sum(1 for k in keys if k not in other)
    if missing == len(names) and names:
        # Every lookup missing means the caption map does not belong to this
        # DB at all — tokenizing B empty templates would train the 0.5-weight
        # neighbor term on bare prefixes with exit code 0.
        raise ValueError(
            "none of the knowledge-DB row names appear in the 'other' "
            "caption map (cc_other.json) — wrong map for this DB?")
    if missing:
        import logging

        logging.warning(
            "%d/%d knowledge-DB rows have no 'other' caption entry; their "
            "neighbor templates fall back to the bare prefix", missing,
            len(names))
    texts = [template_prefix + other.get(k, "").replace("*", " ")
             for k in keys]
    return tokenize(texts)
