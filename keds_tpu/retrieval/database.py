"""Bi-modality knowledge database + retrieval (reference C10/C11).

The reference keeps two 0.5M x 768 tensors (CC3M image / caption CLIP
features, ``cc_{image,text}_databases.pt`` + ``database_names.txt``) on CPU,
replicates a faiss index per GPU, and every step does a
device->host->device round trip to search it (``src/trainer.py:198-259``,
``src/main.py:470-478``).

Here the DB lives in device HBM as two arrays (bf16 by default: 0.75 GB per
modality at 0.5M rows) — either replicated or row-sharded over the mesh —
and search is a jitted MIPS top-k that composes into the surrounding step
function with no host synchronisation.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from keds_tpu.ops.topk import (
    mips_topk,
    mips_topk_approx,
    mips_topk_fused,
    mips_topk_int8,
    mips_topk_int8_sharded,
    mips_topk_sharded,
    quantize_int8,
)


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@dataclasses.dataclass
class KnowledgeDB:
    """Unit-normalized embedding database for both modalities.

    ``quant`` optionally carries pre-quantized int8 artifacts
    (``tools/build_database.py --int8``): ``{"image": (q8, scale),
    "text": (q8, scale)}``.  When present, ``Retriever(backend="int8")``
    uses them directly instead of re-quantizing at startup."""

    image_db: jax.Array  # (N, D)
    text_db: jax.Array   # (N, D)
    names: List[str]
    quant: Optional[dict] = None

    @property
    def size(self) -> int:
        return int(self.image_db.shape[0])

    @property
    def dim(self) -> int:
        return int(self.image_db.shape[1])

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_arrays(cls, image: np.ndarray, text: np.ndarray,
                    names: Optional[List[str]] = None,
                    dtype=jnp.bfloat16, normalize: bool = True) -> "KnowledgeDB":
        image = np.asarray(image, np.float32)
        text = np.asarray(text, np.float32)
        if normalize:
            image, text = _l2_normalize(image), _l2_normalize(text)
        names = names if names is not None else [str(i) for i in range(len(image))]
        return cls(jnp.asarray(image, dtype), jnp.asarray(text, dtype), names)

    @classmethod
    def load(cls, image_file: str, text_file: str,
             names_file: Optional[str] = None, dtype=jnp.bfloat16) -> "KnowledgeDB":
        """Load the reference artifacts: ``cc_image_databases.pt`` /
        ``cc_text_databases.pt`` (.pt, .npy or .npz) + ``database_names.txt``
        (reference src/main.py:470-478)."""
        def read(path):
            if path.endswith(".npy"):
                return np.load(path, mmap_mode="r")
            if path.endswith(".npz"):
                z = np.load(path)
                return z[list(z.files)[0]]
            from keds_tpu.io import load_pt

            return load_pt(path)

        names: Optional[List[str]] = None
        if names_file and os.path.isfile(names_file):
            with open(names_file) as f:
                names = [line.strip() for line in f]
        logging.info("Loading knowledge DB: %s / %s", image_file, text_file)
        db = cls.from_arrays(read(image_file), read(text_file), names, dtype)
        logging.info("Knowledge DB ready: %d rows, dim %d", db.size, db.dim)
        return db

    @classmethod
    def from_config(cls, cfg, dtype=jnp.bfloat16) -> "KnowledgeDB":
        """Resolve DB files from a Config (--database-path dir convention or
        explicit --db-*-file flags)."""
        img, txt, names = cfg.db_image_file, cfg.db_text_file, cfg.db_names_file
        if cfg.database_path:
            base = cfg.database_path
            img = img or _first_existing(base, ["cc_image_databases.pt", "image_db.npy", "image_db.npz"])
            txt = txt or _first_existing(base, ["cc_text_databases.pt", "text_db.npy", "text_db.npz"])
            names = names or os.path.join(base, "database_names.txt")
        if not (img and txt):
            raise FileNotFoundError(
                "knowledge database not found; pass --database-path or --db-image-file/--db-text-file"
            )
        db = cls.load(img, txt, names, dtype)
        if cfg.database_path:
            quant = _load_int8_artifacts(cfg.database_path)
            if quant is not None:
                # Artifacts must describe THIS float DB: stale files from a
                # rebuild with a different --size/--seed, or a --db-*-file
                # override pointing elsewhere, would silently return wrong
                # neighbors (row indices refer to a different sampling).
                ref_shapes = {"image": db.image_db.shape,
                              "text": db.text_db.shape}
                if any(quant[m][0].shape != ref_shapes[m]
                       or quant[m][1].shape[0] != db.size
                       for m in ("image", "text")):
                    logging.warning(
                        "ignoring int8 artifacts in %s: shape mismatch vs "
                        "the loaded DB (%s rows) — rebuild with "
                        "build_database --int8", cfg.database_path, db.size)
                    quant = None
            db.quant = quant
        return db

    def shard_over(self, mesh: jax.sharding.Mesh, axis: str = "data") -> "KnowledgeDB":
        """Place DB rows sharded across the mesh axis (the analog of faiss
        index_cpu_to_all_gpus, src/eval_retrieval.py:289-298).  Rows are
        padded to a multiple of the axis size."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        w = mesh.shape[axis]
        n = self.size
        n_pad = (-n) % w
        sharding = NamedSharding(mesh, P(axis, None))

        def place(a):
            a = jnp.pad(a, ((0, n_pad), (0, 0))) if n_pad else a
            return jax.device_put(a, sharding)

        # quant (host-side artifacts, unpadded) passes through: the
        # Retriever pads + places it iff the int8 backend is selected.
        return KnowledgeDB(place(self.image_db), place(self.text_db),
                           self.names, self.quant)


def db_fingerprint(db: "KnowledgeDB") -> dict:
    """Identity fingerprint of a knowledge DB for artifact staleness checks
    (the text-stream template cache and precomputed-neighbor packs both key
    on it): row count, sha1 of the names, and a sha1 over a 64-row strided
    subsample of both modality arrays — names alone degenerate to
    row-count-only when a DB is loaded from bare arrays (synthesized
    "0","1",... names), letting a same-size different-seed rebuild pass."""
    import hashlib

    from keds_tpu.parallel.mesh import fetch_global

    n_rows = len(db.names)
    sig = hashlib.sha1()
    idx = np.unique(np.linspace(0, max(n_rows - 1, 0),
                                num=min(64, n_rows)).astype(int))
    for arr in (db.image_db, db.text_db):
        # fetch_global: on a multi-process --db-shard run the DB rows span
        # non-addressable devices and a bare np.asarray(arr[idx]) raises;
        # the strided gather runs as a global SPMD computation (every
        # process calls db_fingerprint) and allgathers to each host.
        rows = fetch_global(arr[idx])
        sig.update(np.ascontiguousarray(
            np.asarray(rows, np.float32)).tobytes())
    return {
        "rows": n_rows,
        "names_sha1": hashlib.sha1("\n".join(db.names).encode()).hexdigest(),
        "db_rows_sha1": sig.hexdigest(),
    }


def _first_existing(base: str, candidates: List[str]) -> Optional[str]:
    for c in candidates:
        p = os.path.join(base, c)
        if os.path.isfile(p):
            return p
    return None


def _load_int8_artifacts(base: str) -> Optional[dict]:
    """Pre-quantized int8 index artifacts written by ``tools/
    build_database.py --int8`` (``{image,text}_db_int8.npy`` +
    ``*_db_scale.npy``).  Returns None unless all four files exist.
    Arrays stay host-side (mmap) — the Retriever moves them to device only
    when the int8 backend is actually selected."""
    out = {}
    for name in ("image", "text"):
        qf = os.path.join(base, f"{name}_db_int8.npy")
        sf = os.path.join(base, f"{name}_db_scale.npy")
        if not (os.path.isfile(qf) and os.path.isfile(sf)):
            return None
        out[name] = (np.load(qf, mmap_mode="r"),
                     np.asarray(np.load(sf), np.float32))
    logging.info("loaded pre-quantized int8 DB artifacts from %s", base)
    return out


class Retriever:
    """Jit-composable top-k retrieval over a :class:`KnowledgeDB`.

    Reproduces ``get_retrieved_features`` (src/trainer.py:198-259): normalize
    the query, search both modalities with k=16, gather neighbor rows, and
    randomly permute the *image* neighbors (one permutation per batch,
    src/trainer.py:218-219).  All of it stays on device inside the caller's
    jit scope.
    """

    def __init__(self, db: KnowledgeDB, *, backend: str = "xla",
                 mesh: Optional[jax.sharding.Mesh] = None,
                 sharded: bool = False, axis_name: str = "data",
                 interpret: bool = False):
        self.db = db
        self.backend = backend
        self.mesh = mesh
        self.sharded = sharded
        self.axis_name = axis_name
        self.interpret = interpret
        if sharded and mesh is None:
            raise ValueError("sharded retrieval requires a mesh")
        self._int8: dict = {}
        if backend == "int8":
            # Scoring runs on the int8 MXU with exact rescoring of the
            # oversampled candidates against the resident full-precision
            # rows.  Pre-quantized artifacts on the DB (build_database
            # --int8, kept host-side/mmap until here) are padded to the DB's
            # (possibly sharded) row count and placed; otherwise quantize
            # both modalities once on device.  Either way the quantized
            # values/scales follow the DB's row sharding.
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_rows = int(db.image_db.shape[0])  # includes shard padding
            for name, arr in (("image", db.image_db), ("text", db.text_db)):
                if db.quant is not None:
                    q8 = np.asarray(db.quant[name][0])
                    scale = np.asarray(db.quant[name][1], np.float32)
                    pad = n_rows - q8.shape[0]
                    if pad:
                        q8 = np.pad(q8, ((0, pad), (0, 0)))
                        scale = np.pad(scale, ((0, pad),))
                else:
                    q8, scale = quantize_int8(arr)
                if sharded:
                    q8 = jax.device_put(q8, NamedSharding(mesh, P(axis_name, None)))
                    scale = jax.device_put(scale, NamedSharding(mesh, P(axis_name)))
                else:
                    q8, scale = jnp.asarray(q8), jnp.asarray(scale)
                self._int8[name] = (q8, scale)

    def quant_arrays(self):
        """The int8 index arrays ((img_q8, img_scale), (txt_q8, txt_scale)),
        or None for non-int8 backends.  Jitted callers MUST thread this
        through as traced arguments (like ``db_arrays``) — closed-over
        arrays inline into the HLO as constants (rule 3: remote-compile
        rejects the result), and object-identity modality checks are
        meaningless on tracers."""
        if self.backend != "int8":
            return None
        return (self._int8["image"], self._int8["text"])

    # -- low-level search ---------------------------------------------------
    def search(self, queries: jax.Array, db_array: jax.Array, k: int,
               modality: str = "image", quant=None):
        """``modality`` selects the int8 index when ``quant`` isn't passed
        explicitly; identity of ``db_array`` is NOT used (it is a tracer
        inside jit)."""
        interpret = self.interpret
        if self.backend == "pallas" and not interpret:
            # Mosaic kernels only compile for TPU; run interpreted elsewhere.
            try:
                interpret = jax.default_backend() == "cpu"
            except Exception:  # pragma: no cover
                pass
        n_real = len(self.db.names)  # sharding pads rows; names hold the truth
        if self.backend == "int8":
            # The int8 scan only proposes candidates; the final order comes
            # from rescoring against the TRUE rows (db_array) — they are
            # resident anyway for the neighbor gather, and dequant-row
            # rescoring measurably flips neighbors on clustered corpora
            # (BENCH_NOTES round-3 accuracy tables).
            q8, scale = quant if quant is not None else self._int8[modality]
            if self.sharded:
                return mips_topk_int8_sharded(
                    queries.astype(jnp.float32), q8, scale, k,
                    self.mesh, self.axis_name, n_real=n_real, db=db_array,
                )
            return mips_topk_int8(queries.astype(jnp.float32), q8, scale, k,
                                  db=db_array)
        if self.sharded:
            return mips_topk_sharded(
                queries, db_array, k, self.mesh, self.axis_name,
                backend=self.backend, interpret=interpret, n_real=n_real,
            )
        if self.backend == "pallas":
            return mips_topk_fused(queries, db_array, k, interpret=interpret)
        if self.backend == "approx":
            return mips_topk_approx(queries, db_array, k)
        return mips_topk(queries, db_array, k)

    def _gather(self, db_array: jax.Array, idx: jax.Array) -> jax.Array:
        take = db_array[jnp.clip(idx, 0, db_array.shape[0] - 1)]
        return take  # (B, k, D)

    # -- reference-semantics API --------------------------------------------
    def retrieve_features(
        self,
        feature: jax.Array,
        k: int = 16,
        rng: Optional[jax.Array] = None,
        shuffle_image: bool = True,
        db_arrays: Optional[Tuple[jax.Array, jax.Array]] = None,
        db_quant=None,
        idx: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Top-k image and caption neighbor features for each query
        (reference get_retrieved_features).  ``rng`` drives the image-side
        neighbor permutation; None disables it.  The reference's eval twin
        shuffles *unseeded* (src/eval_utils.py:172-175); we omit the shuffle
        at eval — a provable no-op because CrossAttention is
        permutation-invariant over keys/values (PARITY.md, tested in
        tests/test_retrieval.py).

        ``db_arrays=(image_db, text_db)`` lets jitted callers pass the DB as
        traced *arguments* — required because closed-over arrays are embedded
        as HLO constants (gigabytes of proto; the axon remote-compile path
        rejects them outright).  For the int8 backend, jitted callers must
        likewise thread ``db_quant=Retriever.quant_arrays()``.

        ``idx=(img_idx, txt_idx)`` skips the search and gathers those
        PRECOMPUTED rows instead (tools/precompute_neighbors.py) — the
        gather -> permutation -> cast tail is this one canonical op sequence
        either way, so a precomputed-index step is bit-identical to the
        searched step at the same PRNG key.  One caveat: the pack tool runs
        the UNSHARDED exact search, and at exact f32 score ties a sharded
        (``--db-shard``) merge may legally order the tied rows differently —
        both are valid exact results (training is equally correct), but
        strict bitwise parity vs a sharded search is only guaranteed on
        tie-free corpora."""
        image_db, text_db = db_arrays if db_arrays is not None else (
            self.db.image_db, self.db.text_db
        )
        if idx is not None:
            img_idx, txt_idx = idx
            # Width must equal k: narrower packs would make the k-wide image
            # permutation clamp out-of-bounds gathers (silent duplicate
            # neighbors), wider ones would hand the two modalities different
            # neighbor counts — both break the bit-identity contract.
            if img_idx.shape[1] != k or txt_idx.shape[1] != k:
                raise ValueError(
                    f"precomputed neighbor indices are {img_idx.shape[1]}/"
                    f"{txt_idx.shape[1]} wide but k={k}; slice the pack to "
                    "k columns (the train CLI does this from --db-topk)")
        else:
            quant_img, quant_txt = db_quant if db_quant is not None else (None, None)
            q = feature / jnp.linalg.norm(feature, axis=1, keepdims=True)
            q = q.astype(image_db.dtype)
            _, img_idx = self.search(q, image_db, k, modality="image",
                                     quant=quant_img)
            _, txt_idx = self.search(q, text_db, k, modality="text",
                                     quant=quant_txt)
        topk_img = self._gather(image_db, img_idx)
        if shuffle_image and rng is not None:
            perm = jax.random.permutation(rng, k)
            topk_img = topk_img[:, perm, :]
        topk_txt = self._gather(text_db, txt_idx)
        return topk_img.astype(feature.dtype), topk_txt.astype(feature.dtype)

    def retrieve_caption_neighbors(
        self, feature: jax.Array, k: int = 2,
        text_db: Optional[jax.Array] = None,
        text_quant=None,
        idx: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Top-k caption features + their row indices (reference
        get_extra_cap_features, src/trainer.py:262-283; the caller maps
        indices to basenames on host).  ``idx`` skips the search and gathers
        those precomputed rows (same canonical gather+cast tail)."""
        if text_db is None:
            text_db = self.db.text_db
        if idx is None:
            q = feature / jnp.linalg.norm(feature, axis=1, keepdims=True)
            q = q.astype(text_db.dtype)
            _, idx = self.search(q, text_db, k, modality="text", quant=text_quant)
        return self._gather(text_db, idx).astype(feature.dtype), idx

    def names_for(self, idx: np.ndarray) -> List[str]:
        flat = np.asarray(idx).reshape(-1)
        return [self.db.names[i] for i in flat]
