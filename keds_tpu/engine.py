"""ComposedQueryEngine — the serving entry point.

Wraps the flagship inference primitive (SURVEY.md §3.5: encode reference
image -> top-16 bi-modality retrieval -> dual-stream fusion -> frozen
text-tower compose -> rank against a corpus) as one jitted program with a
pipelined dispatch loop: batches are dispatched back-to-back and results
fetched afterwards, so per-dispatch host/tunnel gaps hide behind device
execution — this is how bench.py's headline throughput is achieved (current
numbers and schedules in BENCH_NOTES.md).

    engine = ComposedQueryEngine(clip_params, cfg, heads, db)
    corpus = engine.encode_corpus(image_batches)          # (N, D) unit-norm
    ranks  = engine.search(query_batches, text_batches, corpus, topn=10)
"""

from __future__ import annotations

from typing import Iterable, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from keds_tpu.models import clip as mclip
from keds_tpu.models.composition import FusionHeads, compose_pseudo_tokens
from keds_tpu.ops.topk import mips_topk, mips_topk_sharded
from keds_tpu.retrieval.database import KnowledgeDB, Retriever
from keds_tpu.tokenizer import star_token_id


# Text-length bucketing lives with the tokenizer (pure token logic);
# re-exported here because serving is its flagship consumer.
from keds_tpu.tokenizer import TEXT_BUCKETS, bucket_text  # noqa: F401


class DeviceCorpus(NamedTuple):
    """A retrieval corpus resident in device HBM (row-sharded under a mesh).

    The reference ranks on host (``sims = q @ corpus.T`` + argsort,
    src/eval_utils.py:256-257); keeping the corpus on device and returning
    only (scores, indices) removes the host matmul/argsort that would
    dominate at large corpora."""

    array: jax.Array   # (N_padded, D) f32, rows padded to the mesh axis
    n_real: int        # true row count (padding rows are masked in the merge)


class ComposedQueryEngine:
    def __init__(
        self,
        clip_params: dict,
        cfg: mclip.ClipConfig,
        heads: FusionHeads,
        db: KnowledgeDB,
        *,
        retriever: Optional[Retriever] = None,
        db_topk: int = 16,
        compute_dtype=jnp.bfloat16,
        quant_towers: str = "none",
        mesh: Optional[jax.sharding.Mesh] = None,
        encode_chunk: Optional[int] = mclip.DEFAULT_ENCODE_CHUNK,
    ):
        """``mesh``: shard query/corpus batches over the 'data' axis (params
        and DB replicated unless a sharded retriever is passed) — the
        serving scale-out path; per-chip throughput is the bench headline
        and the composed query is embarrassingly data-parallel.

        ``encode_chunk``: when a query batch is a multiple of this, the
        image encode runs in chunks of this size inside the encode program
        (encode peaks at b16 chunks on v5e — round-4 re-sweep — while
        retrieval/text-tower utilization grows with batch; the macro-batch
        schedule;
        together with the two-program split and the causal-prefix text
        buckets this serves ~794 q/s/chip bf16-exact at the flagship size,
        BENCH_NOTES.md round-4).  None disables chunking."""
        self.cfg = cfg
        from keds_tpu.models.convert import cast_floating
        from keds_tpu.ops.quant import maybe_quantize_clip

        # cast_floating probes dtype without fetching device leaves to host
        # (np.asarray on remote-resident params = GBs of sync transfer, and
        # a crash for leaves spanning non-addressable devices).
        self.clip_c = maybe_quantize_clip(
            cast_floating(clip_params, compute_dtype), quant_towers)
        self.heads = cast_floating(heads, compute_dtype)
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            self.clip_c = jax.device_put(self.clip_c, rep)
            self.heads = jax.device_put(self.heads, rep)
        self.db = db
        self.retriever = retriever or Retriever(db)
        self.db_topk = db_topk
        split_id = star_token_id()

        # Under a mesh the chunk loop moves INSIDE each shard (shard_map) so
        # scale-out keeps the two-program macro win; chunking the global
        # batch would reshape the sharded axis (BENCH_NOTES round-3
        # scale-out section, equality-tested in tests/test_engine.py).
        mesh_ = self.mesh

        def _enc_maybe_chunked(cp, images):
            if mesh_ is not None:
                return mclip.encode_image_chunked_mesh(cp, cfg, images,
                                                       encode_chunk, mesh_)
            return mclip.encode_image_chunked(cp, cfg, images, encode_chunk)

        @jax.jit
        def _encode(cp, images):
            f = _enc_maybe_chunked(cp, images)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        retr = self.retriever

        # The composed query runs as TWO programs per batch — encode, then
        # retrieval+fusion+compose — with the features staying on device
        # between them.  Fusing everything into one program measures ~15%
        # SLOWER on v5e (XLA's schedule for the merged HLO loses prefetch
        # overlap; 251 vs 216 ms per 128-query macro batch, BENCH_NOTES.md).
        @jax.jit
        def _enc_feats(cp, images):
            return _enc_maybe_chunked(cp, images)

        @jax.jit
        def _rest(cp, heads, db_img, db_txt, db_quant, f, text):
            ti, tt = retr.retrieve_features(
                f.astype(jnp.float32), k=db_topk, db_arrays=(db_img, db_txt),
                db_quant=db_quant,
            )
            tok = compose_pseudo_tokens(
                heads, f, ti.astype(f.dtype), tt.astype(f.dtype), train=False
            )
            out = mclip.encode_text_img_retrieval(cp, cfg, text, tok, split_id=split_id)
            return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

        self._encode = _encode
        self._enc_feats = _enc_feats
        self._rest = _rest
        self._rank_cache: dict = {}

    def _shard(self, x: jax.Array):
        if self.mesh is None:
            return x, x.shape[0]
        # Serving feeds (corpus dirs, query files) iterate identically on
        # every process — global-batch form, same reasoning as the
        # evaluators (per-rank shard_batch would duplicate rows and
        # misalign result names across hosts).
        from keds_tpu.parallel.mesh import shard_global_batch

        return shard_global_batch(self.mesh, x)

    # -- corpus -------------------------------------------------------------
    def encode_corpus(self, image_batches: Iterable) -> np.ndarray:
        """Encode target images into unit-norm features.  All batches are
        dispatched before any result is fetched (pipelined).  Fetches go
        through ``fetch_global`` so batch-sharded outputs also assemble on a
        multi-process mesh (identical single-host behavior)."""
        from keds_tpu.parallel.mesh import fetch_global

        outs = []
        for b in image_batches:
            x, n = self._shard(jnp.asarray(b))
            outs.append(self._encode(self.clip_c, x)[:n])
        return np.concatenate([fetch_global(o.astype(jnp.float32)) for o in outs])

    # Text-length buckets for the compose program (see bucket_text).
    TEXT_BUCKETS = TEXT_BUCKETS

    def _bucket_text(self, tx) -> "np.ndarray":
        # Multi-process-safe BECAUSE of the global-feed contract: every
        # process iterates the same full batch stream, so all ranks compute
        # the same bucket for each batch (contrast the train CLI's per-rank
        # feed, where own-template bucketing is single-process only).
        return bucket_text(tx, self.TEXT_BUCKETS)

    # -- queries ------------------------------------------------------------
    def _compose_device(self, image_batches: Sequence, text_batches: Sequence):
        """Dispatch the two-program composed query per batch; yields
        (device features (B_padded, D), real count)."""
        quant = self.retriever.quant_arrays()
        for im, tx in zip(image_batches, text_batches):
            xi, n = self._shard(jnp.asarray(im))
            xt, _ = self._shard(jnp.asarray(self._bucket_text(tx)))
            f = self._enc_feats(self.clip_c, xi)
            yield self._rest(
                self.clip_c, self.heads, self.db.image_db, self.db.text_db,
                quant, f, xt), n

    def compose_batch(self, images, text) -> Tuple[jax.Array, int]:
        """Composed features for ONE batch, left on device (for device-side
        ranking); returns (features incl. padding rows, real count)."""
        ((f, n),) = self._compose_device([images], [text])
        return f, n

    def compose(self, image_batches: Sequence, text_batches: Sequence) -> np.ndarray:
        """Composed query features for (reference image, prompt-with-*) pairs,
        pipelined across batches."""
        from keds_tpu.parallel.mesh import fetch_global

        outs = [f[:n] for f, n in self._compose_device(image_batches, text_batches)]
        return np.concatenate([fetch_global(o.astype(jnp.float32)) for o in outs])

    # -- device-side corpus ranking ------------------------------------------
    def corpus_to_device(self, corpus: np.ndarray) -> DeviceCorpus:
        """Place an encoded corpus in device HBM, row-sharded over the mesh
        (the serving analog of KnowledgeDB.shard_over).  Padding happens on
        host so the placement is a single host->global device_put (every
        process holds the full corpus, so the replicated-input form works
        across processes too)."""
        host = np.asarray(corpus, np.float32)
        n = int(host.shape[0])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            pad = (-n) % self.mesh.shape["data"]
            if pad:
                host = np.pad(host, ((0, pad), (0, 0)))
            arr = jax.device_put(host, NamedSharding(self.mesh, P("data", None)))
        else:
            arr = jnp.asarray(host)
        return DeviceCorpus(arr, n)

    def _rank_fn(self, topn: int, n_real: int):
        key = (topn, n_real, self.mesh is not None)
        if key not in self._rank_cache:
            if self.mesh is not None:
                mesh = self.mesh
                fn = jax.jit(lambda q, c: mips_topk_sharded(
                    q, c, topn, mesh, n_real=n_real))
            else:
                fn = jax.jit(lambda q, c: mips_topk(q, c, topn))
            self._rank_cache[key] = fn
        return self._rank_cache[key]

    def rank(self, q_feats: jax.Array, corpus: DeviceCorpus,
             topn: int = 10) -> Tuple[jax.Array, jax.Array]:
        """Top-``topn`` (scores, indices) of a device corpus for composed
        query features; everything stays on device (results are (B, topn))."""
        topn = min(topn, corpus.n_real)
        q = jnp.asarray(q_feats, jnp.float32)
        return self._rank_fn(topn, corpus.n_real)(q, corpus.array)

    def search(self, image_batches: Sequence, text_batches: Sequence,
               corpus: Union[np.ndarray, DeviceCorpus],
               topn: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        """Rank a corpus for every composed query; returns (scores, indices)
        of the top ``topn``.  A :class:`DeviceCorpus` ranks on device
        (only (B, topn) results cross the wire); a numpy corpus keeps the
        host path (fine at demo scale, equality-tested against the device
        path)."""
        if isinstance(corpus, DeviceCorpus):
            from keds_tpu.parallel.mesh import fetch_global

            ranked = [(*self.rank(f, corpus, topn), n)
                      for f, n in self._compose_device(image_batches, text_batches)]
            scores = np.concatenate([fetch_global(s)[:n] for s, _, n in ranked])
            idx = np.concatenate([fetch_global(i)[:n] for _, i, n in ranked])
            return scores, idx.astype(np.int64)
        q = self.compose(image_batches, text_batches)
        sims = q @ np.asarray(corpus, np.float32).T
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :topn]
        return np.take_along_axis(sims, idx, axis=1), idx
