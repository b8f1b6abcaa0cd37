"""Training losses for the two streams.

Both stream losses consume *precomputed* CLIP features (the reference trains
exclusively on precomputed CC3M features: ``images``/``caps`` already are
embeddings, ``src/trainer.py:48-50``) and run entirely inside one jitted,
data-parallel step:

* **image stream** (``get_loss_img2text_image``, src/trainer.py:44-165):
  retrieve top-16 neighbors -> dual-stream fusion -> 3 pseudo-tokens ->
  ``encode_text_img`` with the "a photo of" prompt -> symmetric InfoNCE
  between image features and composed text features over the **global**
  batch.

* **text stream** (``get_loss_img2text``, src/trainer.py:285-411):
  fusion without ``text_condition`` -> 2 pseudo-tokens -> splice into the
  caption's "other" template (``encode_text_img_train``) -> cosine loss vs
  the full-caption feature, plus 0.5x an extra cosine term built from the
  top-2 retrieved neighbor captions' templates.

Distributed-gradient parity: the reference all-gathers features (gradients
flow only through the local shard) and DDP-*averages* head gradients.  The
sum over ranks of local-path gradients of the identical full-matrix loss
equals the full gradient, so computing the global-batch loss under jit and
scaling by 1/num_shards reproduces the reference update exactly (PARITY.md).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from keds_tpu.models import clip as mclip
from keds_tpu.models.composition import FusionHeads, compose_pseudo_tokens


def _normalize(x: jax.Array) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def info_nce(image_features: jax.Array, text_features: jax.Array,
             logit_scale: jax.Array) -> jax.Array:
    """Symmetric cross-entropy over the full (B, B) similarity matrix with
    diagonal ground truth ((loss_img + loss_txt) / 2, src/trainer.py:132-164).
    Inputs must already be unit-norm."""
    logits = logit_scale * jnp.dot(
        image_features, text_features.T, preferred_element_type=jnp.float32
    )
    labels = jnp.arange(logits.shape[0])
    li = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    lt = -jnp.mean(jax.nn.log_softmax(logits.T, axis=1)[labels, labels])
    return (li + lt) / 2.0


def cosine_embedding_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """torch CosineEmbeddingLoss with target=1: mean(1 - cos(a, b))."""
    cos = jnp.sum(_normalize(a) * _normalize(b), axis=-1)
    return jnp.mean(1.0 - cos)


class TrainBatch(NamedTuple):
    """One precomputed-feature batch (reference CustomFolderCC rows,
    src/data.py:601-634).

    The three optional index fields carry PRECOMPUTED knowledge-DB neighbor
    rows (``tools/precompute_neighbors.py``): in features mode the queries
    are frozen CLIP embeddings, so the per-step search is a pure function of
    the sample and hoists offline — the step then gathers instead of
    searching (bit-identical training; the image-neighbor shuffle stays
    in-step).  ``None`` (the default) keeps the in-step search."""

    image_features: jax.Array      # (B, D) CLIP image embeddings
    caption_features: jax.Array    # (B, D) CLIP caption embeddings
    other_tokens: jax.Array        # (B, 77) tokenized "a photo of * * * {other}"
    img_idx: Optional[jax.Array] = None   # (B, k) image-DB neighbor rows
    txt_idx: Optional[jax.Array] = None   # (B, k) text-DB neighbor rows
    cap2_idx: Optional[jax.Array] = None  # (B, 2) caption neighbors (text stream)


class RawBatch(NamedTuple):
    """A raw (image, caption) batch from the tar-streaming pipeline; CLIP
    features are computed on the fly inside the jitted step (the reference's
    webdataset mode feeds raw tensors, src/data.py:938-953)."""

    images: jax.Array              # (B, H, W, 3) preprocessed images
    caption_tokens: jax.Array      # (B, 77)
    other_tokens: jax.Array        # (B, 77) templates (zeros if unavailable)


def encode_raw_batch(clip_params, cfg: mclip.ClipConfig, batch: RawBatch,
                     encode_chunk: int | None = None,
                     mesh=None) -> TrainBatch:
    """Frozen-CLIP feature computation for raw batches, under stop_gradient
    (the reference wraps this in torch.no_grad, src/trainer.py:48-52).
    uint8 images (the device-preprocess wire format) are normalized
    in-graph; float images pass through unchanged.

    ``encode_chunk``: run the image encode in b32 lax.map chunks — the same
    macro-batch schedule as the serving pipeline (encode peaks at b32 on
    v5e; +8.6% on the whole raw step at b128, 444 -> 482 samples/s,
    BENCH_NOTES round-4).  Under a multi-device ``mesh`` the chunk loop
    moves inside each shard via shard_map (chunking the global batch would
    reshape the sharded axis); shards smaller than the chunk fall back to
    one shot."""
    if mesh is not None and mesh.devices.size > 1:
        img = mclip.encode_image_chunked_mesh(clip_params, cfg, batch.images,
                                              encode_chunk, mesh)
    else:
        img = mclip.encode_image_chunked(clip_params, cfg, batch.images,
                                         encode_chunk)
    img = jax.lax.stop_gradient(img)
    txt = jax.lax.stop_gradient(mclip.encode_text(clip_params, cfg, batch.caption_tokens))
    return TrainBatch(
        image_features=img.astype(jnp.float32),
        caption_features=txt.astype(jnp.float32),
        other_tokens=batch.other_tokens,
    )


def image_stream_loss(
    heads: FusionHeads,
    clip_params: dict,
    cfg: mclip.ClipConfig,
    batch: TrainBatch,
    topk_image: jax.Array,
    topk_text: jax.Array,
    prompt_tokens: jax.Array,      # (1, 77) tokenize("a photo of")
    rng: Optional[jax.Array] = None,
    train: bool = True,
    dropout: float = 0.1,
) -> jax.Array:
    tokens = compose_pseudo_tokens(
        heads, batch.image_features, topk_image, topk_text,
        use_text_condition=True, rng=rng, train=train, dropout=dropout,
    )
    B = batch.image_features.shape[0]
    text = jnp.broadcast_to(prompt_tokens, (B, prompt_tokens.shape[1]))
    text_features = mclip.encode_text_img(clip_params, cfg, text, tokens)
    img = _normalize(batch.image_features)
    txt = _normalize(text_features)
    scale = jnp.exp(clip_params["logit_scale"])
    return info_nce(img, txt, scale)


def text_stream_loss(
    heads: FusionHeads,
    clip_params: dict,
    cfg: mclip.ClipConfig,
    batch: TrainBatch,
    topk_image: jax.Array,
    topk_text: jax.Array,
    top2_caption_features: jax.Array,   # (B, 2, D) retrieved neighbor captions
    top2_other_tokens: jax.Array,       # (B, 2, 77) their "other" templates
    split_id: int,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    dropout: float = 0.1,
) -> jax.Array:
    tokens = compose_pseudo_tokens(
        heads, batch.image_features, topk_image, topk_text,
        use_text_condition=False, rng=rng, train=train, dropout=dropout,
    )  # (B, 2, D)
    # Main term: splice into this sample's own "other" template and match the
    # full caption feature (src/trainer.py:315-318).
    own = mclip.encode_text_img_train(
        clip_params, cfg, batch.other_tokens, tokens, split_id=split_id
    )
    loss_main = cosine_embedding_loss(own, batch.caption_features)
    # Extra term: same pseudo-tokens spliced into the top-2 neighbors'
    # templates, matched against those neighbors' caption features
    # (src/trainer.py:321-329; weights 1.0 and 0.5 per :410).
    B, L, D = tokens.shape
    rep_tokens = jnp.repeat(tokens[:, None], 2, axis=1).reshape(2 * B, L, D)
    neigh_text = top2_other_tokens.reshape(2 * B, -1)
    neigh = mclip.encode_text_img_train(
        clip_params, cfg, neigh_text, rep_tokens, split_id=split_id
    )
    loss_extra = cosine_embedding_loss(neigh, top2_caption_features.reshape(2 * B, D))
    # NOTE: src/trainer.py:406-410 computes `loss` on the *extra* pair and
    # `extra_loss` on the own pair in the non-distributed branch but the
    # reverse in the distributed branch (:382-383); the distributed branch is
    # the trained configuration, so: own + 0.5 * extra.
    return loss_main + 0.5 * loss_extra
