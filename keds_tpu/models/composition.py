"""Dual-stream knowledge-fusion composition (the core KEDs primitive).

Given a CLIP image embedding and its retrieved top-k bi-modality neighbors,
produce the pseudo-token sequence that gets spliced into the text prompt
(reference: the fusion block repeated in ``src/trainer.py:59-72`` and every
evaluator, e.g. ``src/eval_utils.py:661-672``):

    mapped  = IM2TEXT(image_embedding)
    fused   = retrieval_fuse(mapped[:,None], IM2TEXT(topk_image_neighbors))
    cond    = text_condition(mapped[:,None], IM2TEXT(topk_text_neighbors))
    tokens  = concat([fused, cond, mapped[:,None]])        # image stream, K=3
    tokens  = concat([fused, mapped[:,None]])              # text stream,  K=2
                                                            (trainer.py:305-311,
                                                             eval_utils.py:947-950)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from keds_tpu.models.heads import crossformer_apply, im2text_apply


class FusionHeads(NamedTuple):
    """The three trainable modules of one stream (src/main.py:147-152)."""

    img2text: dict
    retrieval_fuse: list
    text_condition: list


def compose_pseudo_tokens(
    heads: FusionHeads,
    image_features: jax.Array,      # (B, D)
    topk_image: jax.Array,          # (B, K, D)
    topk_text: jax.Array,           # (B, K, D)
    use_text_condition: bool = True,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    dropout: float = 0.1,
) -> jax.Array:
    """Returns the pseudo-token sequence (B, 3, D) — or (B, 2, D) when
    ``use_text_condition`` is False (text stream / Fashion-IQ eval)."""
    if train and rng is not None:
        r_map, r_img, r_txt, r_rf, r_tc = jax.random.split(rng, 5)
    else:
        r_map = r_img = r_txt = r_rf = r_tc = None
    mapped = im2text_apply(heads.img2text, image_features, r_map, train, dropout)
    ti = im2text_apply(heads.img2text, topk_image, r_img, train, dropout)
    q = mapped[:, None, :]
    fused = crossformer_apply(heads.retrieval_fuse, q, ti, ti, r_rf, train)
    parts = [fused]
    if use_text_condition:
        tt = im2text_apply(heads.img2text, topk_text, r_txt, train, dropout)
        cond = crossformer_apply(heads.text_condition, q, tt, tt, r_tc, train)
        parts.append(cond)
    parts.append(q)
    return jnp.concatenate(parts, axis=1)
