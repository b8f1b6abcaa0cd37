"""Trainable heads: pseudo-token mapper and knowledge-fusion cross-attention.

Functional rebuild of the reference heads (``src/model/model.py:37-146``):

* ``IM2TEXT`` — pic2word-style MLP mapping a CLIP image embedding into the
  text token space: n_layer x [Linear -> Dropout -> ReLU] + output Linear.
* ``CrossAttention`` — q/k/v linears into heads*dim_head inner size, scaled
  dot-product, output projection; deliberately NO residual, NO LayerNorm and
  NO FFN (exact reference math, model.py:56-79).
* ``CrossFormer`` — a stack of CrossAttention layers where the query is
  re-fed (model.py:98-101).  Instantiated twice per stream as
  ``retrieval_fuse`` / ``text_condition`` over the top-16 retrieved image /
  caption neighbors (src/main.py:151-152).

Dropout is explicit: pass ``rng`` and ``train=True`` to enable.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], train: bool) -> jax.Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# --------------------------------------------------------------------------
# IM2TEXT (and its mirror T2I — identical structure, reference model.py:125-146)
# --------------------------------------------------------------------------

def init_im2text(
    key: jax.Array,
    embed_dim: int = 768,
    middle_dim: int = 512,
    output_dim: int = 768,
    n_layer: int = 2,
    dropout: float = 0.1,
    dtype=jnp.float32,
) -> dict:
    """Kaiming-uniform init matching torch.nn.Linear defaults."""
    keys = jax.random.split(key, n_layer + 1)

    def linear(k, d_in, d_out):
        bound = 1.0 / math.sqrt(d_in)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
        }

    dims = [embed_dim] + [middle_dim] * n_layer
    return {
        "layers": [linear(keys[i], dims[i], dims[i + 1]) for i in range(n_layer)],
        "fc_out": linear(keys[-1], middle_dim, output_dim),
    }


def im2text_apply(
    params: dict,
    x: jax.Array,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    dropout: float = 0.1,
) -> jax.Array:
    """(..., embed_dim) -> (..., output_dim).

    ``dropout`` is a static rate (reference default 0.1, model.py:106); it and
    ``train`` must be Python values, not tracers.
    """
    rate = dropout
    n = len(params["layers"])
    rngs = jax.random.split(rng, n) if (train and rng is not None) else [None] * n
    for layer, r in zip(params["layers"], rngs):
        x = jnp.dot(x, layer["w"].astype(x.dtype)) + layer["b"].astype(x.dtype)
        x = _dropout(x, rate, r, train)
        x = jax.nn.relu(x)
    out = params["fc_out"]
    return jnp.dot(x, out["w"].astype(x.dtype)) + out["b"].astype(x.dtype)


# --------------------------------------------------------------------------
# CrossAttention / CrossFormer
# --------------------------------------------------------------------------

def init_crossattention(
    key: jax.Array,
    q_dim: int,
    k_dim: int,
    v_dim: int,
    heads: int = 8,
    dim_head: int = 64,
    dropout: float = 0.0,
    dtype=jnp.float32,
) -> dict:
    inner = heads * dim_head
    keys = jax.random.split(key, 4)

    def linear(k, d_in, d_out):
        bound = 1.0 / math.sqrt(d_in)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
        }

    return {
        "to_q": linear(keys[0], q_dim, inner),
        "to_k": linear(keys[1], k_dim, inner),
        "to_v": linear(keys[2], v_dim, inner),
        "to_out": linear(keys[3], inner, q_dim),
    }


def crossattention_apply(
    params: dict,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    dim_head: int = 64,
    dropout: float = 0.0,
) -> jax.Array:
    """q (B, Nq, Dq), k/v (B, Nk, Dk/Dv) -> (B, Nq, Dq).

    Exact reference math (model.py:56-79): scale = dim_head**-0.5 applied to
    the raw dot products; softmax over keys; no residual/LN.  Head count is
    derived statically from the projection width (inner // dim_head).
    """
    Dh = dim_head
    H = params["to_q"]["w"].shape[1] // Dh
    scale = Dh ** -0.5

    def proj(p, x):
        return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)

    B, Nq, _ = q.shape
    Nk = k.shape[1]
    qh = proj(params["to_q"], q).reshape(B, Nq, H, Dh).transpose(0, 2, 1, 3)
    kh = proj(params["to_k"], k).reshape(B, Nk, H, Dh).transpose(0, 2, 1, 3)
    vh = proj(params["to_v"], v).reshape(B, Nk, H, Dh).transpose(0, 2, 1, 3)
    dots = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Nq, H * Dh)
    out = proj(params["to_out"], out)
    return _dropout(out, dropout, rng, train)


def init_crossformer(
    key: jax.Array,
    q_dim: int,
    k_dim: int,
    v_dim: int,
    num_layers: int = 1,
    heads: int = 8,
    dim_head: int = 64,
    dropout: float = 0.0,
    dtype=jnp.float32,
) -> list:
    keys = jax.random.split(key, num_layers)
    return [
        init_crossattention(keys[i], q_dim, k_dim, v_dim, heads, dim_head, dropout, dtype)
        for i in range(num_layers)
    ]


def crossformer_apply(
    params: list,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    dim_head: int = 64,
    dropout: float = 0.0,
) -> jax.Array:
    n = len(params)
    rngs = jax.random.split(rng, n) if (train and rng is not None) else [None] * n
    for layer, r in zip(params, rngs):
        q = crossattention_apply(layer, q, k, v, r, train, dim_head=dim_head, dropout=dropout)
    return q


# T2I is structurally identical to IM2TEXT (reference model.py:125-146).
init_t2i = init_im2text
t2i_apply = im2text_apply
