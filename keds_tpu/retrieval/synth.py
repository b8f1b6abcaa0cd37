"""Synthetic embedding corpora with *realistic* CLIP-feature geometry.

Round-2 review finding (VERDICT weak #4): every quantization/ANN accuracy
number in this repo was measured on i.i.d. Gaussian unit vectors — the EASY
case for both per-row int8 and ``approx_max_k``, because scores are spread
out and the top-k gaps are wide.  Real CLIP features are nothing like that:

* they occupy a **narrow cone** (the per-modality mean direction carries a
  large share of every embedding — the "modality gap" geometry; mean
  pairwise cosine within a modality is ~0.4-0.6 for image corpora),
* they are **clustered** (images of the same scene/class collapse toward
  shared directions), and
* their spectrum is **anisotropic** (variance decays like a power law over
  principal directions rather than spreading evenly).

All three compress the score distribution: the gap between the k-th and
(k+1)-th neighbor shrinks toward the quantization / approximation noise
floor, which is exactly where int8 grids and partial-reduce ANN start
flipping neighbors.  :func:`correlated_embeddings` generates corpora with
those properties, with one knob (``spread``) controlling how tight the
clusters are:

* ``spread=0.35`` — matches measured CLIP-corpus statistics (mean pairwise
  cosine ~0.49),
* ``spread=0.15`` — tighter than real corpora (adversarial),
* ``spread=0.05`` — near-duplicate regime (every row within a cluster is
  almost identical; the hardest meaningful case).

Used by ``tools/quant_accuracy.py`` (the TPU measurement harness behind the
BENCH_NOTES accuracy tables) and the correlated-data regression tests.
"""

from __future__ import annotations

import numpy as np


def correlated_embeddings(
    rng: np.random.Generator,
    n: int,
    dim: int,
    *,
    n_clusters: int = 64,
    alpha: float = 1.0,
    cone: float = 1.0,
    spread: float = 0.35,
    basis: tuple | None = None,
) -> np.ndarray:
    """Unit-norm (n, dim) float32 embeddings: shared cone direction +
    cluster centers + power-law anisotropic within-cluster noise.

    ``basis`` lets callers draw queries and corpus from the SAME geometry —
    pass a :func:`shared_geometry` result; by default a fresh
    cone/basis/centers set is drawn from ``rng``.
    """
    if basis is None:
        basis = shared_geometry(rng, dim, n_clusters=n_clusters, alpha=alpha)
    mu, U, lam, centers = basis
    assign = rng.integers(0, len(centers), n)
    noise = (rng.standard_normal((n, dim)) * lam) @ U.T
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    x = cone * mu[None, :] + centers[assign] + spread * noise
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def shared_geometry(rng: np.random.Generator, dim: int, *,
                    n_clusters: int = 64, alpha: float = 1.0):
    """Draw the (cone, basis, spectrum, centers) tuple once so corpus and
    queries share clusters — queries landing inside corpus clusters is what
    makes retrieval hard; independent geometries would decorrelate them."""
    lam = np.arange(1, dim + 1, dtype=np.float64) ** -alpha
    U = np.linalg.qr(rng.standard_normal((dim, dim)))[0]
    mu = rng.standard_normal(dim)
    mu /= np.linalg.norm(mu)
    centers = (rng.standard_normal((n_clusters, dim)) * lam) @ U.T
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    return mu, U, lam, centers


def inject_outlier_channels(params: dict, *, towers=("visual", "text"),
                            n_channels: int = 4, magnitude: float = 20.0,
                            seed: int = 4) -> dict:
    """Return a copy of a CLIP param pytree with ``n_channels`` random MLP
    hidden channels scaled by ``magnitude`` (and the matching proj rows
    shrunk to keep output magnitudes sane).

    Trained transformers develop a few huge-magnitude hidden channels — the
    classic per-token-int8 hazard; random-init weights have none, which
    flatters quantization.  The resulting outlier model is its own f32
    reference: quantization accuracy is measured against ITS outputs.
    Shared by ``tools/quant_accuracy.py`` and the regression tests so the
    recipe the BENCH_NOTES tables describe is the one the tests pin."""
    import jax.numpy as jnp

    out = dict(params)
    for tower in towers:
        blocks = dict(out[tower]["blocks"])
        fc = np.array(blocks["fc_w"], np.float32)   # mutable copies
        pj = np.array(blocks["proj_w"], np.float32)
        cols = np.random.default_rng(seed).integers(0, fc.shape[-1], n_channels)
        fc[..., cols] *= magnitude
        pj[..., cols, :] /= magnitude
        dtype = np.asarray(blocks["fc_w"]).dtype
        out[tower] = {**out[tower],
                      "blocks": {**blocks, "fc_w": jnp.asarray(fc, dtype),
                                 "proj_w": jnp.asarray(pj, dtype)}}
    return out


def structured_images(rng: np.random.Generator, n: int, res: int) -> np.ndarray:
    """(n, res, res, 3) float32 images with natural-image statistics rather
    than i.i.d. pixel noise: low-frequency sinusoid mixtures + smooth color
    gradients + a few sharp blobs.  Tower activations on these are spatially
    correlated (like real photos), which is the regime where per-token
    activation quantization actually gets exercised — white noise spreads
    activation mass evenly and hides outlier behaviour."""
    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing="ij")
    out = np.empty((n, res, res, 3), np.float32)
    for i in range(n):
        img = np.zeros((res, res, 3), np.float32)
        for _ in range(4):  # low-frequency sinusoid mixture
            fx, fy = rng.uniform(0.5, 4, 2)
            ph = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(0.2, 0.6)
            wave = np.sin(2 * np.pi * (fx * xx + fy * yy) + ph) * amp
            img += wave[:, :, None] * rng.uniform(0.3, 1.0, 3)
        gx, gy = rng.uniform(-1, 1, 2)  # smooth gradient
        img += (gx * xx + gy * yy)[:, :, None] * rng.uniform(0.2, 0.8, 3)
        for _ in range(rng.integers(1, 4)):  # sharp blobs
            cx, cy = rng.uniform(0.2, 0.8, 2)
            r2 = (xx - cx) ** 2 + (yy - cy) ** 2
            img += np.exp(-r2 / rng.uniform(0.002, 0.02))[:, :, None] \
                * rng.uniform(-1.5, 1.5, 3)
        out[i] = img
    out -= out.mean(axis=(1, 2, 3), keepdims=True)
    out /= out.std(axis=(1, 2, 3), keepdims=True) + 1e-6
    return out
