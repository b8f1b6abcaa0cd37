"""Numerical parity between the JAX towers/heads and the reference torch model.

These tests *run* the reference implementation (imported from the mounted
checkout) on a small CLIP and compare outputs after weight conversion —
validating both the converter and the model math end-to-end.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from keds_tpu.models import clip as jclip
from keds_tpu.models import convert, heads

ATOL = 2e-4
RTOL = 2e-4

EOT = 49407
SOT = 49406


@pytest.fixture(scope="module")
def ref_model_mod(reference_src):
    sys.path.insert(0, str(reference_src))
    try:
        import model.model as ref_model
    finally:
        sys.path.pop(0)
    return ref_model


@pytest.fixture(scope="module")
def small_clip(ref_model_mod):
    torch.manual_seed(0)
    m = ref_model_mod.CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=128,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
    ).eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params, cfg = convert.clip_state_dict_to_pytree(sd)
    params = jax.tree.map(jnp.asarray, params)
    return m, params, cfg


def _rand_text(batch, seq_lens, rng):
    """Token rows shaped like real tokenize() output: SOT ... EOT 0-pad."""
    out = np.zeros((batch, 77), dtype=np.int64)
    for i, n in enumerate(seq_lens):
        out[i, 0] = SOT
        out[i, 1 : n - 1] = rng.integers(1, 49000, n - 2)
        out[i, n - 1] = EOT
    return out


def test_config_inference(small_clip):
    _, _, cfg = small_clip
    assert cfg.vision_layers == 2
    assert cfg.vision_width == 128
    assert cfg.vision_patch_size == 16
    assert cfg.transformer_width == 64
    assert cfg.transformer_layers == 2
    assert cfg.eot_id == EOT


def test_encode_image_parity(small_clip):
    m, params, cfg = small_clip
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((3, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = m.encode_image(torch.from_numpy(imgs)).numpy()
    ours = jclip.encode_image(params, cfg, jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=RTOL)


def test_encode_text_parity(small_clip):
    m, params, cfg = small_clip
    rng = np.random.default_rng(2)
    text = _rand_text(4, [5, 20, 77, 9], rng)
    with torch.no_grad():
        ref = m.encode_text(torch.from_numpy(text)).numpy()
    ours = jclip.encode_text(params, cfg, jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=RTOL)


def test_get_text_tokens_parity(small_clip):
    m, params, cfg = small_clip
    rng = np.random.default_rng(3)
    text = _rand_text(2, [6, 12], rng)
    with torch.no_grad():
        ref_x, ref_ci = m.get_text_tokens(torch.from_numpy(text))
    ours_x, ours_ci = jclip.get_text_tokens(params, cfg, jnp.asarray(text))
    np.testing.assert_array_equal(np.asarray(ours_ci), ref_ci.numpy())
    np.testing.assert_allclose(np.asarray(ours_x), ref_x.numpy(), atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("k", [2, 3])
def test_encode_text_img_retrieval_parity(small_clip, k):
    m, params, cfg = small_clip
    rng = np.random.default_rng(4)
    star_id = 265
    # One shared prompt row containing '*' (reference uses text[0]'s star pos).
    text = np.zeros((1, 77), dtype=np.int64)
    body = [SOT, 320, 1125, 539, star_id, 267, 1929, EOT]  # a photo of * , dog
    text[0, : len(body)] = body
    tokens = rng.standard_normal((5, k, 64), dtype=np.float32)
    with torch.no_grad():
        ref = m.encode_text_img_retrieval(
            torch.from_numpy(text), torch.from_numpy(tokens), split_ind=star_id, repeat=True
        ).numpy()
    ours = jclip.encode_text_img_retrieval(
        params, cfg, jnp.asarray(text), jnp.asarray(tokens), split_id=star_id
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=RTOL)


def test_encode_text_img_train_parity(small_clip):
    m, params, cfg = small_clip
    rng = np.random.default_rng(5)
    star_id = 265
    B, k = 4, 3
    text = np.zeros((B, 77), dtype=np.int64)
    for i in range(B):
        body = [SOT, 320, 1125, 539, star_id, star_id, star_id, 1929, 13376, EOT]
        text[i, : len(body)] = body
    tokens = rng.standard_normal((B, k, 64), dtype=np.float32)
    with torch.no_grad():
        ref = m.encode_text_img_train(
            torch.from_numpy(text), torch.from_numpy(tokens), split_ind=star_id
        ).numpy()
    ours = jclip.encode_text_img_train(
        params, cfg, jnp.asarray(text), jnp.asarray(tokens), split_id=star_id
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=RTOL)


def test_encode_text_img_equivalence_to_plain_encode(small_clip):
    """Splicing the token embeddings of real words before EOT must equal
    encoding the fully written-out prompt (validates splice + shifted pooling;
    the reference's committed encode_text_img has an off-by-one documented in
    PARITY.md)."""
    _, params, cfg = small_clip
    base = np.zeros((1, 77), dtype=np.int64)
    body = [SOT, 320, 1125, 539, EOT]  # "a photo of"
    base[0, : len(body)] = body
    full = np.zeros((1, 77), dtype=np.int64)
    words = [1929, 13376, 2368]
    full_body = [SOT, 320, 1125, 539, *words, EOT]
    full[0, : len(full_body)] = full_body
    tok_emb = params["text"]["tok_emb"]
    pseudo = tok_emb[jnp.asarray(words)][None, :, :]
    ours = jclip.encode_text_img(params, cfg, jnp.asarray(base), pseudo)
    expected = jclip.encode_text(params, cfg, jnp.asarray(full))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), atol=ATOL, rtol=RTOL)


def test_im2text_parity(ref_model_mod):
    torch.manual_seed(7)
    ref = ref_model_mod.IM2TEXT(embed_dim=96, middle_dim=64, output_dim=80, n_layer=2).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert.im2text_state_dict_to_pytree(sd)
    x = np.random.default_rng(8).standard_normal((5, 96), dtype=np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    ours = heads.im2text_apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=ATOL, rtol=RTOL)


def test_crossformer_parity(ref_model_mod):
    torch.manual_seed(9)
    ref = ref_model_mod.CrossFormer(q_dim=80, k_dim=80, v_dim=80, num_layers=3).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert.crossformer_state_dict_to_pytree(sd)
    rng = np.random.default_rng(10)
    q = rng.standard_normal((4, 1, 80), dtype=np.float32)
    kv = rng.standard_normal((4, 16, 80), dtype=np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv)).numpy()
    ours = heads.crossformer_apply(
        [jax.tree.map(jnp.asarray, p) for p in params], jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=ATOL, rtol=RTOL)


def test_clip_converter_roundtrip(small_clip):
    m, params, cfg = small_clip
    sd = convert.clip_pytree_to_state_dict(jax.tree.map(np.asarray, params), cfg)
    params2, cfg2 = convert.clip_state_dict_to_pytree(sd)
    assert cfg2 == cfg
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, a1), (p2, a2) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_pt_io_pure_reader_matches_torch(tmp_path, small_clip):
    from keds_tpu.io import pt as ptio

    m, _, _ = small_clip
    path = str(tmp_path / "ckpt.pt")
    obj = {
        "epoch": 3,
        "name": "exp",
        "state_dict": m.state_dict(),
        "nested": {"list": [torch.arange(5), torch.ones(2, 3, dtype=torch.float16)]},
    }
    torch.save(obj, path)
    pure = ptio.load_pt(path, use_torch="never")
    via_torch = ptio.load_pt(path, use_torch="always")
    assert pure["epoch"] == 3 and pure["name"] == "exp"
    for k in via_torch["state_dict"]:
        np.testing.assert_array_equal(pure["state_dict"][k], via_torch["state_dict"][k])
    np.testing.assert_array_equal(pure["nested"]["list"][0], np.arange(5))
    assert pure["nested"]["list"][1].dtype == np.float16


def test_pt_io_noncontiguous_tensor(tmp_path):
    from keds_tpu.io import pt as ptio

    path = str(tmp_path / "t.pt")
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    obj = {"sliced": base[:, ::2], "transposed": base.t()}
    torch.save(obj, path)
    pure = ptio.load_pt(path, use_torch="never")
    np.testing.assert_array_equal(pure["sliced"], base[:, ::2].numpy())
    np.testing.assert_array_equal(pure["transposed"], base.t().numpy())
