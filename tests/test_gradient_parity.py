"""End-to-end training-gradient parity vs torch autograd.

Builds the full differentiable pipeline — IM2TEXT map, dual CrossFormer
fusion, pseudo-token splice into the frozen text tower, InfoNCE — once with
the reference torch modules (autograd) and once with our jax functions
(jax.grad), with identical converted weights and identical inputs, and
compares the gradients of every head parameter.

The splice uses ``encode_text_img_train`` (3 in-place placeholder slots),
the one composed-text encoder that is well-defined in the committed
reference (PARITY.md items 1/7 document why the others are not runnable
there).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from keds_tpu.models import clip as jclip, convert, heads as jheads
from keds_tpu.models.composition import FusionHeads, compose_pseudo_tokens
from keds_tpu.train.losses import info_nce

D = 64
SPLIT = 265
EOT = 49407
SOT = 49406


def test_head_gradients_match_torch_autograd(reference_src):
    sys.path.insert(0, str(reference_src))
    try:
        import model.model as ref_model
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    m = ref_model.CLIP(
        embed_dim=D, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=D, transformer_heads=1, transformer_layers=2,
    ).eval()
    i2t = ref_model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D, n_layer=2).train(False)
    rf = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    tc = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    for p in m.parameters():
        p.requires_grad_(False)

    # shared inputs
    rng = np.random.default_rng(0)
    B, K = 6, 16
    feats = rng.standard_normal((B, D)).astype(np.float32)
    topk_img = rng.standard_normal((B, K, D)).astype(np.float32)
    topk_txt = rng.standard_normal((B, K, D)).astype(np.float32)
    text = np.zeros((B, 77), dtype=np.int64)
    body = [SOT, 320, 1125, 539, SPLIT, SPLIT, SPLIT, 1929, EOT]
    text[:, : len(body)] = body

    # ---- torch forward/backward ------------------------------------------
    tf = torch.from_numpy(feats)
    t_ti = torch.from_numpy(topk_img)
    t_tt = torch.from_numpy(topk_txt)
    mapped = i2t(tf)
    ti = i2t(t_ti)
    tt = i2t(t_tt)
    fused = rf(mapped.unsqueeze(1), ti, ti)
    cond = tc(mapped.unsqueeze(1), tt, tt)
    tokens = torch.cat([fused, cond, mapped.unsqueeze(1)], dim=1)
    txt_feat = m.encode_text_img_train(torch.from_numpy(text), tokens, split_ind=SPLIT)
    imgn = tf / tf.norm(dim=-1, keepdim=True)
    txtn = txt_feat / txt_feat.norm(dim=-1, keepdim=True)
    scale = m.logit_scale.exp().detach()
    logits = scale * imgn @ txtn.t()
    labels = torch.arange(B)
    loss_t = (torch.nn.functional.cross_entropy(logits, labels)
              + torch.nn.functional.cross_entropy(logits.t(), labels)) / 2
    loss_t.backward()

    # ---- jax forward/backward --------------------------------------------
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    clip_params, cfg = convert.clip_state_dict_to_pytree(sd)
    clip_params = jax.tree.map(jnp.asarray, clip_params)
    heads = FusionHeads(
        img2text=convert.im2text_state_dict_to_pytree(
            {k: v.numpy() for k, v in i2t.state_dict().items()}),
        retrieval_fuse=convert.crossformer_state_dict_to_pytree(
            {k: v.numpy() for k, v in rf.state_dict().items()}),
        text_condition=convert.crossformer_state_dict_to_pytree(
            {k: v.numpy() for k, v in tc.state_dict().items()}),
    )
    heads = jax.tree.map(jnp.asarray, heads)

    def loss_fn(heads):
        tokens = compose_pseudo_tokens(
            heads, jnp.asarray(feats), jnp.asarray(topk_img), jnp.asarray(topk_txt),
            use_text_condition=True, train=False,
        )
        txt = jclip.encode_text_img_train(clip_params, cfg, jnp.asarray(text),
                                          tokens, split_id=SPLIT)
        img = jnp.asarray(feats)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return info_nce(img, txt, jnp.exp(clip_params["logit_scale"]))

    loss_j, grads = jax.value_and_grad(loss_fn)(heads)
    assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-4)

    # ---- compare gradients per parameter ----------------------------------
    def torch_grads_as_pytree():
        g_i2t = {k: v.grad.numpy() for k, v in i2t.named_parameters()}
        g_rf = {k: v.grad.numpy() for k, v in rf.named_parameters()}
        g_tc = {k: v.grad.numpy() for k, v in tc.named_parameters()}
        # converters transpose Linear weights exactly like the forward ones
        return FusionHeads(
            img2text=convert.im2text_state_dict_to_pytree(g_i2t),
            retrieval_fuse=convert.crossformer_state_dict_to_pytree(g_rf),
            text_condition=convert.crossformer_state_dict_to_pytree(g_tc),
        )

    expected = torch_grads_as_pytree()
    flat_e = jax.tree_util.tree_leaves_with_path(expected)
    flat_g = jax.tree_util.tree_leaves_with_path(grads)
    assert len(flat_e) == len(flat_g)
    for (pe, ge), (pg, gj) in zip(flat_e, flat_g):
        assert pe == pg
        np.testing.assert_allclose(
            np.asarray(gj), ge, atol=5e-5, rtol=5e-4,
            err_msg=f"gradient mismatch at {pe}",
        )
