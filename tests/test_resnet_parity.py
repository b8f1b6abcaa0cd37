"""ModifiedResNet tower parity vs the reference torch implementation."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from keds_tpu.models.resnet import encode_image_resnet, resnet_state_dict_to_pytree


@pytest.fixture(scope="module")
def ref_model_mod(reference_src):
    sys.path.insert(0, str(reference_src))
    try:
        import model.model as ref_model
    finally:
        sys.path.pop(0)
    return ref_model


def test_modified_resnet_parity(ref_model_mod):
    torch.manual_seed(0)
    m = ref_model_mod.CLIP(
        embed_dim=64,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),   # tuple -> ModifiedResNet branch
        vision_width=32,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=1,
    ).eval()
    # give BN stats non-trivial values
    with torch.no_grad():
        for mod in m.visual.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    visual, meta = resnet_state_dict_to_pytree(sd)
    assert meta["vision_layers"] == (1, 1, 1, 1)
    assert meta["image_resolution"] == 64
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref = m.visual(torch.from_numpy(imgs)).numpy()
    params = {"visual": jax.tree.map(jnp.asarray, visual)}
    ours = encode_image_resnet(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                               num_heads=meta["vision_heads"])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=5e-4)

    # unified path: full state-dict conversion + dispatch + roundtrip
    from keds_tpu.models import clip as jclip, convert

    params_full, cfg = convert.clip_state_dict_to_pytree(sd)
    assert not cfg.is_vit
    assert cfg.vision_layers == (1, 1, 1, 1)
    params_full = jax.tree.map(jnp.asarray, params_full)
    ours2 = jclip.encode_image(params_full, cfg, jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours2), ref, atol=5e-4, rtol=5e-4)
    # text tower still works with the RN visual attached
    text = np.zeros((2, 77), dtype=np.int64)
    text[:, 0] = 49406
    text[:, 1] = 49407
    with torch.no_grad():
        ref_t = m.encode_text(torch.from_numpy(text)).numpy()
    ours_t = jclip.encode_text(params_full, cfg, jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(ours_t), ref_t, atol=5e-4, rtol=5e-4)
    # roundtrip back to a torch-loadable state dict
    sd2 = convert.clip_pytree_to_state_dict(jax.tree.map(np.asarray, params_full), cfg)
    m.load_state_dict({k: torch.as_tensor(v) for k, v in sd2.items()})
