"""Multi-step training-trajectory parity vs the reference's own ``train()``.

Runs the reference's committed epoch loop (``src/trainer.py:414-509``, torch
on CPU, world-size-1 gloo process group so the *trained* ``distributed and
aggregate`` loss branch is live) and our jitted train loop
(``keds_tpu/train/trainer.py``) on the SAME converted weights, SAME batches,
SAME knowledge DB and SAME AdamW + cosine-warmup hyperparameters, then
asserts the per-step loss trajectory and the final head parameters match.

This pins everything the single-step gradient-parity test cannot: the
in-step retrieval indices, the LR schedule as consumed by the optimizer, the
AdamW update rule (incl. the bias/weight decay split), and the multi-step
dynamics of the full image-stream recipe.

The committed reference train path cannot run at all; the trajectory run
applies exactly the two repairs already documented in PARITY.md, nothing
else, and each is proven crash-first:

* ``train()`` references ``end`` before assignment and raises ``NameError``
  on its very first batch (PARITY.md item 2) — repaired by initializing
  ``end`` before the loop;
* ``encode_text_img`` is left configured for K=2 pseudo-tokens (trim ``-2``,
  pool at ``collect_ind+2``) while training feeds K=3, which raises at the
  77-wide positional embedding (PARITY.md item 1) — repaired to trim 3 and
  pool at the shifted EOT (``collect_ind+3``), the evident intent shown by
  the commented-out K∈{1,3} variants around ``src/model/model.py:763-776``.

Dropout is disabled on both sides (torch heads in eval mode / our
``dropout=0.0``): torch and JAX draw different masks.  The image-side
neighbor shuffle differs by RNG too, but CrossAttention is permutation-
invariant over keys/values (tests/test_retrieval.py), so it cancels.

The reference's unimportable corners (faiss/wandb/torchvision/ftfy) are
import-time stand-ins as in test_recall_parity.py; the faiss index is
duck-typed exact numpy top-k.
"""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from keds_tpu import tokenizer as jtok  # noqa: E402
from keds_tpu.models import convert  # noqa: E402
from keds_tpu.models.composition import FusionHeads  # noqa: E402
from keds_tpu.retrieval.database import KnowledgeDB, Retriever  # noqa: E402
from keds_tpu.train.losses import TrainBatch  # noqa: E402
from keds_tpu.train.trainer import make_optimizer, make_train_step  # noqa: E402

try:
    jtok.tokenize("probe")
    _TOK = True
except Exception:  # pragma: no cover - environment without the vocab blob
    _TOK = False

pytestmark = pytest.mark.skipif(not _TOK, reason="BPE vocab not available")

D = 64
B = 6
N_DB = 40
K = 16
EPOCHS = 2
STEPS_PER_EPOCH = 3
LR, B1, B2, EPS, WD, WARMUP = 1e-3, 0.9, 0.98, 1e-6, 0.1, 2


def _stub(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _FlatIndex:
    """Duck-typed faiss index: exact top-k by inner product (the reference
    only consumes the indices, src/trainer.py:213,221)."""

    def __init__(self, base: torch.Tensor):
        self.base = np.asarray(base, np.float32)

    def search(self, q: np.ndarray, k: int):
        sims = np.asarray(q, np.float32) @ self.base.T
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(sims, idx, axis=1), idx


class _CudaShim:
    """get_loss_* moves retrieved neighbors/prompt tokens with UNGUARDED
    .cuda() calls (src/trainer.py:55-56,170) that torch-cpu cannot satisfy."""

    def __enter__(self):
        self._orig = torch.Tensor.cuda
        torch.Tensor.cuda = lambda t, *a, **k: t
        return self

    def __exit__(self, *exc):
        torch.Tensor.cuda = self._orig


class _Wrap(torch.nn.Module):
    """train() unwraps DDP via ``model.module`` when args.distributed."""

    def __init__(self, m):
        super().__init__()
        self.module = m


@pytest.fixture(scope="module")
def ref_trainer(reference_src, tmp_path_factory):
    """Import the reference trainer twice: verbatim (to prove the committed
    first-batch NameError) and with PARITY.md item 2's one-line repair
    (``end`` initialized before the loop) for the trajectory run."""
    scratch = tmp_path_factory.mktemp("ref_trainer_cwd")
    for f in ("cc_subject.json", "cc_other.json"):
        (scratch / f).write_text("{}")

    import packaging as _packaging
    import packaging.version  # noqa: F401 - bind the submodule attribute

    _stub("pkg_resources", packaging=_packaging)
    _stub("ftfy", fix_text=lambda s: s)
    _stub("faiss")
    _stub("wandb", log=lambda *a, **k: None)

    class _T:  # torchvision stand-ins; the train path never calls them
        def __init__(self, *a, **k):
            pass

    _stub("torchvision")
    _stub("torchvision.transforms", Compose=_T, Resize=_T, CenterCrop=_T,
          ToTensor=_T, Normalize=_T, RandomResizedCrop=_T,
          InterpolationMode=SimpleNamespace(BICUBIC=3))
    _stub("torchvision.transforms.functional")
    _stub("torchvision.utils", save_image=lambda *a, **k: None)
    tv = sys.modules["torchvision"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.transforms.functional = sys.modules["torchvision.transforms.functional"]
    tv.utils = sys.modules["torchvision.utils"]

    src_file = reference_src / "trainer.py"
    src_text = src_file.read_text()
    # train()'s loop prologue (the first occurrence; save_feature's later
    # loop already initializes `end` itself, src/trainer.py:519).
    target = "    i = 0\n    for batch in dataloader:"
    assert target in src_text, "reference trainer.py layout changed"
    patched_text = src_text.replace(
        target, "    end = time.time()\n" + target, 1)

    def load(text: str, name: str):
        mod = types.ModuleType(name)
        mod.__file__ = str(src_file)
        cwd = os.getcwd()
        os.chdir(scratch)
        sys.path.insert(0, str(reference_src))
        try:
            exec(compile(text, str(src_file), "exec"), mod.__dict__)
        finally:
            sys.path.pop(0)
            os.chdir(cwd)
        return mod

    verbatim = load(src_text, "ref_trainer_verbatim")
    patched = load(patched_text, "ref_trainer_patched")
    sys.path.insert(0, str(reference_src))
    try:
        from third_party.open_clip.scheduler import cosine_lr as ref_cosine_lr
    finally:
        sys.path.pop(0)
    return SimpleNamespace(verbatim=verbatim, patched=patched,
                           cosine_lr=ref_cosine_lr)


@pytest.fixture(scope="module")
def world1_pg(tmp_path_factory):
    """World-size-1 gloo group: the reference's trained loss branch
    (``args.distributed and args.aggregate``) calls dist.all_gather; the
    non-distributed branch is dead code (NameError on
    ``other_embedded_features``, src/trainer.py:159 — PARITY.md)."""
    import torch.distributed as dist

    created = False
    if not dist.is_initialized():
        store = tmp_path_factory.mktemp("pg") / "store"
        dist.init_process_group("gloo", init_method=f"file://{store}",
                                world_size=1, rank=0)
        created = True
    yield
    if created:
        dist.destroy_process_group()


def _patched_encode_text_img_train(self, text, img_tokens, split_ind=4,
                                   repeat=True):
    """src/model/model.py:853-881 with PARITY.md item 7's repair: the
    committed tail resumes at ``ind_insert+3`` regardless of the pseudo-token
    count, so the text stream's K=2 fusions yield a 76-long sequence that
    raises at the positional embedding.  Resume at ``ind_insert+K`` —
    replace-in-place, the single hardcoded ``3`` generalized; for the K=3
    image-stream template this is byte-identical to the committed body."""
    x = self.token_embedding(text).type(self.dtype)
    collect_ind = text == self.end_id
    collect_ind = collect_ind.nonzero()[:, 1]
    ind_insert = text[0] == split_ind
    ind_insert = ind_insert.nonzero()[0]
    k = img_tokens.shape[1]
    x = torch.cat([x[:, :ind_insert], img_tokens, x[:, ind_insert + k:]],
                  dim=1)
    x = x + self.positional_embedding.type(self.dtype)
    x = x.permute(1, 0, 2)
    x = self.transformer(x)
    x = x.permute(1, 0, 2)
    x = self.ln_final(x).type(self.dtype)
    x = x[torch.arange(x.size(0)), collect_ind] @ self.text_projection
    return x


def _patched_encode_text_img(self, text, img_tokens):
    """src/model/model.py:756-777 with PARITY.md item 1's repair: the
    committed body trims 2 tail positions and pools at ``collect_ind+2``
    (the K=2 configuration) while the train path inserts K=3 pseudo-tokens —
    a 78-long sequence that raises at the positional embedding.  Trim K=3
    and pool at the shifted EOT instead; everything else is verbatim."""
    x = self.token_embedding(text).type(self.dtype)
    collect_ind = text == self.end_id
    collect_ind = collect_ind.nonzero()[:, 1]
    x = torch.cat([x[:, :collect_ind[0]], img_tokens,
                   x[:, collect_ind[0]:-3]], dim=1)
    x = x + self.positional_embedding.type(self.dtype)
    x = x.permute(1, 0, 2)
    x = self.transformer(x)
    x = x.permute(1, 0, 2)
    x = self.ln_final(x).type(self.dtype)
    x = x[torch.arange(x.size(0)), collect_ind + 3] @ self.text_projection
    return x


def _build_models(reference_src, repair_encode_text_img=True):
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
    for p in m.parameters():
        p.requires_grad_(False)
    if repair_encode_text_img:
        m.encode_text_img = types.MethodType(_patched_encode_text_img, m)
        m.encode_text_img_train = types.MethodType(
            _patched_encode_text_img_train, m)
    i2t = ref_model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D,
                            n_layer=2).eval()  # dropout off on both sides
    rf = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    tc = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    return m, i2t, rf, tc


def _make_data(seed=1):
    rng = np.random.default_rng(seed)

    def unit(a):
        return a / np.linalg.norm(a, axis=-1, keepdims=True)

    db_img = unit(rng.standard_normal((N_DB, D)).astype(np.float32))
    db_txt = unit(rng.standard_normal((N_DB, D)).astype(np.float32))
    batches = []
    for _ in range(STEPS_PER_EPOCH):
        feats = rng.standard_normal((B, D)).astype(np.float32)
        caps = rng.standard_normal((B, D)).astype(np.float32)
        batches.append((feats, caps))
    return db_img, db_txt, batches


def _ref_args():
    return SimpleNamespace(
        distributed=True, aggregate=True, dp=False, gpu=None,
        precision="fp32", use_debiased_sampler=False, wandb=False,
        world_size=1, rank=0,
    )


class _Loader:
    def __init__(self, batches):
        self._batches = batches
        self.num_batches = len(batches)
        self.num_samples = sum(len(b[0]) for b in batches)

    def __iter__(self):
        return iter(self._batches)


def _ref_optimizer(i2t, rf, tc):
    """Exactly src/main.py:215-235."""
    exclude = lambda n: ("bn" in n or "ln" in n or "bias" in n  # noqa: E731
                         or "logit_scale" in n)
    named = (list(i2t.named_parameters()) + list(rf.named_parameters())
             + list(tc.named_parameters()))
    gain_or_bias = [p for n, p in named if exclude(n) and p.requires_grad]
    rest = [p for n, p in named if not exclude(n) and p.requires_grad]
    return torch.optim.AdamW(
        [{"params": gain_or_bias, "weight_decay": 0.0},
         {"params": rest, "weight_decay": WD}],
        lr=LR, betas=(B1, B2), eps=EPS)


def _ref_torch_batches(batches):
    out = []
    for feats, caps in batches:
        subject = ["s"] * len(feats)
        other = ["o"] * len(feats)
        out.append((torch.from_numpy(feats.copy()),
                    torch.from_numpy(caps.copy()), subject, other))
    return out


def test_committed_train_crashes_on_first_batch(ref_trainer, reference_src,
                                                world1_pg):
    """Executable proof of PARITY.md item 2: the committed train() raises
    NameError (unbound ``end``) before computing anything on batch 1."""
    m, i2t, rf, tc = _build_models(reference_src)
    db_img, db_txt, batches = _make_data()
    database = (torch.from_numpy(db_img), torch.from_numpy(db_txt),
                [str(i) for i in range(N_DB)],
                _FlatIndex(torch.from_numpy(db_img)),
                _FlatIndex(torch.from_numpy(db_txt)))
    data = {"train": SimpleNamespace(dataloader=_Loader(_ref_torch_batches(batches)),
                                     sampler=None, set_epoch=lambda e: None)}
    optimizer = _ref_optimizer(i2t, rf, tc)
    scheduler = ref_trainer.cosine_lr(optimizer, LR, WARMUP,
                                      STEPS_PER_EPOCH * EPOCHS)
    with _CudaShim():
        with pytest.raises(NameError):
            ref_trainer.verbatim.train(_Wrap(m), i2t, rf, tc, data, 0,
                                       optimizer, None, scheduler, _ref_args(),
                                       tb_writer=None, database=database)


def test_committed_encode_text_img_crashes_on_k3(reference_src):
    """Executable proof of PARITY.md item 1: the committed encode_text_img
    (trim -2 / pool +2, the K=2 configuration) raises on the K=3 pseudo-token
    batch that the image-stream train path feeds it (src/trainer.py:69-74)."""
    m, _, _, _ = _build_models(reference_src, repair_encode_text_img=False)
    text = torch.from_numpy(np.asarray(jtok.tokenize("a photo of")))
    text = text.to(torch.long).repeat(B, 1)
    tokens = torch.randn(B, 3, D)
    with pytest.raises(RuntimeError, match="must match"):
        m.encode_text_img(text, tokens)


def test_trajectory_matches_reference_train(ref_trainer, reference_src,
                                            world1_pg):
    m, i2t, rf, tc = _build_models(reference_src)
    db_img, db_txt, batches = _make_data()

    # ---- reference: its own train(), one call per epoch (src/main.py:316) --
    tmod = ref_trainer.patched
    database = (torch.from_numpy(db_img), torch.from_numpy(db_txt),
                [str(i) for i in range(N_DB)],
                _FlatIndex(torch.from_numpy(db_img)),
                _FlatIndex(torch.from_numpy(db_txt)))
    data = {"train": SimpleNamespace(dataloader=_Loader(_ref_torch_batches(batches)),
                                     sampler=None, set_epoch=lambda e: None)}
    optimizer = _ref_optimizer(i2t, rf, tc)
    total_steps = STEPS_PER_EPOCH * EPOCHS
    scheduler = ref_trainer.cosine_lr(optimizer, LR, WARMUP, total_steps)

    ref_losses = []
    orig_loss = tmod.get_loss_img2text_image

    def recorder(*a, **k):
        out = orig_loss(*a, **k)
        ref_losses.append(float(out.detach()))
        return out

    tmod.get_loss_img2text_image = recorder
    try:
        with _CudaShim():
            for epoch in range(EPOCHS):
                tmod.train(_Wrap(m), i2t, rf, tc, data, epoch, optimizer,
                           None, scheduler, _ref_args(), tb_writer=None,
                           database=database)
    finally:
        tmod.get_loss_img2text_image = orig_loss
    assert len(ref_losses) == total_steps

    # ---- ours: the jitted step over the identical inputs -------------------
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    clip_params, ccfg = convert.clip_state_dict_to_pytree(sd)
    clip_params = jax.tree.map(jnp.asarray, clip_params)
    # heads were just trained by the reference — convert their INITIAL state
    # from a fresh rebuild with the same seeds
    m2, i2t0, rf0, tc0 = _build_models(reference_src)
    heads = FusionHeads(
        img2text=convert.im2text_state_dict_to_pytree(
            {k: v.numpy() for k, v in i2t0.state_dict().items()}),
        retrieval_fuse=convert.crossformer_state_dict_to_pytree(
            {k: v.numpy() for k, v in rf0.state_dict().items()}),
        text_condition=convert.crossformer_state_dict_to_pytree(
            {k: v.numpy() for k, v in tc0.state_dict().items()}),
    )
    heads = jax.tree.map(jnp.asarray, heads)
    db = KnowledgeDB.from_arrays(db_img, db_txt, dtype=jnp.float32,
                                 normalize=False)
    retriever = Retriever(db)
    cfg = SimpleNamespace(lr=LR, warmup=WARMUP, beta1=B1, beta2=B2, eps=EPS,
                          wd=WD, skip_scheduler=False)
    opt, schedule = make_optimizer(cfg, total_steps)
    opt_state = opt.init(heads)
    step = make_train_step(
        clip_params, ccfg, retriever, opt, stream="image",
        prompt_tokens=jtok.tokenize("a photo of"), split_id=jtok.star_token_id(),
        grad_scale=1.0, dropout=0.0, db_topk=K, compute_dtype=jnp.float32,
    )
    our_losses = []
    base_rng = jax.random.PRNGKey(0)
    i = 0
    for _epoch in range(EPOCHS):
        for feats, caps in batches:
            batch = TrainBatch(
                image_features=jnp.asarray(feats),
                caption_features=jnp.asarray(caps),
                other_tokens=jnp.zeros((B, 77), jnp.int32),
            )
            heads, opt_state, loss = step(heads, opt_state, batch,
                                          jax.random.fold_in(base_rng, i))
            our_losses.append(float(loss))
            i += 1

    # ---- per-step losses ----------------------------------------------------
    for s, (lr_, lj) in enumerate(zip(ref_losses, our_losses)):
        assert lj == pytest.approx(lr_, rel=3e-4, abs=3e-5), (
            f"step {s}: reference {lr_} vs ours {lj}\n"
            f"ref trajectory: {ref_losses}\nour trajectory: {our_losses}")

    # ---- final head parameters ----------------------------------------------
    expected = FusionHeads(
        img2text=convert.im2text_state_dict_to_pytree(
            {k: v.detach().numpy() for k, v in i2t.state_dict().items()}),
        retrieval_fuse=convert.crossformer_state_dict_to_pytree(
            {k: v.detach().numpy() for k, v in rf.state_dict().items()}),
        text_condition=convert.crossformer_state_dict_to_pytree(
            {k: v.detach().numpy() for k, v in tc.state_dict().items()}),
    )
    flat_e = jax.tree_util.tree_leaves_with_path(expected)
    flat_h = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, heads))
    assert len(flat_e) == len(flat_h)
    for (pe, ve), (ph, vh) in zip(flat_e, flat_h):
        assert pe == ph
        np.testing.assert_allclose(
            vh, ve, atol=1e-4, rtol=1e-3,
            err_msg=f"post-training parameter mismatch at {pe}")


_WORDS = ["red chair", "small dog", "green tree", "old car", "tall tower",
          "white cat", "blue boat", "wooden table"]


def test_text_stream_trajectory_matches_reference_loss(ref_trainer,
                                                       reference_src,
                                                       world1_pg):
    """Same contract as the image-stream trajectory, for the text stream
    (``get_loss_img2text``, src/trainer.py:285-411).  The committed train()
    reaches only the image stream (the text call is commented out at
    :464,471; the recipe's second stream is trained by swapping that call),
    so the reference side here runs a loop that mirrors train()'s exact
    order — scheduler(step), zero_grad, loss, backward, step — around the
    reference's own loss function.  The splice repair on the reference side
    is PARITY.md item 7 (``encode_text_img_train`` tail at ``ind_insert+K``
    instead of the hardcoded ``+3``, proven crash-first below); neighbor
    templates come from its ``other_dict`` host lookup + per-step
    tokenization, ours from the pre-tokenized device-gathered
    ``db_other_tokens`` table — the trajectories matching proves those two
    mechanisms equivalent end-to-end."""
    m, i2t, rf, tc = _build_models(reference_src)
    db_img, db_txt, batches = _make_data(seed=2)
    rng = np.random.default_rng(7)
    other_dict = {str(i): _WORDS[int(rng.integers(len(_WORDS)))]
                  for i in range(N_DB)}
    batch_others = [["a photo of * * * " + _WORDS[int(rng.integers(len(_WORDS)))]
                     for _ in range(B)] for _ in range(STEPS_PER_EPOCH)]

    # ---- reference ---------------------------------------------------------
    tmod = ref_trainer.patched
    tmod.other_dict = other_dict  # module-global consumed at src/trainer.py:324
    database = (torch.from_numpy(db_img), torch.from_numpy(db_txt),
                [str(i) for i in range(N_DB)],
                _FlatIndex(torch.from_numpy(db_img)),
                _FlatIndex(torch.from_numpy(db_txt)))
    optimizer = _ref_optimizer(i2t, rf, tc)
    total_steps = STEPS_PER_EPOCH * EPOCHS
    scheduler = ref_trainer.cosine_lr(optimizer, LR, WARMUP, total_steps)
    loss_img = torch.nn.CrossEntropyLoss()
    loss_txt = torch.nn.CrossEntropyLoss()
    loss_extra = torch.nn.CosineEmbeddingLoss()
    args = _ref_args()
    ref_losses = []
    with _CudaShim():
        for epoch in range(EPOCHS):
            for i, (feats, caps) in enumerate(batches):
                step = STEPS_PER_EPOCH * epoch + i
                scheduler(step)
                optimizer.zero_grad()
                capss = (torch.from_numpy(caps.copy()),
                         ["s"] * B, batch_others[i])
                total = tmod.get_loss_img2text(
                    m, i2t, rf, tc, torch.from_numpy(feats.copy()), capss,
                    loss_img, loss_txt, loss_extra, args, database=database)
                ref_losses.append(float(total.detach()))
                total.backward()
                optimizer.step()

    # ---- ours ---------------------------------------------------------------
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    clip_params, ccfg = convert.clip_state_dict_to_pytree(sd)
    clip_params = jax.tree.map(jnp.asarray, clip_params)
    _, i2t0, rf0, tc0 = _build_models(reference_src)
    heads = FusionHeads(
        img2text=convert.im2text_state_dict_to_pytree(
            {k: v.numpy() for k, v in i2t0.state_dict().items()}),
        retrieval_fuse=convert.crossformer_state_dict_to_pytree(
            {k: v.numpy() for k, v in rf0.state_dict().items()}),
        text_condition=convert.crossformer_state_dict_to_pytree(
            {k: v.numpy() for k, v in tc0.state_dict().items()}),
    )
    heads = jax.tree.map(jnp.asarray, heads)
    db = KnowledgeDB.from_arrays(db_img, db_txt, dtype=jnp.float32,
                                 normalize=False)
    retriever = Retriever(db)
    db_other_tokens = jnp.asarray(jtok.tokenize(
        ["a photo of * * " + other_dict[str(i)].replace("*", " ")
         for i in range(N_DB)]))
    cfg = SimpleNamespace(lr=LR, warmup=WARMUP, beta1=B1, beta2=B2, eps=EPS,
                          wd=WD, skip_scheduler=False)
    opt, _ = make_optimizer(cfg, total_steps)
    opt_state = opt.init(heads)
    step_fn = make_train_step(
        clip_params, ccfg, retriever, opt, stream="text",
        prompt_tokens=jtok.tokenize("a photo of"), split_id=jtok.star_token_id(),
        grad_scale=1.0, dropout=0.0, db_topk=K, compute_dtype=jnp.float32,
        db_other_tokens=db_other_tokens,
    )
    our_losses = []
    base_rng = jax.random.PRNGKey(0)
    n = 0
    for _epoch in range(EPOCHS):
        for i, (feats, caps) in enumerate(batches):
            batch = TrainBatch(
                image_features=jnp.asarray(feats),
                caption_features=jnp.asarray(caps),
                other_tokens=jnp.asarray(jtok.tokenize(batch_others[i])),
            )
            heads, opt_state, loss = step_fn(heads, opt_state, batch,
                                             jax.random.fold_in(base_rng, n))
            our_losses.append(float(loss))
            n += 1

    for s, (lr_, lj) in enumerate(zip(ref_losses, our_losses)):
        assert lj == pytest.approx(lr_, rel=3e-4, abs=3e-5), (
            f"step {s}: reference {lr_} vs ours {lj}\n"
            f"ref trajectory: {ref_losses}\nour trajectory: {our_losses}")

    expected = FusionHeads(
        img2text=convert.im2text_state_dict_to_pytree(
            {k: v.detach().numpy() for k, v in i2t.state_dict().items()}),
        retrieval_fuse=convert.crossformer_state_dict_to_pytree(
            {k: v.detach().numpy() for k, v in rf.state_dict().items()}),
        text_condition=convert.crossformer_state_dict_to_pytree(
            {k: v.detach().numpy() for k, v in tc.state_dict().items()}),
    )
    flat_e = jax.tree_util.tree_leaves_with_path(expected)
    flat_h = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, heads))
    assert len(flat_e) == len(flat_h)
    for (pe, ve), (ph, vh) in zip(flat_e, flat_h):
        assert pe == ph
        np.testing.assert_allclose(
            vh, ve, atol=1e-4, rtol=1e-3,
            err_msg=f"post-training parameter mismatch at {pe}")


def test_committed_encode_text_img_train_crashes_on_k2(reference_src):
    """Executable proof of PARITY.md item 7: the committed
    encode_text_img_train (tail hardcoded at ind_insert+3) raises on the
    K=2 pseudo-token fusions the text stream feeds it."""
    m, _, _, _ = _build_models(reference_src, repair_encode_text_img=False)
    text = torch.from_numpy(
        np.asarray(jtok.tokenize("a photo of * * * red chair"))).to(torch.long)
    text = text.repeat(B, 1)
    tokens = torch.randn(B, 2, D)
    with pytest.raises(RuntimeError, match="must match"):
        m.encode_text_img_train(text, tokens,
                                split_ind=jtok.star_token_id())
