"""End-to-end recall parity against the RUNNING reference pipeline.

Runs the reference's own ``evaluate_cirr`` / ``evaluate_fashion``
(``/root/reference/src/eval_utils.py:578-740,863-1005``, torch on CPU) and
keds_tpu's evaluators on the SAME synthetic benchmark tree, the SAME
knowledge DB, and the SAME weights (torch modules -> our converter), then
asserts every (epoch, feature-key) recall cell matches and that the full
corpus rankings are identical (up to exact score ties).

This is the north-star recall-parity gate exercised at pipeline level —
everything from PIL bytes to the final metric runs through each side's own
stack.  The reference's unimportable corners are stubbed, not modified:
``llama``/``webdataset``/``torchvision``/``ftfy``/``faiss`` are import-time
stand-ins (the live eval path touches none of them — the faiss index is
duck-typed with an exact numpy top-k, matching IndexFlatL2 on unit vectors).
"""

import logging
import os
import pickle
import re
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from keds_tpu import tokenizer as jtok  # noqa: E402
from keds_tpu.data.datasets import CIRR as JCIRR, FashionIQ as JFashionIQ  # noqa: E402
from keds_tpu.data.loader import DataLoader as JLoader  # noqa: E402
from keds_tpu.evalkit import evaluators as jev  # noqa: E402
from keds_tpu.models import convert  # noqa: E402
from keds_tpu.retrieval.database import KnowledgeDB, Retriever  # noqa: E402
from keds_tpu.transforms import image_transform  # noqa: E402

try:  # the reference BPE artifact must be locatable for our tokenizer too
    jtok.tokenize("probe")
    _TOK = True
except Exception:  # pragma: no cover - environment without the vocab blob
    _TOK = False

pytestmark = pytest.mark.skipif(not _TOK, reason="BPE vocab not available")

D = 64
RES = 32


def _stub(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _FlatIndex:
    """Duck-typed faiss index: exact top-k by inner product over unit-norm
    rows (IndexFlatL2 is rank-equivalent there; the reference only consumes
    the indices, src/eval_utils.py:170,178)."""

    def __init__(self, base: torch.Tensor):
        self.base = np.asarray(base, np.float32)

    def search(self, q: np.ndarray, k: int):
        sims = np.asarray(q, np.float32) @ self.base.T
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(sims, idx, axis=1), idx


class _Wrap(torch.nn.Module):
    """evaluate_* unwraps DDP via ``model.module`` when args.distributed
    (which we must set — load_model_without_definition's non-distributed
    branch hits the reference's `sd`-before-assignment bug,
    src/eval_utils.py:69)."""

    def __init__(self, m):
        super().__init__()
        self.module = m


class _Capture(logging.Handler):
    """Collects the reference's 'Eval ... Feature...' logging.info lines
    (its only metric output channel); lifts the root level while attached."""

    def __init__(self):
        super().__init__(level=logging.INFO)
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())

    def __enter__(self):
        root = logging.getLogger()
        self._old_level = root.level
        root.setLevel(logging.INFO)
        root.addHandler(self)
        return self

    def __exit__(self, *exc):
        root = logging.getLogger()
        root.removeHandler(self)
        root.setLevel(self._old_level)


def _parse_eval_lines(messages, keys=("composed", "image", "mixture")):
    """'Eval {key} Feature{m}: {v:.4f}\t...' lines -> {(j, key): {m: v}}
    with j counted per sweep iteration (the reference logs 3 keys per j)."""
    out = {}
    j = 1
    seen = 0
    for msg in messages:
        m = re.match(r"Eval (\w+) Feature(.*)", msg)
        if not m:
            continue
        key, rest = m.group(1), m.group(2)
        metrics = {}
        for part in rest.strip().split("\t"):
            name, _, val = part.partition(": ")
            metrics[name.strip()] = float(val)
        out[(j, key)] = metrics
        seen += 1
        if seen % len(keys) == 0:
            j += 1
    return out


@pytest.fixture(scope="module")
def ref_env(reference_src, tmp_path_factory):
    """Import the reference eval stack with its unimportable corners stubbed
    and its import-time cwd artifacts present."""
    scratch = tmp_path_factory.mktemp("ref_cwd")
    for f in ("cc3m_have_good.pkl", "cc3m_have.pkl"):
        (scratch / f).write_bytes(pickle.dumps([]))
    for f in ("cc_subject.json", "cc_other.json"):
        (scratch / f).write_text("{}")

    import packaging as _packaging
    import packaging.version  # bind the submodule attribute

    _stub("pkg_resources", packaging=_packaging)
    _stub("ftfy", fix_text=lambda s: s)
    _stub("llama", Llama=object, Dialog=object)
    _stub("braceexpand", braceexpand=lambda s: [s])
    import pandas  # noqa: F401 - must resolve its optional pyarrow before the stub
    _stub("pyarrow", __version__="0.0.0")
    _stub("webdataset", PipelineStage=type("PipelineStage", (), {}))
    _stub("webdataset.filters", _shuffle=lambda *a, **k: None)
    _stub("webdataset.tariterators", base_plus_ext=None, url_opener=None,
          tar_file_expander=None, valid_sample=None)
    wds = sys.modules["webdataset"]
    wds.filters = sys.modules["webdataset.filters"]
    wds.tariterators = sys.modules["webdataset.tariterators"]

    class _T:  # torchvision transform stand-ins; the live eval path never calls them
        def __init__(self, *a, **k):
            pass

    _stub("torchvision")
    _stub("torchvision.transforms", Compose=_T, Resize=_T, CenterCrop=_T,
          ToTensor=_T, Normalize=_T, RandomResizedCrop=_T,
          InterpolationMode=SimpleNamespace(BICUBIC=3))
    _stub("torchvision.transforms.functional")
    _stub("torchvision.datasets", ImageFolder=type("ImageFolder", (), {}))
    _stub("torchvision.datasets.folder", DatasetFolder=type("DatasetFolder", (), {}))
    _stub("torchvision.utils", save_image=lambda *a, **k: None)
    tv = sys.modules["torchvision"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.transforms.functional = sys.modules["torchvision.transforms.functional"]
    tv.datasets = sys.modules["torchvision.datasets"]
    tv.datasets.folder = sys.modules["torchvision.datasets.folder"]
    tv.utils = sys.modules["torchvision.utils"]

    cwd = os.getcwd()
    os.chdir(scratch)
    sys.path.insert(0, str(reference_src))
    try:
        import eval_utils as ref_eval
        import model.model as ref_model
        import data as ref_data
    finally:
        sys.path.pop(0)
        os.chdir(cwd)
    return SimpleNamespace(eval=ref_eval, model=ref_model, data=ref_data,
                           scratch=scratch)


def _setup(ref_env, tmp_path, n_imgs=10, n_queries=6, n_epochs=30,
           tree="cirr"):
    """Shared fixtures: tiny torch CLIP + head checkpoints (written with
    torch.save in the exact reference layout), converted jax params, a
    synthetic benchmark tree, and the shared knowledge DB."""
    ref_model = ref_env.model
    torch.manual_seed(0)
    m = ref_model.CLIP(
        embed_dim=D, image_resolution=RES, vision_layers=2, vision_width=128,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=D, transformer_heads=1, transformer_layers=2,
    ).eval().float()
    for p in m.parameters():
        p.requires_grad_(False)

    def mk_heads(seed):
        torch.manual_seed(seed)
        i2t = ref_model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D,
                                n_layer=2).eval()
        rf = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3).eval()
        tc = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3).eval()
        return i2t, rf, tc

    # branch checkpoint trees in the scratch cwd (the reference hardcodes
    # ./image_branch/checkpoints/epoch_j.pt, src/eval_utils.py:618,623);
    # head-sets cycle so different epochs give different metrics.
    scratch = ref_env.scratch
    head_seeds = {"image_branch": (11, 12, 13), "text_branch": (21, 22, 23)}
    for branch, seeds in head_seeds.items():
        d = scratch / branch / "checkpoints"
        d.mkdir(parents=True, exist_ok=True)
        for e in range(1, n_epochs + 1):
            i2t, rf, tc = mk_heads(seeds[(e - 1) % len(seeds)])
            torch.save({
                "epoch": e, "name": "parity",
                "state_dict_img2text": i2t.state_dict(),
                "state_dict_retrieval_fuse": rf.state_dict(),
                "state_dict_text_condition": tc.state_dict(),
            }, d / f"epoch_{e}.pt")

    # converted jax CLIP params
    params, cfg = convert.clip_state_dict_to_pytree(m.state_dict())

    # shared DB (unit-norm f32, exactly what both sides score against)
    rng = np.random.default_rng(0)
    img_db = rng.standard_normal((64, D)).astype(np.float32)
    txt_db = rng.standard_normal((64, D)).astype(np.float32)
    img_db /= np.linalg.norm(img_db, axis=1, keepdims=True)
    txt_db /= np.linalg.norm(txt_db, axis=1, keepdims=True)
    t_img, t_txt = torch.from_numpy(img_db), torch.from_numpy(txt_db)
    database = (t_img, t_txt, [f"n{i}" for i in range(64)],
                _FlatIndex(t_img), _FlatIndex(t_txt))
    db = KnowledgeDB.from_arrays(img_db, txt_db, dtype=jnp.float32)

    # synthetic benchmark tree
    root = tmp_path / "data"
    if tree == "cirr":
        base = root / "CIRR"
        (base / "dev").mkdir(parents=True)
        (base / "captions").mkdir()
        (base / "image_splits").mkdir()
        names = [f"img{i}" for i in range(n_imgs)]
        for n in names:
            Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
                base / "dev" / f"{n}.png")
        import json as _json

        caps = [{"reference": names[q], "target_hard": names[(q + 3) % n_imgs],
                 "caption": f"make it {q} shiny"} for q in range(n_queries)]
        (base / "captions" / "cap.rc2.val.json").write_text(_json.dumps(caps))
        (base / "image_splits" / "split.rc2.val.json").write_text(
            _json.dumps({n: f"dev/{n}.png" for n in names}))
    elif tree == "coco":
        import csv as _csv
        import json as _json

        base = root / "coco"
        (base / "val2017").mkdir(parents=True)
        (base / "val2017_masked").mkdir()
        (base / "annotations").mkdir()
        rows = []
        for i in range(n_imgs):
            name = f"{i:012d}.png"
            for d in ("val2017", "val2017_masked"):
                Image.fromarray(rng.integers(0, 255, (44, 44, 3), np.uint8)).save(
                    base / d / name)
            # square region crops so the reference's non-cropping region
            # transform (plain resize) produces collatable square tensors
            rows.append({"id": name, "query_regions": "4;4;36;36",
                         "query_class": f"class{i % 3}",
                         "classes": "cat;tree" if i % 2 else "boat"})
        with open(base / "coco_eval.csv", "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows[:n_queries])
        (base / "annotations" / "captions_val2017.json").write_text(
            _json.dumps({"annotations": [
                {"image_id": i, "caption": f"c{i}"} for i in range(n_imgs)]}))
    else:  # fashion-iq, one cloth type
        base = root / "fashion-iq"
        (base / "images").mkdir(parents=True)
        (base / "image_splits").mkdir()
        (base / "json").mkdir()
        names = [f"fiq{i}" for i in range(n_imgs)]
        for n in names:
            Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
                base / "images" / f"{n}.png")
        import json as _json

        caps = [{"candidate": names[q], "target": names[(q + 3) % n_imgs],
                 "captions": [f"has {q} buttons", "is darker"]}
                for q in range(n_queries)]
        (base / "image_splits" / "split.dress.val.json").write_text(_json.dumps(names))
        (base / "json" / "cap.dress.val.json").write_text(_json.dumps(caps))

    t_val = image_transform(RES, is_train=False)  # host-parity PIL pipeline
    from keds_tpu.transforms import region_transform

    t_region = region_transform(RES)  # COCO query regions: resize, no crop

    def torch_transform(img):
        return torch.from_numpy(np.asarray(t_val(img))).permute(2, 0, 1)

    def torch_transform_region(img):
        return torch.from_numpy(np.asarray(t_region(img))).permute(2, 0, 1)

    args = SimpleNamespace(gpu=None, distributed=True, dp=True, rank=0)
    return SimpleNamespace(m=m, params=params, cfg=cfg, db=db,
                           database=database, args=args, root=root,
                           t_val=t_val, t_region=t_region,
                           torch_transform=torch_transform,
                           torch_transform_region=torch_transform_region,
                           scratch=scratch)


def _run_in(cwd):
    """chdir for the reference's hardcoded ./<branch>/checkpoints paths, and
    shim Tensor.cuda to identity: evaluate_* moves retrieved neighbors with
    an UNGUARDED .cuda() (src/eval_utils.py:660-661) that torch-cpu cannot
    execute; device movement is semantics-free for the math."""

    class _Ctx:
        def __enter__(self):
            self.old = os.getcwd()
            self.cuda = torch.Tensor.cuda
            os.chdir(cwd)
            torch.Tensor.cuda = lambda t, *a, **k: t

        def __exit__(self, *exc):
            os.chdir(self.old)
            torch.Tensor.cuda = self.cuda

    return _Ctx()


def _make_ctx(s, mode="cirr"):
    retr = Retriever(s.db)
    return jev.EvalContext(
        clip_params=s.params, cfg=s.cfg, retriever=retr,
        image_branch=str(s.scratch / "image_branch" / "checkpoints"),
        text_branch=str(s.scratch / "text_branch" / "checkpoints"),
        batch_size=4, db_topk=16, compute_dtype=jnp.float32,
    )


def _compare(ref_metrics, our_results, n_cells):
    assert len(ref_metrics) == n_cells, sorted(ref_metrics)[:4]
    assert len(our_results) == n_cells
    for (j, key), ref_m in ref_metrics.items():
        ours = our_results[(j, key)]
        for name, val in ref_m.items():
            assert name in ours, (j, key, name, sorted(ours))
            # the reference logs at 4 decimals; recalls are coarse fractions
            assert abs(round(ours[name], 4) - val) < 2e-4, \
                (j, key, name, val, ours[name])


def test_cirr_recall_parity_end_to_end(ref_env, tmp_path):
    s = _setup(ref_env, tmp_path, tree="cirr")
    ref_eval = ref_env.eval

    # --- reference run (its own datasets, tokenizer, model, metrics) -------
    from torch.utils.data import DataLoader as TorchLoader

    q_ds = ref_env.data.CIRR(transforms=s.torch_transform, mode="caps",
                             root=str(s.root))
    t_ds = ref_env.data.CIRR(transforms=s.torch_transform, mode="imgs",
                             root=str(s.root))
    q_loader = TorchLoader(q_ds, batch_size=4, shuffle=False)
    t_loader = TorchLoader(t_ds, batch_size=4, shuffle=False)
    i2t, rf, tc = (ref_env.model.IM2TEXT(embed_dim=D, middle_dim=48,
                                         output_dim=D, n_layer=2),
                   ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3),
                   ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3))
    with _Capture() as cap, torch.no_grad(), _run_in(s.scratch):
        ref_eval.evaluate_cirr(_Wrap(s.m), i2t, rf, tc, s.database,
                               s.args, q_loader, t_loader)
    ref_metrics = _parse_eval_lines(cap.messages)

    # --- our run (our datasets, tokenizer, model, metrics) -----------------
    ctx = _make_ctx(s)
    jq = JLoader(JCIRR(transforms=s.t_val, mode="caps", root=str(s.root)), 4)
    jt = JLoader(JCIRR(transforms=s.t_val, mode="imgs", root=str(s.root)), 4)
    ours = jev.evaluate_cirr(ctx, jq, jt, epochs=range(1, 31))

    _compare(ref_metrics, ours, n_cells=30 * 3)


def test_cirr_full_ranking_parity(ref_env, tmp_path):
    """Beyond the recall cells: the complete corpus orderings must agree
    element-wise (ties broken by score equality)."""
    s = _setup(ref_env, tmp_path, n_epochs=1, tree="cirr")
    ref_eval, ref_model = ref_env.eval, ref_env.model
    from torch.utils.data import DataLoader as TorchLoader

    # reference composed features, heads from image_branch/epoch_1
    i2t = ref_model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D, n_layer=2).eval()
    rf = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3).eval()
    tc = ref_model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3).eval()
    with _run_in(s.scratch):
        ref_eval.load_model_without_definition(
            s.args, i2t, rf, tc, "./image_branch/checkpoints/epoch_1.pt")
    t_ds = ref_env.data.CIRR(transforms=s.torch_transform, mode="imgs",
                             root=str(s.root))
    q_ds = ref_env.data.CIRR(transforms=s.torch_transform, mode="caps",
                             root=str(s.root))
    id_split = int(ref_eval.tokenize(["*"])[0][1])
    with torch.no_grad():
        corpus_t, corpus_names = [], []
        for imgs, paths in TorchLoader(t_ds, batch_size=4):
            f = s.m.encode_image(imgs)
            corpus_t.append(f / f.norm(dim=-1, keepdim=True))
            corpus_names.extend(os.path.basename(p) for p in paths)
        corpus_t = torch.cat(corpus_t)
        comp_t = []
        for batch in TorchLoader(q_ds, batch_size=4):
            ref_images, twb = batch[0], batch[1]
            qf = s.m.encode_image(ref_images)
            ti, tt = ref_eval.get_retrieved_features(qf, s.database, s.args)
            mapped = i2t(qf)
            fused = rf(mapped.unsqueeze(1), i2t(ti), i2t(ti))
            cond = tc(mapped.unsqueeze(1), i2t(tt), i2t(tt))
            tok = torch.cat([fused, cond, mapped.unsqueeze(1)], dim=1)
            c = s.m.encode_text_img_retrieval(twb, tok, split_ind=id_split,
                                              repeat=False)
            comp_t.append(c / c.norm(dim=-1, keepdim=True))
        comp_t = torch.cat(comp_t).numpy()
    sims_ref = comp_t @ corpus_t.numpy().T

    # our composed features from the same checkpoint file
    ctx = _make_ctx(s)
    jq = JLoader(JCIRR(transforms=s.t_val, mode="caps", root=str(s.root)), 4)
    jt = JLoader(JCIRR(transforms=s.t_val, mode="imgs", root=str(s.root)), 4)
    corpus_j, names_j = jev._encode_corpus(ctx, jt)
    cache = jev._precompute_queries(
        ctx, jq, lambda b: (b[0], dict(text=jnp.asarray(b[1]))))
    heads = ctx.load_heads(ctx.image_branch, 1)
    compose = ctx.composed_fn("retrieval", use_text_condition=True)
    comp_j = np.concatenate([
        np.asarray(compose(heads, b["feats"], b["topk_img"], b["topk_txt"], b["text"]))
        for b in cache])
    assert [os.path.basename(n) for n in names_j] == corpus_names
    sims_ours = comp_j @ corpus_j.T

    np.testing.assert_allclose(sims_ours, sims_ref, rtol=2e-4, atol=2e-4)
    rank_ref = np.argsort(-sims_ref, axis=1, kind="stable")
    rank_ours = np.argsort(-sims_ours, axis=1, kind="stable")
    mism = rank_ours != rank_ref
    if mism.any():  # only exact ties may reorder
        np.testing.assert_allclose(
            np.take_along_axis(sims_ref, rank_ours, 1)[mism],
            np.take_along_axis(sims_ref, rank_ref, 1)[mism], atol=1e-6)


def test_coco_recall_parity_end_to_end(ref_env, tmp_path):
    """Third runnable mode: the COCO region-query evaluator (j=1..25, both
    heads from image_branch epochs 2j-1/2j — the :483 quirk — mixture
    0.05j, rank metrics both directions over the self-corpus)."""
    s = _setup(ref_env, tmp_path, n_imgs=8, n_queries=8, n_epochs=50,
               tree="coco")
    ref_eval = ref_env.eval
    from torch.utils.data import DataLoader as TorchLoader

    q_ds = ref_env.data.CsvCOCO(transforms=s.torch_transform,
                                transforms_region=s.torch_transform_region,
                                root=str(s.root))
    i2t = ref_env.model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D, n_layer=2)
    rf = ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    tc = ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    with _Capture() as cap, torch.no_grad(), _run_in(s.scratch):
        ref_eval.evaluate_coco(_Wrap(s.m), i2t, rf, tc, s.database, s.args,
                               TorchLoader(q_ds, batch_size=4))
    ref_metrics = _parse_eval_lines(cap.messages)

    from keds_tpu.data.datasets import CsvCOCO as JCsvCOCO

    ctx = _make_ctx(s)
    jq = JLoader(JCsvCOCO(transforms=s.t_val, transforms_region=s.t_region,
                          root=str(s.root)), 4)
    ours = jev.evaluate_coco(ctx, jq, epochs=range(1, 26))
    _compare(ref_metrics, ours, n_cells=25 * 3)


def test_fashion_reference_crashes_as_committed(ref_env, tmp_path):
    """Executable documentation of a latent reference bug (PARITY.md): the
    committed ``evaluate_fashion`` splices its K=2 pseudo-tokens into a
    hardcoded 3-slot hole (``x[:, :ind]  + 2 tokens + x[:, ind+3:]``,
    src/model/model.py:873-884) leaving a 76-token sequence against the
    77-entry positional embedding -> RuntimeError.  Our evaluator repairs
    this by cutting exactly K slots; fashion-mode behavior is covered by
    module-level parity + the synthetic-tree integration test instead."""
    s = _setup(ref_env, tmp_path, tree="fashion")
    from torch.utils.data import DataLoader as TorchLoader

    q_ds = ref_env.data.FashionIQ(cloth="dress", transforms=s.torch_transform,
                                  mode="caps", is_return_target_path=True,
                                  root=str(s.root))
    t_ds = ref_env.data.FashionIQ(cloth="dress", transforms=s.torch_transform,
                                  mode="imgs", root=str(s.root))
    i2t = ref_env.model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D, n_layer=2)
    rf = ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    tc = ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    with pytest.raises(RuntimeError, match="must match the size"), \
            torch.no_grad(), _run_in(s.scratch):
        ref_env.eval.evaluate_fashion(
            _Wrap(s.m), i2t, rf, tc, s.database, s.args,
            TorchLoader(q_ds, batch_size=4), TorchLoader(t_ds, batch_size=4))


def test_imgnet_recall_parity_end_to_end(ref_env, tmp_path):
    """Second runnable mode: the ImageNet domain-transfer evaluator
    (K=3 tokens, epochs 2j-1/2j for j=5..9, mixture 0.1j, 1000*domain label
    offset, R@k/P@k metrics)."""
    s = _setup(ref_env, tmp_path, tree="cirr")  # reuse the CIRR images
    ref_eval = ref_env.eval
    from torch.utils.data import DataLoader as TorchLoader

    img_dir = str(s.root / "CIRR" / "dev")
    rng = np.random.default_rng(3)
    q_lines = "\n".join(f"img{i}.png {int(rng.integers(0, 5))}" for i in range(6))
    t_lines = "\n".join(f"img{i}.png {int(rng.integers(0, 5))}" for i in range(4, 10))
    (tmp_path / "query.txt").write_text(q_lines)
    (tmp_path / "target.txt").write_text(t_lines)
    # cwd artifact the reference reads at call time (class-label prompts;
    # the derived features are computed and discarded)
    (s.scratch / "imgnet_class_label_mapping.txt").write_text(
        "n01 dog\nn02 cat\nn03 bird\n")
    prompts = ["a cartoon of *", "a toy of *"]

    q_ds = ref_env.data.ImageList(str(tmp_path / "query.txt"),
                                  transforms=s.torch_transform, root=img_dir,
                                  is_labels=True)
    t_ds = ref_env.data.ImageList(str(tmp_path / "target.txt"),
                                  transforms=s.torch_transform, root=img_dir,
                                  is_labels=True)
    i2t = ref_env.model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D, n_layer=2)
    rf = ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    tc = ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    with _Capture() as cap, torch.no_grad(), _run_in(s.scratch):
        ref_eval.evaluate_imgnet_retrieval(
            _Wrap(s.m), i2t, rf, tc, s.database, s.args, prompts,
            TorchLoader(q_ds, batch_size=4), TorchLoader(t_ds, batch_size=4))
    ref_cells = _parse_eval_lines(cap.messages)  # sequential (j, key) counter

    ctx = _make_ctx(s)
    jq = JLoader(jev_imagelist(str(tmp_path / "query.txt"), s.t_val, img_dir), 4)
    jt = JLoader(jev_imagelist(str(tmp_path / "target.txt"), s.t_val, img_dir), 4)
    ours = jev.evaluate_imgnet_retrieval(ctx, prompts, jq, jt,
                                         epochs=range(5, 10))

    # reference sweep order: j outer, prompt inner, 3 keys per cell
    ordered_ref = [ref_cells[(i + 1, key)]
                   for i in range(5 * len(prompts))
                   for key in ("composed", "image", "mixture")]
    ordered_ours = [ours[(j, p, key)]
                    for j in range(5, 10) for p in prompts
                    for key in ("composed", "image", "mixture")]
    assert len(ordered_ref) == len(ordered_ours) == 30
    for ref_m, our_m in zip(ordered_ref, ordered_ours):
        for name, val in ref_m.items():
            assert name in our_m, (name, sorted(our_m))
            assert abs(round(our_m[name], 4) - val) < 2e-4, (name, val, our_m[name])


def jev_imagelist(path, transforms, root):
    from keds_tpu.data.datasets import ImageList

    return ImageList(path, transforms=transforms, root=root, is_labels=True)


def test_validate_artifacts_gate_passes_on_reference_numbers(ref_env, tmp_path):
    """Dogfood the turnkey gate (tools/validate_artifacts.py) against the
    RUNNING reference: reference-produced j=1 recall numbers become
    --expected, the published-artifact layout (single full checkpoints per
    stream) is synthesized from the same weights, and the gate must PASS —
    the literal rehearsal of the day real artifacts are reachable."""
    import json

    from keds_tpu.io.pt import save_pt
    from keds_tpu.tools.validate_artifacts import main as validate_main

    s = _setup(ref_env, tmp_path, tree="cirr")
    ref_eval = ref_env.eval
    from torch.utils.data import DataLoader as TorchLoader

    q_ds = ref_env.data.CIRR(transforms=s.torch_transform, mode="caps",
                             root=str(s.root))
    t_ds = ref_env.data.CIRR(transforms=s.torch_transform, mode="imgs",
                             root=str(s.root))
    q_loader = TorchLoader(q_ds, batch_size=4, shuffle=False)
    t_loader = TorchLoader(t_ds, batch_size=4, shuffle=False)
    i2t = ref_env.model.IM2TEXT(embed_dim=D, middle_dim=48, output_dim=D,
                                n_layer=2)
    rf = ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    tc = ref_env.model.CrossFormer(q_dim=D, k_dim=D, v_dim=D, num_layers=3)
    with _Capture() as cap, torch.no_grad(), _run_in(s.scratch):
        ref_eval.evaluate_cirr(_Wrap(s.m), i2t, rf, tc, s.database,
                               s.args, q_loader, t_loader)
    ref_j1 = {key: m for (j, key), m in
              _parse_eval_lines(cap.messages).items() if j == 1}
    assert set(ref_j1) == {"composed", "image", "mixture"}

    # Synthesize the published-artifact layout: ONE full checkpoint per
    # stream (CLIP state_dict + that branch's epoch-1 heads).
    streams = {}
    for stream, branch in (("image_stream", "image_branch"),
                           ("text_stream", "text_branch")):
        heads_sd = torch.load(
            s.scratch / branch / "checkpoints" / "epoch_1.pt",
            map_location="cpu", weights_only=False)
        full = {"epoch": 1, "name": stream, "state_dict": s.m.state_dict()}
        for k in ("state_dict_img2text", "state_dict_retrieval_fuse",
                  "state_dict_text_condition"):
            full[k] = heads_sd[k]
        path = str(tmp_path / f"{stream}.pt")
        torch.save(full, path)
        streams[stream] = path

    db_dir = tmp_path / "gate_db"
    db_dir.mkdir()
    save_pt(np.asarray(s.db.image_db), str(db_dir / "cc_image_databases.pt"))
    save_pt(np.asarray(s.db.text_db), str(db_dir / "cc_text_databases.pt"))
    (db_dir / "database_names.txt").write_text(
        "\n".join(f"n{i}" for i in range(64)))

    exp_file = tmp_path / "expected.json"
    exp_file.write_text(json.dumps({"cirr": ref_j1}))
    report = tmp_path / "gate_report.json"
    validate_main([
        "--image-stream", streams["image_stream"],
        "--text-stream", streams["text_stream"],
        "--db", str(db_dir), "--data-root", str(s.root),
        "--eval-mode", "cirr", "--batch-size", "4", "--db-topk", "16",
        "--precision", "fp32", "--tolerance", "0.001",
        "--expected", str(exp_file), "--out", str(report),
    ])
    rep = json.loads(report.read_text())
    assert rep["parity_ok"] is True
    # and measured == reference at 4 decimals, every cell
    for key, ref_m in ref_j1.items():
        for name, val in ref_m.items():
            assert abs(round(rep["table"][key][name], 4) - val) < 2e-4
