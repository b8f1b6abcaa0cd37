"""Metric-function parity: expected values computed with an independent
torch transcription of the reference formulas (src/eval_utils.py:1008-1134)
on random features."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from keds_tpu.evalkit import metrics as M  # noqa: E402


RNG = np.random.default_rng(0)


def _feats(n, d=32):
    x = RNG.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_coco_metrics():
    image, ref = _feats(40), _feats(40)
    ours = M.get_metrics_coco(image, ref, logit_scale=100.0)
    # torch reference formula
    logits_per_image = (100.0 * torch.from_numpy(image) @ torch.from_numpy(ref).t())
    logits = {"image_to_ref": logits_per_image, "ref_to_image": logits_per_image.t()}
    gt = torch.arange(40).view(-1, 1)
    for name, logit in logits.items():
        ranking = torch.argsort(logit, descending=True)
        preds = torch.where(ranking == gt)[1].numpy()
        assert ours[f"{name}_mean_rank"] == pytest.approx(preds.mean() + 1)
        assert ours[f"{name}_median_rank"] == pytest.approx(np.floor(np.median(preds)) + 1)
        for k in (1, 5, 10):
            assert ours[f"{name}_R@{k}"] == pytest.approx(np.mean(preds < k))


def test_fashion_metrics():
    n_t, n_q = 30, 12
    image = _feats(n_t)
    ref = _feats(n_q)
    target_names = [f"t{i}.png" for i in range(n_t)]
    answers = [target_names[RNG.integers(0, n_t)] for _ in range(n_q)]
    ours = M.get_metrics_fashion(image, ref, target_names, answers)
    distances = 1 - torch.from_numpy(ref) @ torch.from_numpy(image).t()
    sorted_idx = torch.argsort(distances, dim=-1).numpy()
    sorted_names = np.array(target_names)[sorted_idx]
    labels = sorted_names == np.array(answers)[:, None]
    for k in (1, 5, 10):
        assert ours[f"R@{k}"] == pytest.approx(labels[:, :k].sum() / n_q * 100)


def test_fashion_metrics_asserts_single_gt():
    image = _feats(5)
    with pytest.raises(AssertionError):
        M.get_metrics_fashion(image, _feats(2), ["a"] * 5, ["a", "a"])


def test_cirr_metrics_mask_reference():
    """The query's own reference image must be excluded from the ranking."""
    n_t = 20
    image = _feats(n_t)
    target_names = [f"img{i}.png" for i in range(n_t)]
    # query 0's composed feature == reference image 3's feature: without
    # masking, img3 would rank first; with masking it must be removed.
    ref = image[[3, 7]].copy()
    reference_names = ["img3.png", "img5.png"]
    answers = ["img4.png", "img7.png"]
    ours = M.get_metrics_cirr(image, ref, reference_names,
                              [os.path.join("/corpus", t) for t in target_names],
                              answers)
    assert 0 <= ours["recall_R@1"] <= 100
    # query 1 matches its answer exactly -> must be R@1 hit
    assert ours["recall_R@1"] >= 50.0


import os  # noqa: E402


def test_cirr_testoutput_format():
    n_t = 60
    image = _feats(n_t)
    names = [f"i{i:02d}.png" for i in range(n_t)]
    ref = _feats(2)
    out = M.get_cirr_testoutput(image, ref, ["i00.png", "i01.png"], names, [11, 22])
    assert out["version"] == "rc2" and out["metric"] == "recall"
    assert len(out["11"]) == 50 and len(out["22"]) == 50
    assert not any(n.endswith(".png") for n in out["11"])
    assert "i00" not in out["11"]  # reference removed


def test_imgnet_metrics_against_torch_formula():
    n_q, n_t, n_cls = 150, 80, 7000
    q = _feats(n_q)
    t = _feats(n_t)
    ql = RNG.integers(0, 50, n_q)
    tl = RNG.integers(0, 50, n_t)
    ours = M.get_metrics_imgnet(q, t, ql, tl)
    # torch transcription
    qf, tf = torch.from_numpy(q), torch.from_numpy(t)
    q1 = F.one_hot(torch.from_numpy(ql), n_cls).float()
    t1 = F.one_hot(torch.from_numpy(tl), n_cls).float()
    ks = (1, 5, 10, 50, 100, 200)
    exp = {f"Real2Sketch_R@{k}": 0.0 for k in ks}
    exp.update({f"Real2Sketch_P@{k}": 0.0 for k in ks})
    for s in range(0, n_q, 100):
        feats, labels = qf[s:s+100], q1[s:s+100]
        logits = feats @ tf.t()
        lm = labels @ t1.t()
        ranking = torch.argsort(logits, descending=True)
        for k in ks:
            mk = torch.zeros_like(lm)
            mk[torch.arange(mk.size(0)).unsqueeze(1), ranking[:, :k]] = 1
            cons = mk * lm
            nc, npred, ntot = cons.sum(1), mk.sum(1), lm.sum(1)
            exp[f"Real2Sketch_R@{k}"] += float(torch.mean(nc / (ntot + 1e-5))) * len(feats)
            exp[f"Real2Sketch_P@{k}"] += float(torch.mean(nc / npred)) * len(feats)
    for k in ks:
        exp[f"Real2Sketch_R@{k}"] /= n_q
        exp[f"Real2Sketch_P@{k}"] /= n_q
    for key in exp:
        assert ours[key] == pytest.approx(exp[key], rel=1e-5), key


def _topk_idx_like_lax(scores, k):
    """Emulate jax.lax.top_k's index output: values descending, exact-score
    ties broken toward the LOWER index — identical to a stable argsort of
    the negated scores."""
    return np.argsort(-scores, axis=1, kind="stable")[:, :k]


def test_cirr_from_topk_matches_full_ranking():
    """Device-ranking sweep path (eval_ranking='device'): recalls computed
    from the top-min(101, T) index matrix must equal get_metrics_cirr's
    full-width values — including when the ranking is truncated (T > 101)
    and when the reference image sits inside/outside the kept prefix."""
    rng = np.random.default_rng(7)
    for n_t in (20, 150):  # full-width and truncated regimes
        n_q = 40
        image = _feats(n_t)
        ref = _feats(n_q)
        # every reference/target in-corpus, target != reference
        target_names = [f"img{i}.png" for i in range(n_t)]
        ref_ids = rng.integers(0, n_t, n_q)
        tgt_ids = (ref_ids + 1 + rng.integers(0, n_t - 1, n_q)) % n_t
        reference_names = [target_names[i] for i in ref_ids]
        answers = [target_names[i] for i in tgt_ids]
        index_names = [os.path.join("/corpus", t) for t in target_names]
        want = M.get_metrics_cirr(image, ref, reference_names, index_names, answers)
        k = min(101, n_t)
        top_idx = _topk_idx_like_lax(ref @ image.T, k)
        M.check_cirr_gt_unique(target_names, reference_names, answers)
        got = M.get_metrics_cirr_from_topk(top_idx, target_names,
                                           reference_names, answers, n_t)
        assert got == want, (n_t, got, want)


def test_cirr_from_topk_exact_score_ties():
    """Duplicate corpus rows force exact f32 score ties; both paths must
    break them identically (toward the lower corpus index)."""
    n_t, n_q = 30, 8
    image = _feats(n_t)
    image[10] = image[3]  # exact tie pair
    image[25] = image[3]  # exact tie triple
    ref = _feats(n_q)
    target_names = [f"img{i}.png" for i in range(n_t)]
    reference_names = [target_names[i] for i in range(n_q)]
    answers = [target_names[i + 10] for i in range(n_q)]
    want = M.get_metrics_cirr(image, ref, reference_names,
                              target_names, answers)
    top_idx = _topk_idx_like_lax(ref @ image.T, min(101, n_t))
    got = M.get_metrics_cirr_from_topk(top_idx, target_names,
                                       reference_names, answers, n_t)
    assert got == want


def test_check_cirr_gt_unique_refusals():
    names = ["a.png", "b.png", "c.png"]
    M.check_cirr_gt_unique(names, ["a.png"], ["b.png"])  # ok
    with pytest.raises(AssertionError):  # target == reference (masked out)
        M.check_cirr_gt_unique(names, ["a.png"], ["a.png"])
    with pytest.raises(AssertionError):  # target not in corpus
        M.check_cirr_gt_unique(names, ["a.png"], ["z.png"])
    with pytest.raises(AssertionError):  # duplicate target in corpus
        M.check_cirr_gt_unique(names + ["b.png"], ["a.png"], ["b.png"])
    with pytest.raises(AssertionError):  # duplicate reference in corpus
        M.check_cirr_gt_unique(names + ["a.png"], ["a.png"], ["b.png"])


def test_fashion_from_topk_matches_full_ranking():
    """Device-ranking Fashion path: recalls from the top-min(100, T) index
    matrix must equal get_metrics_fashion's full-width values, in both the
    full-width and truncated (T > 100) regimes, including exact-score ties
    (duplicate corpus rows)."""
    for n_t in (20, 150):
        n_q = 40
        image = _feats(n_t)
        image[n_t - 1] = image[0]  # exact tie pair
        ref = _feats(n_q)
        target_names = [f"t{i}.png" for i in range(n_t)]
        rng = np.random.default_rng(3)
        answers = [target_names[i] for i in rng.integers(0, n_t - 1, n_q)]
        want = M.get_metrics_fashion(image, ref, target_names, answers)
        k = min(100, n_t)
        top_idx = _topk_idx_like_lax(ref @ image.T, k)
        M.check_fashion_gt_unique(target_names, answers)
        got = M.get_metrics_fashion_from_topk(top_idx, target_names, answers)
        assert got == want, (n_t, got, want)


def test_check_fashion_gt_unique_refusals():
    names = ["a.png", "b.png", "c.png"]
    M.check_fashion_gt_unique(names, ["b.png"])  # ok
    with pytest.raises(AssertionError):  # answer not in corpus
        M.check_fashion_gt_unique(names, ["z.png"])
    with pytest.raises(AssertionError):  # duplicate answer in corpus
        M.check_fashion_gt_unique(names + ["b.png"], ["b.png"])


def _diag_ranks_np(logits):
    """Numpy transcription of the device _diag_ranks formula."""
    n = logits.shape[0]
    gt = np.diagonal(logits)[:, None]
    idx = np.arange(n)
    greater = (logits > gt).sum(axis=1)
    eq_before = ((logits == gt) & (idx[None, :] < idx[:, None])).sum(axis=1)
    return greater + eq_before


def test_coco_from_preds_matches_full_ranking():
    """Device-ranking COCO path: diag-rank formula (#greater + #equal at
    lower index) must reproduce the host path's stable-argsort positions —
    including exact diagonal ties from duplicated feature rows."""
    n = 40
    image, ref = _feats(n), _feats(n)
    image[7] = image[3]  # exact tie rows in both directions
    ref[25] = ref[3]
    want = M.get_metrics_coco(image, ref, logit_scale=100.0)
    logits = np.float32(100.0) * (image @ ref.T)
    got = M.get_metrics_coco_from_preds(_diag_ranks_np(logits),
                                        _diag_ranks_np(logits.T))
    assert got == want


def test_imgnet_from_topk_matches_full():
    """Device-ranking ImageNet path: metrics from the top-min(200, T) index
    matrix must equal get_metrics_imgnet bit-for-bit (the from_topk variant
    replicates the 100-query chunking and f32 accumulation), in both the
    K=n_targets and truncated (T > 200) regimes."""
    rng = np.random.default_rng(11)
    for n_t in (150, 250):
        n_q = 230  # > 2 chunks of 100, with a ragged tail
        query = _feats(n_q)
        target = _feats(n_t)
        q_labels = rng.integers(0, 9, n_q)
        t_labels = rng.integers(0, 9, n_t)
        want = M.get_metrics_imgnet(query, target, q_labels, t_labels)
        top_idx = _topk_idx_like_lax(query @ target.T, min(200, n_t))
        got = M.get_metrics_imgnet_from_topk(top_idx, q_labels, t_labels)
        assert got == want, (n_t, got, want)
