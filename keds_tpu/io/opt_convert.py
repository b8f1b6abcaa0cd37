"""Torch AdamW <-> optax adamw optimizer-state conversion.

The reference checkpoint's ``optimizer`` entry is a torch ``AdamW.state_dict()``
over the three head modules (``src/main.py:215-233``):

* two param groups — group 0 = gain/bias params (weight_decay 0), group 1 =
  the rest (``exclude = "bn"/"ln"/"bias"/"logit_scale" in name``),
* ``state[i] = {step, exp_avg, exp_avg_sq}`` keyed by the global param index
  (group 0's params enumerate first, then group 1's),
* parameters enumerate in module registration order: IM2TEXT registers
  ``fc_out`` before ``layers`` (``src/model/model.py:105-123``); each
  CrossAttention registers ``to_q, to_k, to_v, to_out.0``
  (``model.py:37-52``); the optimizer sees img2text, retrieval_fuse,
  text_condition in that order (``src/main.py:217-219``).

AdamW moments have the same shape as their parameters, so the moment tensors
convert through the SAME torch-name -> pytree mapping (including Linear
weight transposes) as the weights themselves (``models/convert.py``).

Both directions are provided:

* :func:`torch_opt_state_to_optax` — resume a reference checkpoint's
  optimizer moments into our optax state (VERDICT round-1 item 6),
* :func:`optax_opt_state_to_torch` — export our state in the exact torch
  layout so the reference's ``optimizer.load_state_dict`` can resume it.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from keds_tpu.models import convert
from keds_tpu.models.composition import FusionHeads


def _is_excluded(name: str) -> bool:
    """Reference's no-weight-decay predicate (src/main.py:215)."""
    return ("bn" in name or "ln" in name or "bias" in name
            or "logit_scale" in name)


def _named_param_order(heads: FusionHeads) -> List[Tuple[str, str]]:
    """(module, torch_name) pairs in the reference's named_parameters order."""
    out: List[Tuple[str, str]] = []
    # IM2TEXT: fc_out registered before the layers ModuleList
    out.append(("img2text", "fc_out.weight"))
    out.append(("img2text", "fc_out.bias"))
    for i in range(len(heads.img2text["layers"])):
        out.append(("img2text", f"layers.{i}.0.weight"))
        out.append(("img2text", f"layers.{i}.0.bias"))
    for mod in ("retrieval_fuse", "text_condition"):
        layers = getattr(heads, mod)
        for i in range(len(layers)):
            for part in ("to_q", "to_k", "to_v"):
                out.append((mod, f"cross_layers.{i}.{part}.weight"))
                out.append((mod, f"cross_layers.{i}.{part}.bias"))
            out.append((mod, f"cross_layers.{i}.to_out.0.weight"))
            out.append((mod, f"cross_layers.{i}.to_out.0.bias"))
    return out


def _global_index_order(heads: FusionHeads) -> List[Tuple[str, str]]:
    """Parameters in torch state-dict global-id order: group 0 (excluded:
    biases) first, then group 1, each preserving module order."""
    named = _named_param_order(heads)
    group0 = [p for p in named if _is_excluded(p[1])]
    group1 = [p for p in named if not _is_excluded(p[1])]
    return group0 + group1


def _moments_to_heads(moment_sds: Dict[str, Dict[str, np.ndarray]]) -> FusionHeads:
    """Per-module {torch_name: tensor} -> a FusionHeads-shaped pytree,
    reusing the weight converters (moments transpose like their params)."""
    return FusionHeads(
        img2text=convert.im2text_state_dict_to_pytree(moment_sds["img2text"]),
        retrieval_fuse=convert.crossformer_state_dict_to_pytree(
            moment_sds["retrieval_fuse"]),
        text_condition=convert.crossformer_state_dict_to_pytree(
            moment_sds["text_condition"]),
    )


def _heads_to_moment_sd(tree: FusionHeads) -> Dict[str, Dict[str, np.ndarray]]:
    return {
        "img2text": convert.im2text_pytree_to_state_dict(
            jax.tree.map(np.asarray, tree.img2text)),
        "retrieval_fuse": convert.crossformer_pytree_to_state_dict(
            jax.tree.map(np.asarray, tree.retrieval_fuse)),
        "text_condition": convert.crossformer_pytree_to_state_dict(
            jax.tree.map(np.asarray, tree.text_condition)),
    }


def looks_like_torch_opt_state(payload) -> bool:
    return isinstance(payload, dict) and "state" in payload and "param_groups" in payload


def torch_opt_state_to_optax(payload: dict, heads: FusionHeads,
                             template_state):
    """Map a torch AdamW state dict onto a freshly initialized optax adamw
    state (``template_state``).  Returns the new state, or the template with
    a warning if the parameter census doesn't line up."""
    order = _global_index_order(heads)
    state = payload.get("state", {})
    # torch serializes int keys; json/pickle round trips may stringify them
    state = {int(k): v for k, v in state.items()}
    n_expected = len(order)
    if state and (max(state) >= n_expected or len(state) > n_expected):
        logging.warning(
            "torch optimizer state has %d entries (max id %d) but the heads "
            "expose %d parameters; reinitializing optimizer",
            len(state), max(state), n_expected)
        return template_state
    if not state:
        return template_state

    exp_avg_sd: Dict[str, Dict[str, np.ndarray]] = {
        m: {} for m in ("img2text", "retrieval_fuse", "text_condition")}
    exp_avg_sq_sd = {m: {} for m in exp_avg_sd}
    step = 0
    for idx, (mod, name) in enumerate(order):
        entry = state.get(idx)
        if entry is None:  # params torch never updated keep zero moments
            continue
        exp_avg_sd[mod][name] = np.asarray(entry["exp_avg"], np.float32)
        exp_avg_sq_sd[mod][name] = np.asarray(entry["exp_avg_sq"], np.float32)
        step = max(step, int(np.asarray(entry["step"]).item()))

    # Fill any missing names with zeros from the template (torch lazily
    # creates state on first update).
    mu_template = next(
        (s.mu for s in template_state if "mu" in getattr(s, "_fields", ())),
        None)
    if mu_template is None:
        logging.warning("template optax state has no Adam moments; skipping")
        return template_state
    zero_sd = _heads_to_moment_sd(jax.tree.map(np.zeros_like, mu_template))
    for sd in (exp_avg_sd, exp_avg_sq_sd):
        for mod, names in zero_sd.items():
            for name, z in names.items():
                sd[mod].setdefault(name, z)

    mu = _moments_to_heads(exp_avg_sd)
    nu = _moments_to_heads(exp_avg_sq_sd)
    cast_like = lambda tree, ref: jax.tree.map(  # noqa: E731
        lambda a, r: jnp.asarray(a, r.dtype), tree, ref)

    count = jnp.asarray(step, jnp.int32)
    new_state = []
    for s in template_state:
        fields = getattr(s, "_fields", ())
        # NB: tuples expose a .count METHOD, so membership in _fields is the
        # only safe probe for namedtuple state fields.
        if "mu" in fields and "nu" in fields:
            new_state.append(s._replace(count=count,
                                        mu=cast_like(mu, s.mu),
                                        nu=cast_like(nu, s.nu)))
        elif "count" in fields:
            new_state.append(s._replace(count=count))
        else:
            new_state.append(s)
    logging.info("restored torch AdamW moments (%d params, step %d)",
                 len(state), step)
    return tuple(new_state)


def optax_opt_state_to_torch(opt_state, heads: FusionHeads, *,
                             lr: float, beta1: float, beta2: float,
                             eps: float, wd: float) -> dict:
    """Export optax adamw moments as a torch ``AdamW.state_dict()`` payload
    (reference layout: group 0 = no-decay gain/bias, group 1 = decayed)."""
    adam = next(
        (s for s in opt_state if "mu" in getattr(s, "_fields", ())), None)
    if adam is None:
        raise ValueError("opt_state carries no Adam moments")
    step = int(np.asarray(adam.count))
    mu_sd = _heads_to_moment_sd(adam.mu)
    nu_sd = _heads_to_moment_sd(adam.nu)
    order = _global_index_order(heads)
    state = {}
    for idx, (mod, name) in enumerate(order):
        state[idx] = {
            "step": np.float32(step),
            "exp_avg": mu_sd[mod][name],
            "exp_avg_sq": nu_sd[mod][name],
        }
    n0 = sum(1 for p in order if _is_excluded(p[1]))
    common = {"lr": lr, "betas": (beta1, beta2), "eps": eps,
              "amsgrad": False, "maximize": False, "foreach": None,
              "capturable": False, "differentiable": False, "fused": None}
    param_groups = [
        {**common, "weight_decay": 0.0, "params": list(range(n0))},
        {**common, "weight_decay": wd, "params": list(range(n0, len(order)))},
    ]
    return {"state": state, "param_groups": param_groups}
