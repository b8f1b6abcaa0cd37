"""Train checkpoint save/load with reference-format parity.

Format (reference ``src/main.py:330-341``): one ``.pt`` dict —

    {epoch, name, state_dict (CLIP), state_dict_img2text,
     state_dict_retrieval_fuse, state_dict_text_condition, optimizer}

We read and write this exact layout (``module.`` prefixes stripped on read,
src/main.py:267-274).  The ``optimizer`` entry holds the optax state as a
nested numpy dict when we write (a torch AdamW state is not resumable into
optax and vice versa — resuming optimizer state works within one framework;
head/CLIP weights interchange both ways).

An orbax-native format is also supported (``--checkpoint-format orbax``) for
large-scale async checkpointing.
"""

from __future__ import annotations

import functools
import logging
import os
import re
from typing import Optional, Tuple

import jax
import numpy as np

from keds_tpu.io.pt import load_pt, save_pt
from keds_tpu.models import convert
from keds_tpu.models.composition import FusionHeads


def save_train_checkpoint(
    path: str,
    *,
    epoch: int,
    name: str,
    clip_params: dict,
    clip_cfg,
    heads: FusionHeads,
    opt_state=None,
    fmt: str = "pt",
    opt_hparams: Optional[dict] = None,
) -> None:
    """``opt_hparams`` = {lr, beta1, beta2, eps, wd}: when given (the train
    CLI passes them), the ``optimizer`` entry ALSO carries the exact torch
    ``AdamW.state_dict()`` layout so the reference can ``load_state_dict``
    our checkpoints (src/main.py:279-280) — full cross-framework resume."""
    if fmt == "orbax":
        _save_orbax(path, epoch=epoch, name=name, heads=heads, opt_state=opt_state)
        return
    to_np = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
    # Optimizer state is stored as flattened leaves so the .pt stays loadable
    # without optax class definitions; restore via restore_opt_state().
    opt_payload = {}
    if opt_state is not None:
        leaves = jax.tree.leaves(opt_state)
        opt_payload = {"leaves": [np.asarray(l) for l in leaves]}
        if opt_hparams is not None:
            from keds_tpu.io.opt_convert import optax_opt_state_to_torch

            try:
                opt_payload.update(optax_opt_state_to_torch(
                    opt_state, heads,
                    lr=opt_hparams["lr"], beta1=opt_hparams["beta1"],
                    beta2=opt_hparams["beta2"], eps=opt_hparams["eps"],
                    wd=opt_hparams["wd"]))
            except ValueError as e:  # no Adam moments (e.g. custom opt)
                logging.debug("torch-format optimizer export skipped: %s", e)
    payload = {
        "epoch": epoch,
        "name": name,
        "state_dict": convert.clip_pytree_to_state_dict(to_np(clip_params), clip_cfg),
        "state_dict_img2text": convert.im2text_pytree_to_state_dict(to_np(heads.img2text)),
        "state_dict_retrieval_fuse": convert.crossformer_pytree_to_state_dict(
            to_np(heads.retrieval_fuse)
        ),
        "state_dict_text_condition": convert.crossformer_pytree_to_state_dict(
            to_np(heads.text_condition)
        ),
        "optimizer": opt_payload,
    }
    save_pt(payload, path)
    logging.info("saved checkpoint %s (epoch %d)", path, epoch)


def load_heads_checkpoint(path: str, _ckpt: Optional[dict] = None
                          ) -> Tuple[FusionHeads, int]:
    """Load the 3 head modules from a reference-format checkpoint
    (reference load_model_without_definition, src/eval_utils.py:59-86 — with
    its undefined-``sd`` bug repaired).  ``_ckpt`` lets callers that already
    unpickled the file reuse it (a full ViT-L train checkpoint is ~1.7 GB;
    re-reading it doubles resume/eval load latency).

    Orbax checkpoints are directories (``--checkpoint-format orbax`` writes a
    dir named ``epoch_N.pt``); dispatch on that so resume, the eval sweeps and
    serve consume either format transparently."""
    if _ckpt is None and os.path.isdir(path):
        if not is_orbax_checkpoint(path):
            raise ValueError(
                f"{path} is a directory but not an orbax checkpoint "
                "(no _CHECKPOINT_METADATA/_METADATA marker) — pass a "
                "checkpoint file, or the epoch_N.pt dir written by "
                "--checkpoint-format orbax")
        return load_orbax_heads(path)
    ckpt = _ckpt if _ckpt is not None else load_pt(path)
    heads = FusionHeads(
        img2text=convert.im2text_state_dict_to_pytree(ckpt["state_dict_img2text"]),
        retrieval_fuse=convert.crossformer_state_dict_to_pytree(
            ckpt["state_dict_retrieval_fuse"]
        ),
        text_condition=convert.crossformer_state_dict_to_pytree(
            ckpt["state_dict_text_condition"]
        ),
    )
    epoch = int(ckpt.get("epoch", 0))
    logging.info("=> loaded checkpoint '%s' (epoch %d)", path, epoch)
    return heads, epoch


def load_full_checkpoint(path: str):
    """Load CLIP params + heads (+epoch) from a train checkpoint (one
    unpickle; the file is read exactly once)."""
    ckpt = load_pt(path)
    clip_params, cfg = convert.clip_state_dict_to_pytree(ckpt["state_dict"])
    heads, epoch = load_heads_checkpoint(path, _ckpt=ckpt)
    return clip_params, cfg, heads, epoch


def restore_opt_state(path: str, template_opt_state, heads: Optional[FusionHeads] = None):
    """Rebuild an optax state from a checkpoint's ``optimizer`` entry
    (reference restores the torch optimizer dict, src/main.py:279-280).

    Three source layouts are accepted:

    * our flattened-leaves payload (exact self-resume),
    * a torch ``AdamW.state_dict()`` from a reference checkpoint — the
      moments are mapped per parameter through the weight converters
      (``io/opt_convert.py``); requires ``heads`` for the parameter census,
    * an orbax checkpoint directory — restored against the template so the
      optax state classes round-trip exactly,
    * anything else / missing -> fresh template state.
    """
    if os.path.isdir(path):
        return _restore_orbax_opt_state(path, template_opt_state)
    ckpt = load_pt(path)
    payload = ckpt.get("optimizer", {})
    leaves = payload.get("leaves") if isinstance(payload, dict) else None
    if leaves:
        treedef = jax.tree.structure(template_opt_state)
        if treedef.num_leaves != len(leaves):
            logging.warning("optimizer state in %s does not match; reinitializing", path)
            return template_opt_state
        return jax.tree.unflatten(treedef, leaves)
    from keds_tpu.io.opt_convert import (
        looks_like_torch_opt_state,
        torch_opt_state_to_optax,
    )

    if looks_like_torch_opt_state(payload):
        if heads is None:
            logging.warning(
                "checkpoint %s has a torch optimizer state but no heads were "
                "provided for the parameter census; reinitializing", path)
            return template_opt_state
        return torch_opt_state_to_optax(payload, heads, template_opt_state)
    return template_opt_state


def resolve_resume(resume: Optional[str], checkpoint_dir: str) -> Optional[str]:
    """``--resume auto`` scans the checkpoint dir for the latest
    ``epoch_N.pt`` (reference src/main.py:245-252)."""
    if resume != "auto":
        return resume
    if not os.path.isdir(checkpoint_dir):
        return None
    best, best_epoch = None, -1
    for fn in os.listdir(checkpoint_dir):
        m = re.match(r"epoch_(\d+)\.pt$", fn)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(checkpoint_dir, fn)
    return best


def _save_orbax(path: str, **payload) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # Convert to host numpy BEFORE handing to orbax: the train CLI saves on
    # process 0 only (reference rank-0 convention), but orbax treats
    # non-fully-addressable jax arrays as a COLLECTIVE save and deadlocks
    # waiting for the other processes.  Heads/opt state are replicated, so
    # every process holds a complete local copy and a host fetch is exact.
    to_np = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
    with ocp.StandardCheckpointer() as ckptr:
        tree = {
            "epoch": payload["epoch"],
            "heads": to_np(payload["heads"]._asdict()),
        }
        if payload.get("opt_state") is not None:
            tree["opt_state"] = to_np(payload["opt_state"])
        ckptr.save(path, tree, force=True)


def is_orbax_checkpoint(path: str) -> bool:
    """True when ``path`` is one orbax checkpoint directory (vs a plain
    directory, or a branch dir CONTAINING epoch_N.pt checkpoints)."""
    return os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
        or os.path.exists(os.path.join(path, "_METADATA")))


def _delistify(tree):
    """Orbax restores (without a target) turn lists into {"0": ..} dicts on
    some versions; map digit-keyed dicts back to lists so the crossformer
    layer stacks stay iterable."""
    if isinstance(tree, dict):
        if tree and all(k.isdigit() for k in tree):
            return [_delistify(tree[k]) for k in sorted(tree, key=int)]
        return {k: _delistify(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_delistify(v) for v in tree)
    return tree


@functools.lru_cache(maxsize=1)
def _orbax_restore_raw_cached(path: str, mtime_ns: int):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def _orbax_restore_raw(path: str):
    """One untargeted restore of the whole checkpoint tree, shared between
    the heads load and the optimizer-state restore (resume reads both; a
    ViT-L-scale tree re-read per consumer doubles resume latency).  maxsize=1
    and keyed by directory mtime: a resume touches exactly one checkpoint,
    and an overwritten epoch_latest.pt-style dir gets a fresh read."""
    return _orbax_restore_raw_cached(path, os.stat(path).st_mtime_ns)


def load_orbax_heads(path: str) -> Tuple[FusionHeads, int]:
    tree = _orbax_restore_raw(os.path.abspath(path))
    heads = FusionHeads(**{k: _delistify(v) for k, v in tree["heads"].items()})
    logging.info("=> loaded orbax checkpoint '%s' (epoch %d)", path,
                 int(tree["epoch"]))
    return heads, int(tree["epoch"])


def _restore_orbax_opt_state(path: str, template_opt_state):
    raw = _orbax_restore_raw(os.path.abspath(path))
    if "opt_state" not in raw:
        logging.warning("orbax checkpoint %s has no optimizer state; "
                        "reinitializing", path)
        return template_opt_state
    # The untargeted restore returns plain containers (lists come back as
    # digit-keyed dicts on some orbax versions — _delistify fixes the
    # ordering: string-sorted keys would transplant moments of leaf 10
    # before leaf 2).  Unflattening against the template treedef restores
    # the real optax state classes (ScaleByAdamState etc.) positionally.
    restored = _delistify(raw["opt_state"])
    leaves = jax.tree.leaves(restored)
    treedef = jax.tree.structure(template_opt_state)
    t_leaves = jax.tree.leaves(template_opt_state)
    if treedef.num_leaves != len(leaves) or any(
            np.shape(a) != np.shape(b) for a, b in zip(leaves, t_leaves)):
        logging.warning("optimizer state in %s does not match the current "
                        "optimizer (leaves %d vs %d); reinitializing",
                        path, len(leaves), treedef.num_leaves)
        return template_opt_state
    return jax.tree.unflatten(treedef, leaves)
