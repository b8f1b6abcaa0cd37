"""Single-query retrieval demo producing an HTML page (reference
``src/demo.py`` + ``visualize_results``/``make_html``,
``src/eval_utils.py:192-287``).

    python -m keds_tpu.cli.demo --query_file q.jpg --prompts "a cartoon of *" \
        --retrieval-data imgnet --resume /path/to/ckpt.pt --root-data ./data

Corpus features are computed once and cached to
``./data/<name>-<fingerprint>.pkl`` with the reference's ``{feats, path}``
pickle layout; the fingerprint covers the weights + quant mode so a
checkpoint switch invalidates the cache (the reference keys only on the
dataset name and silently serves stale features).

Composition: the reference demo constructs an MLP ``IM2TEXT`` but calls it
with a 2-argument cross-attention signature (``src/demo.py:82`` vs
``src/eval_utils.py:249`` — PARITY.md #5).  Both intents are supported: a
CrossFormer checkpoint triggers late fusion over the prompt's token sequence;
an MLP checkpoint uses the pic2word map-and-splice path.
"""

from __future__ import annotations

import html as _html
import logging
import os
import pickle
import shutil


def make_html(prompts, query_image, image_paths_per_prompt, out_dir) -> str:
    """Result table HTML (reference make_html, eval_utils.py:268-287)."""
    rows = []
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    q_local = os.path.join("images", os.path.basename(query_image))
    shutil.copy(query_image, os.path.join(out_dir, q_local))
    for prompt, image_list in zip(prompts, image_paths_per_prompt):
        cells = [
            f'<td><p style="font-size:20px">{_html.escape(prompt)}</p></td>',
            f'<td><p style="margin-right:50px"><img src="{q_local}" height="100"></p></td>',
        ]
        for path in image_list:
            local = os.path.join("images", os.path.basename(path))
            shutil.copy(path, os.path.join(out_dir, local))
            cells.append(f'<td><img src="{local}" height="200"></td>')
        rows.append("<table><tr>" + "".join(cells) + "</tr></table>")
    return "".join(rows)


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from keds_tpu.cli.common import compute_dtype, setup_experiment, setup_runtime
    from keds_tpu.config import parse_args
    from keds_tpu.data.datasets import CIRR, CsvDataset, CustomFolder, FashionIQ, ImageList
    from keds_tpu.data.loader import DataLoader
    from keds_tpu.io.pt import load_pt
    from keds_tpu.models import clip as mclip, convert, heads as mheads
    from keds_tpu.models.loader import load_clip
    from keds_tpu.tokenizer import star_token_id, tokenize

    cfg = parse_args(argv)
    cfg = setup_experiment(cfg, require_fresh=False)
    setup_runtime(cfg)
    dtype = compute_dtype(cfg)

    # Orbax checkpoints (directories) carry the heads only — CLIP must then
    # come from --clip-weights / --model.
    resume_is_orbax = bool(cfg.resume) and os.path.isdir(cfg.resume)
    clip_source = ((cfg.clip_weights or cfg.model) if resume_is_orbax
                   else (cfg.resume or cfg.clip_weights or cfg.model))
    if resume_is_orbax and not cfg.clip_weights:
        logging.warning(
            "orbax --resume carries heads only and no --clip-weights was "
            "given: using CLIP from --model %r — make sure it is the tower "
            "the heads were trained against", cfg.model)
    clip_params, ccfg, _, t_val = load_clip(
        clip_source, normalize_on_host=not cfg.device_preprocess)
    from keds_tpu.models.convert import cast_floating
    from keds_tpu.ops.quant import maybe_quantize_clip

    clip_c = maybe_quantize_clip(cast_floating(clip_params, dtype),
                                 cfg.quant_towers)

    # img2text head from the checkpoint: CrossFormer -> late fusion,
    # MLP -> pic2word splice.
    img2text, late_fusion = None, False
    if resume_is_orbax:
        from keds_tpu.io.checkpoint import load_heads_checkpoint

        # dispatches to orbax; a plain (non-checkpoint) dir fails loudly
        img2text = load_heads_checkpoint(cfg.resume)[0].img2text
    elif cfg.resume and os.path.isfile(cfg.resume):
        ckpt = load_pt(cfg.resume)
        sd = ckpt.get("state_dict_img2text", {})
        if any(k.startswith("cross_layers") or k.startswith("module.cross_layers") for k in sd):
            img2text = convert.crossformer_state_dict_to_pytree(sd)
            late_fusion = True
        elif sd:
            img2text = convert.im2text_state_dict_to_pytree(sd)

    # CLIP params are jit arguments, not closures (closure constants inline
    # into the HLO; remote-compile backends reject the result — rule 3).
    # encode_image_chunked = the b32 macro schedule used by every other
    # encode consumer (engine/evaluators/raw step; normalizes u8 in-graph);
    # demo batches smaller than the chunk fall back to one shot.
    _enc = jax.jit(
        lambda cp, im: mclip.encode_image_chunked(
            cp, ccfg, im, mclip.DEFAULT_ENCODE_CHUNK))
    encode_image = lambda im: _enc(clip_c, im)  # noqa: E731

    # ---- retrieval corpus --------------------------------------------------
    root = cfg.root_data
    rd = cfg.retrieval_data or ""
    if "csv" in rd:
        dataset = CsvDataset(rd, t_val, img_key=cfg.csv_img_key,
                             caption_key=cfg.csv_caption_key,
                             sep=cfg.csv_separator, return_filename=True)
    elif rd == "imgnet":
        dataset = ImageList(os.path.join(root, "imgnet", "imgnet_targets.txt"),
                            root=root, transforms=t_val, is_labels=True,
                            return_filename=True)
    elif rd == "cirr":
        dataset = CIRR(transforms=t_val, root=root, mode="caps", vis_mode=True)
    elif rd in ("dress", "shirt", "toptee"):
        dataset = FashionIQ(cloth=rd, transforms=t_val, root=root,
                            mode="caps", vis_mode=True)
    elif rd == "coco":
        dataset = CustomFolder(os.path.join(root, "coco/val2017"), transform=t_val)
    else:
        raise SystemExit(f"unsupported --retrieval-data {rd!r}")

    # Cache key: dataset name PLUS the weights/quant identity — the
    # reference keys only on the dataset name (eval_utils.py:210-234), so a
    # checkpoint switch there silently ranks against stale features; here
    # the fingerprint invalidates the cache (round-3 review finding).
    import hashlib

    ident = (f"{clip_source}:{cfg.quant_towers}:{cfg.precision}"
             f":{int(cfg.device_preprocess)}")
    if os.path.isfile(str(clip_source)):
        st = os.stat(clip_source)
        ident += f":{st.st_mtime_ns}:{st.st_size}"
    fp = hashlib.sha1(ident.encode()).hexdigest()[:10]
    cache = os.path.join(
        "./data", f"{os.path.basename(rd).split('.')[0]}-{fp}.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            data = pickle.load(f)
        corpus, filenames = jnp.asarray(data["feats"]), data["path"]
    else:
        from keds_tpu.cli.common import pad_batch

        feats, filenames = [], []
        loader = DataLoader(dataset, cfg.batch_size, num_workers=cfg.workers,
                            worker_processes=cfg.worker_processes)
        try:
            for images, names in loader:
                n = np.asarray(images).shape[0]
                # ragged tail: pad, don't compile a second ViT program
                images = pad_batch(images, cfg.batch_size)
                f = encode_image(jnp.asarray(images))[:n]
                f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
                feats.append(np.asarray(f.astype(jnp.float32)))
                filenames.extend(names)
        finally:
            loader.close()
        corpus = jnp.asarray(np.concatenate(feats))
        os.makedirs("./data", exist_ok=True)
        with open(cache, "wb") as f:
            pickle.dump({"feats": np.asarray(corpus), "path": filenames}, f)

    # ---- per-query compose + rank -----------------------------------------
    prompts = (cfg.prompts or "a photo of *").split(",")
    text = jnp.asarray(tokenize(prompts))
    os.makedirs(cfg.demo_out, exist_ok=True)
    html_txt = ""
    from PIL import Image

    for query in (cfg.query_file or "").split(","):
        logging.info("retrieve image of %s", query)
        img = t_val(Image.open(query))
        feat = encode_image(jnp.asarray(img)[None])
        if late_fusion:
            # Late-fusion cross-attention over the prompt token sequence
            # (eval_utils.py:248-250): q = image embedding, kv = text tokens.
            # NB do NOT bucket `text` here: the cross-attention attends over
            # ALL 77 positions as keys/values — padding embeddings are real
            # kv entries in the reference math, unlike the splice-pool paths
            # where the causal-prefix truncation is exact.
            tok_seq, _ = mclip.get_text_tokens(clip_c, ccfg, text)
            q = jnp.broadcast_to(feat[:, None, :], (text.shape[0], 1, feat.shape[-1]))
            fused = mheads.crossformer_apply(
                [jax.tree.map(jnp.asarray, p) for p in img2text], q, tok_seq, tok_seq
            )
            composed = jnp.dot(fused[:, 0], clip_c["text"]["proj"].astype(fused.dtype))
        else:
            mapped = (mheads.im2text_apply(jax.tree.map(jnp.asarray, img2text), feat)
                      if img2text is not None else feat)
            pseudo = jnp.broadcast_to(mapped[:, None, :], (text.shape[0], 1, mapped.shape[-1]))
            composed = mclip.encode_text_img_retrieval(
                clip_c, ccfg, text, pseudo, split_id=star_token_id()
            )
        composed = composed / jnp.linalg.norm(composed, axis=-1, keepdims=True)
        sims = np.asarray(composed.astype(jnp.float32) @ corpus.T)
        order = np.argsort(-sims, axis=1)
        top10 = [[filenames[j] for j in order[i][:10]] for i in range(len(prompts))]
        for i, prompt in enumerate(prompts):
            logging.info("for prompt %r", prompt)
            for rank, name in enumerate(top10[i]):
                logging.info("top %d filename %s", rank, name)
        html_txt += make_html(prompts, query, top10, cfg.demo_out)

    with open(os.path.join(cfg.demo_out, "index.html"), "w") as f:
        f.write(html_txt)
    logging.info("wrote %s", os.path.join(cfg.demo_out, "index.html"))


if __name__ == "__main__":
    main()
