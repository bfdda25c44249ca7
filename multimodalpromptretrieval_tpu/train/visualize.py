"""Attention-heatmap visualization (the --eval mode).

Reference behavior (utils.py:127-284 + main.py:365-380): for each question
id in ``logs/correct_ids.txt`` (or one ``--qid``), re-run the model on that
single example, collect encoder / cross attentions, and for every
(layer, head) save a figure overlaying the per-image-token attention mass
(the 49 grid patches; token 0 is CLS and is skipped, reference slice
``[1:51]``) on the original image under
``figures/<qid>/head<j>/attention<i>.pdf``.

Differences: attentions come from the JAX diagnostic forward
(models/t5.t5_forward_with_attentions) rather than HF output_attentions;
figures are identical in layout for the ``aggregate`` mode the driver uses.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp


def attention_maps(exp, entry: dict, split_name: str = "test"):
    """Run one example; returns dict with encoder/decoder/cross attentions,
    generated ids and decoded answer."""
    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.models.t5 import (
        t5_forward_with_attentions,
        t5_encode,
        t5_greedy_decode,
    )

    ids = exp.encode_entry(entry, split_name)
    input_ids = jnp.asarray([ids], jnp.int32)
    mask = jnp.ones_like(input_ids)
    images = jnp.asarray(exp.images.batch([entry["image_name"]]))
    embeds, full_mask = mprgen.combine_inputs(
        exp.params, exp.model_cfg, images, input_ids, mask)
    enc = t5_encode(exp.params["t5"], exp.model_cfg.t5, embeds, full_mask)
    out_ids = t5_greedy_decode(exp.params["t5"], exp.model_cfg.t5, enc,
                               full_mask, max_new_tokens=20)
    out = t5_forward_with_attentions(
        exp.params["t5"], exp.model_cfg.t5, embeds, full_mask, out_ids)
    answer = exp.tokenizer.decode(np.asarray(out_ids)[0],
                                  skip_special_tokens=True)
    return {
        "encoder_attentions": np.asarray(out["encoder_attentions"]),
        "cross_attentions": np.asarray(out["cross_attentions"]),
        "output_ids": np.asarray(out_ids),
        "predicted_answer": answer,
        "input_ids": ids,
    }


def visualize_attn_weights(exp, entry: dict, *,
                           attn_type: str = "cross_attentions",
                           aggregate: bool = True,
                           split_name: str = "test",
                           figures_root: str = "figures") -> int:
    """Save per-(layer, head) heatmap PDFs; returns the number written."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches
    from PIL import Image

    maps = attention_maps(exp, entry, split_name)
    weights = maps[attn_type]  # (L, B, H, Lq, Lk)
    n_layers, _, n_heads = weights.shape[:3]
    n_image_tokens = exp.model_cfg.num_image_tokens
    # ViT prefix = [CLS, grid²] (slice the CLS off); the RN path has no
    # CLS — its prefix is the bare grid² layer4 features
    has_cls = exp.model_cfg.resnet is None
    patch0 = 1 if has_cls else 0
    grid = int(round((n_image_tokens - patch0) ** 0.5))

    img_path = os.path.join(entry["dataroot"], "imgs", entry["image_name"])
    original = Image.open(img_path).resize((224, 224))
    xt = np.linspace(0, original.width, grid + 1)
    yt = np.linspace(0, original.height, grid + 1)
    gx, gy = xt[1] - xt[0], yt[1] - yt[0]

    written = 0
    for i in range(n_layers):
        for j in range(n_heads):
            if attn_type == "encoder_attentions":
                # attention FROM the patch tokens (rows 1..grid²+1), averaged
                # over all key positions — reference's aggregate mode
                alphas = weights[i, 0, j,
                                 patch0:n_image_tokens].mean(axis=-1)
            else:  # cross_attentions: decoder queries ATTEND TO patch keys
                alphas = weights[i, 0, j, :,
                                 patch0:n_image_tokens].mean(axis=0)
            rng_ = alphas.max() - alphas.min()
            alphas = (alphas - alphas.min()) / (rng_ if rng_ > 0 else 1.0)

            fig, ax = plt.subplots(1, 2, figsize=(12, 5))
            ax[0].imshow(original)
            ax[0].set_title("Original Image")
            ax[0].set_xlabel(entry["question"])
            ax[1].imshow(original)
            ax[1].set_title("Attention Activation on Image Tokens")
            for l in range(grid):
                for m in range(grid):
                    ax[1].add_patch(patches.Rectangle(
                        (xt[m], yt[l]), gx, gy, linewidth=1, fill=True,
                        facecolor="black",
                        alpha=float(1 - alphas[grid * l + m])))
            ax[1].set_xlabel(
                f"Predicted answer: {maps['predicted_answer']}\n"
                f"Correct answer: {entry['answer']}")
            for a in ax:
                a.set_xticks([])
                a.set_yticks([])
            out_dir = os.path.join(figures_root, str(entry["question_id"]),
                                   f"head{j}")
            os.makedirs(out_dir, exist_ok=True)
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, f"attention{i}.pdf"))
            plt.close(fig)
            written += 1
    return written


def visualize_correct_ids(exp, qid: Optional[str] = None,
                          figures_root: str = "figures",
                          limit: Optional[int] = None) -> int:
    """--eval driver parity (main.py:365-380): iterate correct_ids.txt (or a
    single --qid) and emit cross-attention figures."""
    if qid is not None:
        entry = exp.dataset_test.get_question_by_id(qid)
        if entry is None:
            raise ValueError(f"question id {qid!r} not in the test set")
        return visualize_attn_weights(exp, entry, figures_root=figures_root)
    path = os.path.join(exp.log_root, "correct_ids.txt")
    with open(path) as f:
        ids = [line.strip() for line in f if line.strip()]
    if limit:
        ids = ids[:limit]
    n = 0
    for i, q in enumerate(ids):
        entry = exp.dataset_test.get_question_by_id(q)
        if entry is None:
            continue
        n += visualize_attn_weights(exp, entry, figures_root=figures_root)
        exp.log(f"Finished image {i} out of {len(ids)}")
    return n
