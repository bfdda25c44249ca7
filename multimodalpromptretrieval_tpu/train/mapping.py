"""Cross-modal mapping trainer: align CLIP image features to T5 text space.

Counterpart of the reference's create_mapping.py (class at :18-46, trainer
at :89-279). The module itself (MLP + learned logit_scale) lives in
models/mprgen.{init_mapping,mapping_apply} and hooks into the image-token
path when ``use_mapping`` is set (T5VisionModel.py:136-137 — inert in the
reference's main path, main.py always passes mapping_checkpoint=None).

The reference trainer is STALE (imports a nonexistent module layout and
batch keys — SURVEY.md component #10); this is the working equivalent:
CLIP-style symmetric InfoNCE between mapped image features and text
features, a top-k retrieval eval, and a 2-D PCA scatter of both modalities
(numpy SVD — no sklearn dependency).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models.mprgen import (
    init_mapping,
    mapping_apply,
)
from multimodalpromptretrieval_tpu.train.optim import adamw_init, adamw_update


def contrastive_loss(params, image_feats, text_feats):
    """Symmetric CE over cosine logits (create_mapping.py:25-37 semantics:
    mapped image features vs target text features, learned temperature)."""
    mapped = mapping_apply(params, image_feats)
    mapped = mapped / jnp.linalg.norm(mapped, axis=-1, keepdims=True)
    text = text_feats / jnp.linalg.norm(text_feats, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits = scale * mapped @ text.T
    labels = jnp.arange(logits.shape[0])
    li = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=1), labels[:, None], 1))
    lt = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(logits.T, axis=1), labels[:, None], 1))
    return 0.5 * (li + lt)


def train_mapping(image_feats: np.ndarray, text_feats: np.ndarray, *,
                  epochs: int = 30, batch_size: int = 64, lr: float = 1e-4,
                  seed: int = 0, quiet: bool = True) -> Dict:
    """Fit the mapping on paired (N, D) features. Returns the params."""
    dim = image_feats.shape[1]
    key = jax.random.PRNGKey(seed)
    params = init_mapping(key, dim)
    opt = adamw_init(params)

    @jax.jit
    def step(params, opt, img, txt):
        loss, grads = jax.value_and_grad(contrastive_loss)(params, img, txt)
        params, opt = adamw_update(params, grads, opt, lr)
        return params, opt, loss

    n = image_feats.shape[0]
    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = rng.permutation(n)
        total = 0.0
        for s in range(0, n - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            params, opt, loss = step(
                params, opt, jnp.asarray(image_feats[idx]),
                jnp.asarray(text_feats[idx]))
            total += float(loss)
        if not quiet:
            print(f"epoch {epoch}: loss {total / max(1, n // batch_size):.4f}")
    return params


def retrieval_accuracy(params, image_feats, text_feats,
                       k: int = 5) -> float:
    """Top-k image->text retrieval accuracy (create_mapping.py eval)."""
    mapped = mapping_apply(params, jnp.asarray(image_feats))
    mapped = mapped / jnp.linalg.norm(mapped, axis=-1, keepdims=True)
    text = jnp.asarray(text_feats)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    sims = mapped @ text.T
    topk = jax.lax.top_k(sims, k)[1]
    hits = jnp.any(topk == jnp.arange(sims.shape[0])[:, None], axis=1)
    return float(jnp.mean(hits))


def pca_2d(x: np.ndarray) -> np.ndarray:
    """2-component PCA via SVD (replaces sklearn in the reference viz)."""
    x = np.asarray(x, np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return (x @ vt[:2].T).astype(np.float32)


def visualize_mapping(params, image_feats, text_feats,
                      out_path: Optional[str] = None):
    """PCA scatter of mapped image features vs text features
    (create_mapping.py:49-86 counterpart). Returns the 2-D points."""
    mapped = np.asarray(mapping_apply(params, jnp.asarray(image_feats)))
    both = np.concatenate([mapped, np.asarray(text_feats)], axis=0)
    pts = pca_2d(both)
    n = mapped.shape[0]
    if out_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        ax.scatter(pts[:n, 0], pts[:n, 1], s=8, label="mapped image feats")
        ax.scatter(pts[n:, 0], pts[n:, 1], s=8, label="text feats")
        ax.legend()
        fig.savefig(out_path)
        plt.close(fig)
    return pts[:n], pts[n:]
