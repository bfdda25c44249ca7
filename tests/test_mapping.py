"""Cross-modal mapping: training aligns modalities; PCA/retrieval eval."""

import numpy as np

import jax

from multimodalpromptretrieval_tpu.models.mprgen import (
    init_mapping,
    mapping_apply,
)
from multimodalpromptretrieval_tpu.train.mapping import (
    contrastive_loss,
    pca_2d,
    retrieval_accuracy,
    train_mapping,
    visualize_mapping,
)


def _paired(n=96, d=32, seed=0):
    """Text feats = a fixed linear transform of image feats + noise — a
    learnable alignment."""
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(n, d)).astype(np.float32)
    w = rng.normal(size=(d, d)).astype(np.float32) / np.sqrt(d)
    txt = img @ w + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
    return img, txt


def test_mapping_shapes_and_loss_finite():
    img, txt = _paired()
    params = init_mapping(jax.random.PRNGKey(0), img.shape[1])
    out = mapping_apply(params, img)
    assert out.shape == img.shape
    assert np.isfinite(float(contrastive_loss(params, img, txt)))


def test_training_improves_retrieval():
    img, txt = _paired()
    params0 = init_mapping(jax.random.PRNGKey(0), img.shape[1])
    before = retrieval_accuracy(params0, img, txt, k=5)
    params = train_mapping(img, txt, epochs=60, batch_size=32, lr=1e-3)
    after = retrieval_accuracy(params, img, txt, k=5)
    assert after > before
    assert after > 0.5


def test_pca_2d_shape():
    x = np.random.default_rng(0).normal(size=(40, 16))
    p = pca_2d(x)
    assert p.shape == (40, 2)


def test_visualize_mapping_writes_file(tmp_path):
    img, txt = _paired(n=32)
    params = init_mapping(jax.random.PRNGKey(0), img.shape[1])
    out = str(tmp_path / "viz.pdf")
    a, b = visualize_mapping(params, img, txt, out_path=out)
    assert a.shape == (32, 2) and b.shape == (32, 2)
    import os

    assert os.path.getsize(out) > 0
