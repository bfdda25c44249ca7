"""Fused L2 top-k vs a numpy reference (torch.cdist + argsort semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodalpromptretrieval_tpu.ops.topk import l2_topk


def _np_reference(query, index, k, skip_first=False):
    d = np.sqrt(((query[:, None, :] - index[None, :, :]) ** 2).sum(-1))
    order = np.argsort(d, axis=1, kind="stable")
    sl = slice(1, 1 + k) if skip_first else slice(0, k)
    idx = order[:, sl]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("skip_first", [False, True])
def test_topk_matches_numpy(impl, skip_first):
    rng = np.random.default_rng(0)
    B, N, D, k = 4, 333, 64, 5
    q = rng.normal(size=(B, D)).astype(np.float32)
    idx = rng.normal(size=(N, D)).astype(np.float32)
    ref_d, ref_i = _np_reference(q, idx, k, skip_first)
    d, i = l2_topk(jnp.asarray(q), jnp.asarray(idx), k, impl=impl,
                   skip_first=skip_first)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_topk_self_match(impl):
    """Queries drawn from the corpus: nearest must be the query itself, and
    skip_first must drop exactly that match (training-phase semantics,
    dataset/VQAFeatureDataset.py:194-195)."""
    rng = np.random.default_rng(1)
    N, D = 100, 32
    corpus = rng.normal(size=(N, D)).astype(np.float32)
    q = corpus[10:14]
    d, i = l2_topk(jnp.asarray(q), jnp.asarray(corpus), 3, impl=impl)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], [10, 11, 12, 13])
    np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-3)
    d2, i2 = l2_topk(jnp.asarray(q), jnp.asarray(corpus), 2, impl=impl,
                     skip_first=True)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i)[:, 1:])


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_topk_tie_break_lower_index(impl):
    """Duplicate corpus rows: the lower index must win (stable argsort)."""
    corpus = np.zeros((8, 16), np.float32)
    corpus[3] = 1.0
    corpus[6] = 1.0  # duplicate of row 3
    q = np.ones((1, 16), np.float32)
    _, i = l2_topk(jnp.asarray(q), jnp.asarray(corpus), 2, impl=impl)
    np.testing.assert_array_equal(np.asarray(i)[0], [3, 6])


def test_topk_large_block_boundary():
    """N not a multiple of the block size; k spanning blocks."""
    rng = np.random.default_rng(2)
    B, N, D, k = 2, 1537, 128, 15
    q = rng.normal(size=(B, D)).astype(np.float32)
    idx = rng.normal(size=(N, D)).astype(np.float32)
    ref_d, ref_i = _np_reference(q, idx, k)
    d, i = l2_topk(jnp.asarray(q), jnp.asarray(idx), k,
                   impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(i), ref_i)
