"""Pallas flash attention vs the XLA reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodalpromptretrieval_tpu.ops.attention import multi_head_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_flash_matches_reference(causal, with_bias, with_mask):
    B, H, Lq, Lk, Dh = 2, 3, 50, 50, 16
    if causal:
        Lk = Lq
    q = _rand((B, H, Lq, Dh), 0)
    k = _rand((B, H, Lk, Dh), 1)
    v = _rand((B, H, Lk, Dh), 2)
    bias = _rand((1, H, Lq, Lk), 3) if with_bias else None
    mask = None
    if with_mask:
        m = np.ones((B, Lk), np.int32)
        m[0, -7:] = 0
        mask = jnp.asarray(m)
    ref = multi_head_attention(q, k, v, bias=bias, kv_mask=mask,
                               causal=causal, scale=0.25, impl="xla")
    got = multi_head_attention(q, k, v, bias=bias, kv_mask=mask,
                               causal=causal, scale=0.25,
                               impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_unscaled_t5_style():
    """T5 uses scale=1.0 and an additive relative-position bias."""
    B, H, L, Dh = 1, 4, 33, 8  # odd length exercises padding
    q = _rand((B, H, L, Dh), 4) * 0.3
    k = _rand((B, H, L, Dh), 5) * 0.3
    v = _rand((B, H, L, Dh), 6)
    bias = _rand((1, H, L, L), 7)
    ref = multi_head_attention(q, k, v, bias=bias, scale=1.0, impl="xla")
    got = multi_head_attention(q, k, v, bias=bias, scale=1.0,
                               impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_per_batch_bias_broadcast():
    """bias with full batch dimension (B, H, Lq, Lk)."""
    B, H, L, Dh = 3, 2, 16, 8
    q = _rand((B, H, L, Dh), 8)
    k = _rand((B, H, L, Dh), 9)
    v = _rand((B, H, L, Dh), 10)
    bias = _rand((B, H, L, L), 11)
    ref = multi_head_attention(q, k, v, bias=bias, impl="xla")
    got = multi_head_attention(q, k, v, bias=bias, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
