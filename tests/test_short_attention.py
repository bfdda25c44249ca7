"""Packed short-sequence attention kernel vs the XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodalpromptretrieval_tpu.ops.attention import multi_head_attention
from multimodalpromptretrieval_tpu.ops.short_attention import short_attention


@pytest.mark.parametrize("L", [50, 64, 17])
@pytest.mark.parametrize("group", [8, 4])
def test_matches_xla(L, group):
    rng = np.random.default_rng(0)
    B, H, Dh = 2, 4, 32
    q = jnp.asarray(rng.normal(size=(B, H, L, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, Dh)).astype(np.float32))
    ref = multi_head_attention(q, k, v, scale=Dh**-0.5, impl="xla")
    got = short_attention(q, k, v, scale=Dh**-0.5, group=group,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_group_reduces_when_not_divisible():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 6, 10, 16)).astype(np.float32))
    out = short_attention(q, q, q, scale=0.25, group=8, interpret=True)
    assert out.shape == (1, 6, 10, 16)
