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


def test_row_attention_gradient_matches_xla():
    """custom VJP of the row-layout kernel == autodiff through the XLA
    attention formula."""
    import jax

    from multimodalpromptretrieval_tpu.ops.row_attention import row_attention

    rng = np.random.default_rng(5)
    B, L, H, Dh = 2, 10, 4, 16
    W = H * Dh
    q = jnp.asarray(rng.normal(size=(B, L, W)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, W)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, W)).astype(np.float32))

    def xla_ref(q, k, v):
        sp = lambda y: jnp.transpose(y.reshape(B, L, H, Dh), (0, 2, 1, 3))
        s = jnp.einsum("bhqd,bhkd->bhqk", sp(q), sp(k)) * Dh**-0.5
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, sp(v))
        return jnp.sum(jnp.transpose(o, (0, 2, 1, 3)).reshape(B, L, W) ** 2)

    def row(q, k, v):
        o = row_attention(q, k, v, heads=H, scale=Dh**-0.5, interpret=True)
        return jnp.sum(o ** 2)

    g_ref = jax.grad(xla_ref, argnums=(0, 1, 2))(q, k, v)
    g_row = jax.grad(row, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_row, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
