"""ops/row_attention: packed-QKV kernel vs the split kernel vs XLA.

The ViT and T5-encoder row paths (models/clip.py, models/t5.py) feed the
fused QKV GEMM output straight into ``row_attention_packed``; these tests
pin its math (incl. the causal text-tower mode) and gradients to the
unpacked kernel and the plain XLA attention.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from multimodalpromptretrieval_tpu.ops.attention import (  # noqa: E402
    multi_head_attention,
)
from multimodalpromptretrieval_tpu.ops.row_attention import (  # noqa: E402
    row_attention,
    row_attention_packed,
)


def _xla(q, k, v, bias, kv_mask, heads, scale, causal=False):
    B, L, W = q.shape
    Dh = W // heads

    def split(x):
        return jnp.transpose(x.reshape(B, L, heads, Dh), (0, 2, 1, 3))

    out = multi_head_attention(
        split(q), split(k), split(v),
        bias=None if bias is None else bias[None],
        kv_mask=None if kv_mask is None else kv_mask.astype(bool),
        causal=causal, scale=scale, impl="xla")
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, L, W)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_matches_xla(causal, with_bias, with_mask):
    rng = np.random.default_rng(0)
    B, L, W, H = 3, 10, 64, 4
    q = jnp.asarray(rng.normal(size=(B, L, W)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, W)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, W)), jnp.float32)
    bias = (jnp.asarray(rng.normal(size=(H, L, L)), jnp.float32)
            if with_bias else None)
    mask = None
    if with_mask:
        mask = jnp.asarray(rng.integers(0, 2, size=(B, L)), jnp.int32)
        mask = mask.at[:, 0].set(1)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    got = row_attention_packed(qkv, bias, mask, heads=H, scale=0.25,
                               causal=causal, interpret=True)
    ref = _xla(q, k, v, bias, mask, H, 0.25, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_matches_unpacked():
    rng = np.random.default_rng(1)
    B, L, W, H = 2, 8, 32, 2
    q = jnp.asarray(rng.normal(size=(B, L, W)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, W)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, W)), jnp.float32)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    a = row_attention_packed(qkv, heads=H, scale=1.0, interpret=True)
    b = row_attention(q, k, v, heads=H, scale=1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_packed_gradients_match_xla(causal):
    rng = np.random.default_rng(2)
    B, L, W, H = 2, 6, 32, 2
    qkv = jnp.asarray(rng.normal(size=(B, L, 3 * W)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, L, L)), jnp.float32)

    def loss_packed(qkv, bias):
        return jnp.sum(jnp.sin(row_attention_packed(
            qkv, bias, heads=H, scale=0.5, causal=causal, interpret=True)))

    def loss_xla(qkv, bias):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return jnp.sum(jnp.sin(_xla(q, k, v, bias, None, H, 0.5,
                                    causal=causal)))

    g1 = jax.grad(loss_packed, argnums=(0, 1))(qkv, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(qkv, bias)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grouped_blockdiag_packing_bit_exact(causal):
    """Grouped block-diagonal packing (models/clip.py row path): reshaping
    (B, L, 3W) -> (B/G, G·L, 3W) with a -1e9 off-block additive bias must
    match the ungrouped kernel — the reshape preserves within-block order,
    the causal iota over G·L keeps per-sequence causality, and -1e9
    underflows to exactly 0 through the fp32 softmax. Mathematically
    identical; tolerance only for the backend's K=G·L vs K=L dot
    accumulation-tree rounding (bit-exact on the MXU,
    scripts/probe_grouped_text.py)."""
    rng = np.random.default_rng(4)
    B, L, W, H = 8, 16, 64, 4
    qkv = jnp.asarray(rng.normal(size=(B, L, 3 * W)), jnp.float32)
    base = row_attention_packed(qkv, heads=H, scale=0.25, causal=causal,
                                interpret=True)
    for G in (2, 4, 8):
        pos = jnp.arange(G * L) // L
        bias = jnp.broadcast_to(
            jnp.where(pos[:, None] == pos[None, :], 0.0,
                      -1e9)[None].astype(jnp.float32), (H, G * L, G * L))
        got = row_attention_packed(
            qkv.reshape(B // G, G * L, 3 * W), bias, heads=H, scale=0.25,
            causal=causal, interpret=True).reshape(B, L, W)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)


def test_packed_bias_grad_dtype_matches_primal():
    """causal=True folds the mask into a fp32 eff_bias for the recompute
    backward; the bias cotangent must still come back in the PRIMAL bias
    dtype or custom_vjp rejects it."""
    rng = np.random.default_rng(3)
    B, L, W, H = 2, 6, 32, 2
    qkv = jnp.asarray(rng.normal(size=(B, L, 3 * W)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, L, L)), jnp.bfloat16)

    def loss(qkv, bias):
        return jnp.sum(row_attention_packed(
            qkv, bias, heads=H, scale=0.5, causal=True,
            interpret=True).astype(jnp.float32))

    _, g_bias = jax.grad(loss, argnums=(0, 1))(qkv, bias)
    assert g_bias.dtype == jnp.bfloat16
