"""ops/decode_attention: fused single-query attention vs the XLA reference.

The greedy decode loop (models/t5.py t5_greedy_decode) rides this kernel
for both self- and cross-attention; these tests pin its math to the
reference formula (ops.attention._attention_xla at Lq=1) across the
bias/mask feature matrix, plus the end-to-end guarantee that the decode
loop still reproduces the teacher-forced argmax rollout (the stronger
HF-parity check lives in tests/test_t5_parity.py).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from multimodalpromptretrieval_tpu.ops.attention import (  # noqa: E402
    multi_head_attention,
)
from multimodalpromptretrieval_tpu.ops.decode_attention import (  # noqa: E402
    decode_attention,
    decode_attention_fused,
    decode_attention_indicator,
    decode_attention_reference,
)


def _mha_oracle(q, k, v, bias, kv_mask, heads, scale):
    """Route through the 4-D multi_head_attention as the independent oracle."""
    B, T, W = k.shape
    Dh = W // heads

    def split(x, L):
        return jnp.transpose(x.reshape(B, L, heads, Dh), (0, 2, 1, 3))

    out = multi_head_attention(
        split(q[:, None, :], 1), split(k, T), split(v, T),
        bias=None if bias is None else bias[None, :, None, :],
        kv_mask=None if kv_mask is None else kv_mask.astype(bool),
        causal=False, scale=scale, impl="xla")
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, W)


@pytest.mark.parametrize("has_bias", [False, True])
@pytest.mark.parametrize("has_mask", [False, True])
@pytest.mark.parametrize("B,T,W,H", [(8, 12, 128, 2), (5, 7, 256, 4)])
def test_kernel_matches_reference(has_bias, has_mask, B, T, W, H):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, W)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, W)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, W)), jnp.float32)
    bias = (jnp.asarray(rng.normal(size=(H, T)), jnp.float32)
            if has_bias else None)
    mask = None
    if has_mask:
        mask = jnp.asarray(rng.integers(0, 2, size=(B, T)), jnp.int32)
        mask = mask.at[:, 0].set(1)  # at least one valid key per row
    got = decode_attention(q, k, v, bias, mask, heads=H, scale=0.5,
                           interpret=True)
    ind = decode_attention_indicator(q, k, v, bias, mask, heads=H, scale=0.5)
    fus = decode_attention_fused(q, k, v, bias, mask, heads=H, scale=0.5,
                                 interpret=True)
    ref = decode_attention_reference(q, k, v, bias, mask, heads=H, scale=0.5)
    oracle = _mha_oracle(q, k, v, bias, mask, H, 0.5)
    for name, out in (("pallas", got), ("indicator", ind), ("fused", fus)):
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)


def test_reference_fallback_on_unaligned_width():
    """W % 128 != 0 routes to the XLA reference outside interpret mode."""
    rng = np.random.default_rng(1)
    B, T, W, H = 4, 6, 48, 4
    q = jnp.asarray(rng.normal(size=(B, W)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, W)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, W)), jnp.float32)
    got = decode_attention(q, k, v, heads=H, scale=1.0, interpret=False)
    ref = decode_attention_reference(q, k, v, heads=H, scale=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_bf16_matches_reference_formula():
    rng = np.random.default_rng(2)
    B, T, W, H = 16, 10, 128, 2
    q = jnp.asarray(rng.normal(size=(B, W)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, W)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, W)), jnp.bfloat16)
    got = decode_attention(q, k, v, heads=H, scale=1.0, interpret=True)
    ref = decode_attention_reference(q, k, v, heads=H, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_decode_impls_produce_identical_tokens():
    """cfg.decode_attention_impl picks the cache layout + attention path
    (head-layout XLA einsum vs row-layout Pallas kernel vs row-layout
    indicator dots); greedy ids must not depend on it."""
    import dataclasses

    from multimodalpromptretrieval_tpu.models.t5 import (
        T5Config,
        init_t5,
        t5_encode,
        t5_greedy_decode,
    )

    cfg = T5Config.tiny()
    params = init_t5(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(size=(3, 9, cfg.d_model)), jnp.float32)
    mask = jnp.asarray(np.tri(3, 9, 7, dtype=np.int32)[:, ::-1].copy())
    enc = t5_encode(params, cfg, embeds, mask)
    outs = [
        np.asarray(t5_greedy_decode(
            params, dataclasses.replace(cfg, decode_attention_impl=impl),
            enc, mask, max_new_tokens=6))
        for impl in ("xla", "pallas", "indicator", "fused")
    ]
    for other in outs[1:]:
        np.testing.assert_array_equal(outs[0], other)
