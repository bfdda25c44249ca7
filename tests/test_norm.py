"""ops/norm: fused single-pass LayerNorm/RMSNorm vs the jnp reference.

The ViT row path (models/clip.py) and T5-encoder row path (models/t5.py)
ride these kernels; numerics must match ops/layers.py exactly at fp32 and
to bf16 rounding otherwise, and gradients must equal XLA autodiff (the
custom VJP recomputes the jnp backward).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from multimodalpromptretrieval_tpu.ops.layers import (  # noqa: E402
    layer_norm,
    rms_norm,
)
from multimodalpromptretrieval_tpu.ops.norm import (  # noqa: E402
    fused_layer_norm,
    fused_rms_norm,
)


@pytest.mark.parametrize("N,W", [(64, 128), (1000, 256), (2048, 768)])
def test_layer_norm_matches_reference(N, W):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, W)) * 3 + 1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(W,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(W,)), jnp.float32)
    got = np.asarray(fused_layer_norm(x, w, b))
    ref = np.asarray(layer_norm(x, w, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("N,W", [(64, 128), (512, 512)])
def test_rms_norm_matches_reference(N, W):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, W)) * 2, jnp.float32)
    w = jnp.asarray(rng.normal(size=(W,)), jnp.float32)
    got = np.asarray(fused_rms_norm(x, w))
    ref = np.asarray(rms_norm(x, w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fallback_shapes_are_exact():
    """Unaligned widths / tiny row counts route to the jnp implementation
    (bitwise identical)."""
    rng = np.random.default_rng(2)
    for N, W in [(7, 128), (64, 96), (4, 32)]:
        x = jnp.asarray(rng.normal(size=(N, W)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(W,)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(W,)), jnp.float32)
        assert np.array_equal(np.asarray(fused_layer_norm(x, w, b)),
                              np.asarray(layer_norm(x, w, b)))
        assert np.array_equal(np.asarray(fused_rms_norm(x, w)),
                              np.asarray(rms_norm(x, w)))


def test_3d_and_bf16():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 50, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(128,)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.bfloat16)
    got = np.asarray(fused_layer_norm(x, w, b), np.float32)
    ref = np.asarray(layer_norm(x, w, b), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    assert got.shape == (8, 50, 128)


def test_gradients_match_autodiff():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

    def loss_fused(x, w, b):
        return jnp.sum(jnp.sin(fused_layer_norm(x, w, b)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.sin(layer_norm(x, w, b)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)

    def rms_fused(x, w):
        return jnp.sum(jnp.cos(fused_rms_norm(x, w)))

    def rms_ref(x, w):
        return jnp.sum(jnp.cos(rms_norm(x, w)))

    g1 = jax.grad(rms_fused, argnums=(0, 1))(x, w)
    g2 = jax.grad(rms_ref, argnums=(0, 1))(x, w)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)
