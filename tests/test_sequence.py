"""Sequence parallelism (parallel/sequence.py) on the 8-device CPU mesh.

Ring attention over a ("data","seq") mesh must reproduce the single-device
XLA attention (ops.attention.multi_head_attention) on the gathered
sequence — including T5's no-scale convention, additive bias, padding
masks (with the same finite -1e9 semantics for fully-masked rows), causal
masking, and gradients (autodiff through the ppermute ring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.ops.attention import multi_head_attention
from multimodalpromptretrieval_tpu.parallel import sequence as sp


@pytest.fixture(scope="module")
def seq_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sp.get_seq_mesh(n_data=2, n_seq=4)


def _qkv(B=4, H=4, L=16, Dh=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(B, H, L, Dh)).astype(np.float32))
    return mk(), mk(), mk()


def test_ring_matches_xla_plain(seq_mesh):
    q, k, v = _qkv()
    ref = multi_head_attention(q, k, v, impl="xla")
    got = sp.make_sp_attention(seq_mesh)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_bias_mask_t5_scale(seq_mesh):
    # T5 convention: scale=1.0, (1,H,L,L) relative-position bias, padding
    rng = np.random.default_rng(1)
    q, k, v = _qkv(seed=1)
    B, H, L, _ = q.shape
    bias = jnp.asarray(rng.normal(size=(1, H, L, L)).astype(np.float32))
    mask = rng.random((B, L)) > 0.3
    mask[0] = False  # fully-masked row: uniform-softmax parity
    mask = jnp.asarray(mask)
    ref = multi_head_attention(q, k, v, bias=bias, kv_mask=mask,
                               scale=1.0, impl="xla")
    got = sp.make_sp_attention(seq_mesh, scale=1.0)(
        q, k, v, bias=bias, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_causal(seq_mesh):
    q, k, v = _qkv(seed=2)
    ref = multi_head_attention(q, k, v, causal=True, impl="xla")
    got = sp.make_sp_attention(seq_mesh, causal=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_gradients(seq_mesh):
    # autodiff through the ring (ppermute transposes to the reverse ring)
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(B=2, H=2, L=8, Dh=4, seed=3)
    n_seq = seq_mesh.shape["seq"]
    spec = P("data", None, "seq", None)

    def loss_ring(q, k, v):
        def local(q, k, v):
            o = sp.ring_attention(q, k, v, axis="seq", n_ranks=n_seq)
            return jax.lax.psum(jax.lax.psum(
                jnp.sum(o ** 2), "seq"), "data")
        f = shard_map(local, mesh=seq_mesh,
                      in_specs=(spec, spec, spec), out_specs=P(),
                      check_vma=False)
        return f(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, impl="xla") ** 2)

    sh = NamedSharding(seq_mesh, spec)
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=1e-4, rtol=1e-4)


def test_sp_t5_encode_matches_t5_encode_L4096(seq_mesh):
    """The SP consumer (sp_t5_encode): FULL T5 encoder with on-the-fly
    relative-position bias tiles over a ("data","seq") mesh == the
    single-device t5_encode at L=4096 — a length whose (H, L, L) bias
    table would never be materialized, and which crosses the
    max_distance=128 bucket tail many chunks over."""
    from multimodalpromptretrieval_tpu.models import t5 as jt5

    cfg = jt5.T5Config.tiny(vocab_size=64)
    params = jt5.init_t5(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(9)
    B, L = 2, 4096
    embeds = jnp.asarray(
        rng.normal(size=(B, L, cfg.d_model)).astype(np.float32))
    mask = np.ones((B, L), np.int32)
    mask[1, -700:] = 0  # padding crossing a chunk boundary
    ref = jt5.t5_encode(params, cfg, embeds, jnp.asarray(mask))
    got = sp.sp_t5_encode(params, cfg, embeds, jnp.asarray(mask),
                          seq_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sp_t5_encode_rejects_indivisible_shapes(seq_mesh):
    """Misfit shapes fail with a clear ValueError before any device_put
    (ADVICE r3), not a cryptic sharding error."""
    from multimodalpromptretrieval_tpu.models import t5 as jt5

    cfg = jt5.T5Config.tiny(vocab_size=64)
    params = jt5.init_t5(jax.random.PRNGKey(7), cfg)
    bad_len = jnp.zeros((2, 66, cfg.d_model), jnp.float32)  # 66 % 4 != 0
    with pytest.raises(ValueError, match="sequence length 66"):
        sp.sp_t5_encode(params, cfg, bad_len, None, seq_mesh)
    bad_batch = jnp.zeros((3, 64, cfg.d_model), jnp.float32)  # 3 % 2 != 0
    with pytest.raises(ValueError, match="batch 3"):
        sp.sp_t5_encode(params, cfg, bad_batch, None, seq_mesh)


def test_sp_t5_encode_matches_at_serving_length(seq_mesh):
    """Same at the serving-scale length (L=64, bucketed width): the wired
    path is exact at short lengths too, not only in the long regime."""
    from multimodalpromptretrieval_tpu.models import t5 as jt5

    cfg = jt5.T5Config.tiny(vocab_size=64)
    params = jt5.init_t5(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(10)
    B, L = 4, 64
    embeds = jnp.asarray(
        rng.normal(size=(B, L, cfg.d_model)).astype(np.float32))
    mask = np.ones((B, L), np.int32)
    mask[0, -5:] = 0
    ref = jt5.t5_encode(params, cfg, embeds, jnp.asarray(mask))
    got = sp.sp_t5_encode(params, cfg, embeds, jnp.asarray(mask),
                          seq_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
