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


def _sp_loss_fixtures():
    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
    from multimodalpromptretrieval_tpu.models.t5 import T5Config

    cfg = mprgen.MPRGenConfig(
        t5=T5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=64,
                    num_layers=4, num_decoder_layers=4, num_heads=4),
        clip=CLIPConfig(embed_dim=32, image_resolution=32, vision_width=32,
                        vision_layers=1, patch_size=16, context_length=8,
                        vocab_size=64, text_width=32,
                        vision_heads_override=2, text_heads_override=2),
        use_image_info=True)
    rng = np.random.default_rng(0)
    B = 16
    labels = rng.integers(2, 256, size=(B, 6)).astype(np.int32)
    labels[:, -2:] = -100
    # text width 12 -> L = 4 (prefix) + 12 = 16? no: ViT 32/16 patches ->
    # 5 tokens; L = 5 + 12 = 17, NOT divisible by n_seq=4 — deliberately
    # exercises the masked-pad tail
    batch = {"images": rng.normal(size=(B, 3, 32, 32)).astype(np.float32),
             "input_ids": rng.integers(2, 256,
                                       size=(B, 12)).astype(np.int32),
             "text_mask": np.ones((B, 12), np.int32),
             "labels": labels}
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    return cfg, params, batch


def test_sp_generative_loss_matches_loss_fn(seq_mesh):
    """The config-reachable SP training loss (sp_generative_loss): ring
    encoder + replicated decoder over ("data","seq") == the single-device
    mprgen.loss_fn, including a sequence length that does NOT divide the
    seq axis (masked zero-pad tail)."""
    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh

    cfg, params, batch = _sp_loss_fixtures()
    ref = float(jax.jit(lambda p, b: mprgen.loss_fn(p, cfg, b))(
        params, batch))
    b = pmesh.shard_batch(batch, seq_mesh)
    got = float(sp.make_eval_loss_step_sp(cfg, mesh=seq_mesh)(params, b))
    np.testing.assert_allclose(got, ref, rtol=2e-5)


def test_sp_train_step_matches_dp(seq_mesh):
    """Deterministic SP train step == the DP step: loss exact, raw first
    moments (gradients) tight, updated params loose (AdamW's first step
    amplifies eps-scale noise — same tolerances as the PP tests)."""
    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh
    from multimodalpromptretrieval_tpu.train.optim import adamw_init

    cfg, params, batch = _sp_loss_fixtures()
    trainable = mprgen.trainable_mask(params, cfg)
    opt = adamw_init(params)
    step_dp = pmesh.make_train_step(cfg, trainable, donate=False)
    p1, o1, l1 = step_dp(params, opt, batch, jnp.float32(1e-3), None)
    b = pmesh.shard_batch(batch, seq_mesh)
    step_sp = sp.make_train_step_sp(cfg, trainable, mesh=seq_mesh,
                                    donate=False)
    p2, o2, l2 = step_sp(params, opt, b, jnp.float32(1e-3), None)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(o1["mu"]["t5"]["shared"]),
        np.asarray(o2["mu"]["t5"]["shared"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(o1["mu"]["t5"]["encoder"]["block"]["attn"]["q"]),
        np.asarray(o2["mu"]["t5"]["encoder"]["block"]["attn"]["q"]),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1["t5"]["shared"]), np.asarray(p2["t5"]["shared"]),
        rtol=1e-3, atol=5e-4)


def test_sp_train_step_with_dropout(seq_mesh):
    """SP supports the default recipe (dropout 0.1): deterministic given
    the key, distinct across keys, loss near-but-not-equal to the
    deterministic value, and a short run converges."""
    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh
    from multimodalpromptretrieval_tpu.train.optim import adamw_init

    cfg, params, batch = _sp_loss_fixtures()
    assert cfg.t5.dropout_rate > 0.0
    trainable = mprgen.trainable_mask(params, cfg)
    opt = adamw_init(params)
    b = pmesh.shard_batch(batch, seq_mesh)
    step_sp = sp.make_train_step_sp(cfg, trainable, mesh=seq_mesh,
                                    donate=False)
    key = jax.random.PRNGKey(7)
    p1, _, l1 = step_sp(params, opt, b, jnp.float32(1e-3), key)
    p2, _, l2 = step_sp(params, opt, b, jnp.float32(1e-3), key)
    assert float(l1) == float(l2)
    np.testing.assert_array_equal(np.asarray(p1["t5"]["shared"]),
                                  np.asarray(p2["t5"]["shared"]))
    _, _, l3 = step_sp(params, opt, b, jnp.float32(1e-3),
                       jax.random.PRNGKey(8))
    assert float(l3) != float(l1)
    det = float(jax.jit(lambda pr, bt: mprgen.loss_fn(pr, cfg, bt))(
        params, batch))
    assert float(l1) != det
    assert abs(float(l1) - det) / det < 0.25
    pcur, ocur = params, opt
    losses = []
    for i in range(6):
        pcur, ocur, l = step_sp(pcur, ocur, b, jnp.float32(1e-3),
                                jax.random.fold_in(key, i))
        losses.append(float(l))
    assert losses[-1] < losses[0]


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
