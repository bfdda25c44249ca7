"""Numerical parity of the JAX T5 against HF torch T5 on shared random weights.

This is the build's substitute for downloading t5-small: instantiate a tiny
randomly-initialized ``T5ForConditionalGeneration``, convert its state_dict,
and require matching losses / logits / greedy generations at fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import t5 as jt5
from multimodalpromptretrieval_tpu.models.convert import (
    state_dict_to_numpy,
    t5_from_hf,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = 128


@pytest.fixture(scope="module")
def pair():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=VOCAB, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
        decoder_start_token_id=0,
    )
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = jt5.T5Config.tiny(vocab_size=VOCAB)
    params = t5_from_hf(state_dict_to_numpy(hf.state_dict()), cfg)
    return hf, cfg, params


def _random_batch(seed, B=3, L=11, T=7):
    rng = np.random.default_rng(seed)
    embeds = rng.normal(size=(B, L, 32)).astype(np.float32)
    mask = np.ones((B, L), np.int32)
    mask[0, -3:] = 0
    if B > 2:
        mask[2, -1:] = 0
    labels = rng.integers(2, VOCAB, size=(B, T)).astype(np.int64)
    labels[0, -2:] = -100
    labels[1, -1:] = -100
    return embeds, mask, labels


def test_encoder_matches_hf(pair):
    hf, cfg, params = pair
    embeds, mask, _ = _random_batch(1)
    with torch.no_grad():
        ref = hf.encoder(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(jt5.t5_encode(params, cfg, jnp.asarray(embeds),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_loss_and_logits_match_hf(pair):
    hf, cfg, params = pair
    embeds, mask, labels = _random_batch(2)
    with torch.no_grad():
        out = hf(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
            labels=torch.tensor(labels),
        )
    enc = jt5.t5_encode(params, cfg, jnp.asarray(embeds), jnp.asarray(mask))
    logits = jt5.t5_decode_train(
        params, cfg, enc, jnp.asarray(mask),
        jt5.shift_right(jnp.asarray(labels), cfg))
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               atol=3e-5, rtol=3e-5)
    loss = jt5.t5_loss(params, cfg, jnp.asarray(embeds), jnp.asarray(mask),
                       jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(out.loss), atol=1e-5)


def test_greedy_decode_matches_hf_generate(pair):
    hf, cfg, params = pair
    embeds, mask, _ = _random_batch(3, B=4, L=9)
    with torch.no_grad():
        ref = hf.generate(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
            do_sample=False, max_new_tokens=6,
        ).numpy()
    enc = jt5.t5_encode(params, cfg, jnp.asarray(embeds), jnp.asarray(mask))
    got = np.asarray(jt5.t5_greedy_decode(params, cfg, enc, jnp.asarray(mask),
                                          max_new_tokens=6))
    # HF trims the batch to the longest generated length; ours is fixed-width
    # and pads after EOS — compare on the HF width.
    np.testing.assert_array_equal(got[:, :ref.shape[1]], ref)
    assert np.all(got[:, ref.shape[1]:] == cfg.pad_token_id)


def test_decode_train_agrees_with_incremental_decode(pair):
    """KV-cached while_loop decode == teacher-forced argmax rollout."""
    hf, cfg, params = pair
    embeds, mask, _ = _random_batch(4, B=2, L=8)
    enc = jt5.t5_encode(params, cfg, jnp.asarray(embeds), jnp.asarray(mask))
    got = np.asarray(jt5.t5_greedy_decode(params, cfg, enc, jnp.asarray(mask),
                                          max_new_tokens=5))
    # Re-score the generated prefix with the teacher-forced decoder and check
    # each emitted token is the argmax given the previous ones.
    logits = np.asarray(jt5.t5_decode_train(
        params, cfg, enc, jnp.asarray(mask), jnp.asarray(got[:, :-1])))
    for b in range(got.shape[0]):
        done = False
        for t in range(5):
            if done:
                assert got[b, t + 1] == cfg.pad_token_id
                continue
            assert got[b, t + 1] == logits[b, t].argmax()
            if got[b, t + 1] == cfg.eos_token_id:
                done = True


def test_gradients_flow():
    cfg = jt5.T5Config.tiny()
    params = jt5.init_t5(jax.random.PRNGKey(0), cfg)
    embeds = jnp.ones((2, 5, cfg.d_model))
    labels = jnp.array([[3, 4, 1], [5, 1, -100]])
    g = jax.grad(lambda p: jt5.t5_loss(p, cfg, embeds, None, labels))(params)
    norms = jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), g)
    flat = jax.tree.leaves(norms)
    assert all(np.isfinite(flat))
    assert sum(flat) > 0


def test_gated_gelu_ff_matches_hf():
    """T5 v1.1 gated-gelu FF path (feed_forward_proj='gated-gelu')."""
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(3)
    hf = T5ForConditionalGeneration(HFT5Config(
        vocab_size=VOCAB, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
        decoder_start_token_id=0, feed_forward_proj="gated-gelu",
        tie_word_embeddings=True)).eval()
    import dataclasses

    cfg = dataclasses.replace(jt5.T5Config.tiny(vocab_size=VOCAB),
                              feed_forward_proj="gated-gelu")
    params = t5_from_hf(state_dict_to_numpy(hf.state_dict()), cfg)
    embeds, mask, labels = _random_batch(9)
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(embeds),
                 attention_mask=torch.tensor(mask),
                 labels=torch.tensor(labels)).loss.item()
    got = float(jt5.t5_loss(params, cfg, jnp.asarray(embeds),
                            jnp.asarray(mask), jnp.asarray(labels)))
    assert got == pytest.approx(ref, rel=1e-5)


def test_row_impl_encoder_matches_hf(pair):
    """attention_impl='row' encoder (unrolled 2-D + Pallas row kernel with
    the relative-position bias) matches HF numerics and gradients."""
    import dataclasses

    hf, cfg, params = pair
    cfg_row = dataclasses.replace(cfg, attention_impl="row")
    embeds, mask, labels = _random_batch(11)
    with torch.no_grad():
        ref = hf.encoder(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(jt5.t5_encode(params, cfg_row, jnp.asarray(embeds),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)
    # loss + gradient parity with the scan path
    loss_scan = jt5.t5_loss(params, cfg, jnp.asarray(embeds),
                            jnp.asarray(mask), jnp.asarray(labels))
    loss_row = jt5.t5_loss(params, cfg_row, jnp.asarray(embeds),
                           jnp.asarray(mask), jnp.asarray(labels))
    np.testing.assert_allclose(float(loss_row), float(loss_scan), atol=1e-6)
    g_scan = jax.grad(lambda p: jt5.t5_loss(
        p, cfg, jnp.asarray(embeds), jnp.asarray(mask),
        jnp.asarray(labels)))(params)
    g_row = jax.grad(lambda p: jt5.t5_loss(
        p, cfg_row, jnp.asarray(embeds), jnp.asarray(mask),
        jnp.asarray(labels)))(params)
    for a, b in zip(jax.tree.leaves(g_row), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_row_impl_encoder_honors_remat():
    """T5Config(remat=True, attention_impl='row'): the unrolled row path
    must wrap each layer in jax.checkpoint (activation recompute) and keep
    loss/grads bit-comparable to the non-remat row path."""
    import dataclasses

    cfg = jt5.T5Config.tiny()
    params = jt5.init_t5(jax.random.PRNGKey(1), cfg)
    cfg_row = dataclasses.replace(cfg, attention_impl="row")
    cfg_rem = dataclasses.replace(cfg_row, remat=True)
    embeds, mask, labels = _random_batch(21)
    args = (jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(labels))
    loss_plain = float(jt5.t5_loss(params, cfg_row, *args))
    loss_remat = float(jt5.t5_loss(params, cfg_rem, *args))
    np.testing.assert_allclose(loss_remat, loss_plain, atol=1e-6)
    g_plain = jax.grad(lambda p: jt5.t5_loss(p, cfg_row, *args))(params)
    g_remat = jax.grad(lambda p: jt5.t5_loss(p, cfg_rem, *args))(params)
    for a, b in zip(jax.tree.leaves(g_remat), jax.tree.leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_scan_decode_layers_matches_unroll(pair):
    """decode_layers="scan" greedy decode == the unrolled default (both
    cache layouts), token for token."""
    import dataclasses

    hf, cfg, params = pair
    embeds, mask, _ = _random_batch(31, B=4, L=10)
    enc = jt5.t5_encode(params, cfg, jnp.asarray(embeds),
                        jnp.asarray(mask))
    for base in (cfg, dataclasses.replace(cfg,
                                          decode_attention_impl="xla")):
        ref = np.asarray(jt5.t5_greedy_decode(
            params, base, enc, jnp.asarray(mask), max_new_tokens=7))
        got = np.asarray(jt5.t5_greedy_decode(
            params, dataclasses.replace(base, decode_layers="scan"),
            enc, jnp.asarray(mask), max_new_tokens=7))
        np.testing.assert_array_equal(got, ref)
