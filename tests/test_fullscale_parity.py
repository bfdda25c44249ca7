"""Full-scale HF parity: production dims, production sequence lengths.

Every other parity test runs at toy dims (d_model=32, 2 layers). This file
random-initializes the REAL `transformers` models at the flagship shapes the
reference loads pretrained —
  * t5-small: d_model 512, 6+6 layers, 8 heads, d_ff 2048, vocab 32128
    (reference: architectures/T5VisionModel.py:57-61),
  * CLIP ViT-B/32: vision 768w/12L, text 512w/12L, 224px, vocab 49408
    (T5VisionModel.py:26-30, dataset/VQAFeatureDataset.py:25),
  * t5-large (1024d/24+24L/16H) plus the 512->1024 visual projection
    (T5VisionModel.py:49-51),
converts them with models/convert.py at true shapes, and asserts fp32
loss / logits / greedy-id / retrieval-rank parity at production sequence
lengths (L=82 = 50-token visual prefix + text, 20 decode steps —
T5VisionModel.py:172-181,200-205).

Opt-in (several minutes of single-core CPU + ~4 GB for t5-large):

    MPR_FULLSCALE=1 python -m pytest tests/test_fullscale_parity.py -q

Results are recorded in PARITY.md ("Full-scale parity").
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import clip as jclip
from multimodalpromptretrieval_tpu.models import t5 as jt5
from multimodalpromptretrieval_tpu.models.convert import (
    clip_from_hf,
    resize_token_embeddings,
    state_dict_to_numpy,
    t5_from_hf,
)
from multimodalpromptretrieval_tpu.ops.topk import l2_topk

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.skipif(
    not os.environ.get("MPR_FULLSCALE"),
    reason="full-scale parity is opt-in: MPR_FULLSCALE=1 (minutes of CPU)")

# Production shapes: 50 visual tokens + ~32 text tokens, 20 decode steps.
L_PROD = 82
T_DECODE = 20


def _hf_t5(seed, **over):
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(seed)
    cfg = HFT5Config(dropout_rate=0.0, decoder_start_token_id=0, **over)
    return T5ForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def small_pair():
    """HF t5-small (default T5Config IS t5-small) + converted params."""
    hf = _hf_t5(0)
    cfg = jt5.T5Config.t5_small()
    params = t5_from_hf(state_dict_to_numpy(hf.state_dict()), cfg)
    return hf, cfg, params


def _batch(seed, B, L, T, d_model):
    rng = np.random.default_rng(seed)
    embeds = rng.normal(size=(B, L, d_model)).astype(np.float32)
    mask = np.ones((B, L), np.int32)
    # varied trailing padding after the 50-token always-valid prefix
    for b in range(B):
        pad = (b * 7) % 24
        if pad:
            mask[b, L - pad:] = 0
    labels = rng.integers(2, 32000, size=(B, T)).astype(np.int64)
    for b in range(B):
        cut = (b * 5) % T
        if cut:
            labels[b, T - cut:] = -100
    return embeds, mask, labels


def test_t5_small_loss_logits_fullscale(small_pair):
    hf, cfg, params = small_pair
    embeds, mask, labels = _batch(1, B=4, L=L_PROD, T=T_DECODE,
                                  d_model=cfg.d_model)
    with torch.no_grad():
        out = hf(inputs_embeds=torch.tensor(embeds),
                 attention_mask=torch.tensor(mask),
                 labels=torch.tensor(labels))
    enc = jt5.t5_encode(params, cfg, jnp.asarray(embeds), jnp.asarray(mask))
    logits = jt5.t5_decode_train(
        params, cfg, enc, jnp.asarray(mask),
        jt5.shift_right(jnp.asarray(labels), cfg))
    ref = out.logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=5e-4)
    loss = jt5.t5_loss(params, cfg, jnp.asarray(embeds), jnp.asarray(mask),
                       jnp.asarray(labels))
    assert float(loss) == pytest.approx(float(out.loss), rel=1e-5)


def test_t5_small_greedy_ids_fullscale(small_pair):
    """20-step greedy decode at B=4, L=82: ids exactly equal to HF."""
    hf, cfg, params = small_pair
    embeds, mask, _ = _batch(2, B=4, L=L_PROD, T=T_DECODE,
                             d_model=cfg.d_model)
    with torch.no_grad():
        ref = hf.generate(inputs_embeds=torch.tensor(embeds),
                          attention_mask=torch.tensor(mask),
                          do_sample=False,
                          max_new_tokens=T_DECODE).numpy()
    enc = jt5.t5_encode(params, cfg, jnp.asarray(embeds), jnp.asarray(mask))
    got = np.asarray(jt5.t5_greedy_decode(params, cfg, enc,
                                          jnp.asarray(mask),
                                          max_new_tokens=T_DECODE))
    np.testing.assert_array_equal(got[:, :ref.shape[1]], ref)
    assert np.all(got[:, ref.shape[1]:] == cfg.pad_token_id)


def test_t5_small_relpos_beyond_max_distance(small_pair):
    """L=300 crosses relative_attention_max_distance=128: the log-bucketing
    tail (t5.py relative_position_bucket) has no toy-dim coverage."""
    hf, cfg, params = small_pair
    embeds, mask, _ = _batch(3, B=1, L=300, T=4, d_model=cfg.d_model)
    with torch.no_grad():
        ref = hf.encoder(inputs_embeds=torch.tensor(embeds),
                         attention_mask=torch.tensor(mask)
                         ).last_hidden_state.numpy()
    got = np.asarray(jt5.t5_encode(params, cfg, jnp.asarray(embeds),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-4)


def test_t5_small_resize_to_reference_vocab(small_pair):
    """[itk] resize shrinks 32128 -> 32101 keeping leading rows
    (T5VisionModel.py:58-61); HF resize_token_embeddings is the oracle."""
    hf, cfg, params = small_pair
    import copy

    hf2 = copy.deepcopy(hf)
    hf2.resize_token_embeddings(32101)
    ours = resize_token_embeddings(params, 32101)
    np.testing.assert_array_equal(
        np.asarray(ours["shared"]),
        hf2.get_input_embeddings().weight.detach().numpy())


@pytest.fixture(scope="module")
def clip_pair():
    """HF CLIPModel at true ViT-B/32 dims with quick_gelu (== OpenAI CLIP)."""
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    cfg = jclip.CLIPConfig.vit_b32()
    torch.manual_seed(7)
    hf_cfg = HFCLIPConfig(
        projection_dim=cfg.embed_dim,
        vision_config={
            "hidden_size": cfg.vision_width,
            "intermediate_size": cfg.vision_width * 4,
            "num_hidden_layers": cfg.vision_layers,
            "num_attention_heads": cfg.vision_heads,
            "image_size": cfg.image_resolution,
            "patch_size": cfg.patch_size,
            "hidden_act": "quick_gelu",
            "attention_dropout": 0.0,
        },
        text_config={
            "hidden_size": cfg.text_width,
            "intermediate_size": cfg.text_width * 4,
            "num_hidden_layers": cfg.text_layers,
            "num_attention_heads": cfg.text_heads,
            "max_position_embeddings": cfg.context_length,
            "vocab_size": cfg.vocab_size,
            "hidden_act": "quick_gelu",
            "attention_dropout": 0.0,
            "eos_token_id": cfg.vocab_size - 1,
            "bos_token_id": cfg.vocab_size - 2,
            "pad_token_id": 0,
        },
    )
    hf = CLIPModel(hf_cfg).eval()
    params = clip_from_hf(state_dict_to_numpy(hf.state_dict()), cfg)
    return hf, cfg, params


def _clip_text_ids(rng, B, cfg):
    """clip.tokenize-shaped rows: SOT, tokens, EOT (= max id, so the
    argmax pooling finds it), zero padding."""
    ids = np.zeros((B, cfg.context_length), np.int32)
    for b in range(B):
        n = int(rng.integers(4, 20))
        ids[b, 0] = cfg.vocab_size - 2
        ids[b, 1:1 + n] = rng.integers(1, cfg.vocab_size - 2, size=n)
        ids[b, 1 + n] = cfg.vocab_size - 1
    return ids


def test_clip_image_tokens_fullscale(clip_pair):
    """All 50 projected ViT-B/32 tokens (the visual prefix,
    T5VisionModel.py:112-139) at 224x224."""
    hf, cfg, params = clip_pair
    rng = np.random.default_rng(10)
    images = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        out = hf.vision_model(pixel_values=torch.tensor(images))
        all_tok = hf.vision_model.post_layernorm(out.last_hidden_state)
        ref = hf.visual_projection(all_tok).numpy()
    got = np.asarray(jclip.clip_image_tokens(params, cfg,
                                             jnp.asarray(images)))
    assert got.shape == (2, 50, 512)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_clip_retrieval_rank_parity_fullscale(clip_pair):
    """image (+) text (N,1024) index + L2 ranks: torch.cdist/argsort oracle
    (dataset/VQAFeatureDataset.py:145-197) vs our converted towers and
    fused top-k, at true ViT-B/32 dims."""
    hf, cfg, params = clip_pair
    rng = np.random.default_rng(11)
    N, B, K = 48, 8, 5
    imgs = rng.normal(size=(N, 3, 224, 224)).astype(np.float32)
    ids = _clip_text_ids(rng, N, cfg)
    with torch.no_grad():
        vi = hf.get_image_features(pixel_values=torch.tensor(imgs))
        vt = hf.get_text_features(input_ids=torch.tensor(ids.astype(np.int64)))
        index_ref = torch.cat([vi, vt], dim=1)
    gi = jclip.clip_encode_image(params, cfg, jnp.asarray(imgs))
    gt = jclip.clip_encode_text(params, cfg, jnp.asarray(ids))
    index_got = jnp.concatenate([gi, gt], axis=1)
    np.testing.assert_allclose(np.asarray(index_got), index_ref.numpy(),
                               atol=2e-3, rtol=2e-3)
    q_ref, q_got = index_ref[:B], index_got[:B]
    ranks_ref = torch.cdist(q_ref, index_ref).argsort(dim=1)[:, :K].numpy()
    _, ranks_got = l2_topk(q_got, index_got, K, impl="xla")
    np.testing.assert_array_equal(np.asarray(ranks_got), ranks_ref)


def test_t5_large_projection_leg_fullscale():
    """t5-large (1024d/24+24L/16H) conversion + the 512->1024 visual
    projection at true shapes (T5VisionModel.py:49-51): composed loss parity
    vs HF + torch Linear on the concatenated [projected prefix | text]."""
    hf = _hf_t5(20, d_model=1024, d_kv=64, d_ff=4096, num_layers=24,
                num_heads=16)
    cfg = jt5.T5Config.t5_large()
    params = t5_from_hf(state_dict_to_numpy(hf.state_dict()), cfg)
    torch.manual_seed(21)
    proj = torch.nn.Linear(512, 1024).eval()

    rng = np.random.default_rng(22)
    B, Ltxt, T = 2, 32, 8
    vis = rng.normal(size=(B, 50, 512)).astype(np.float32)
    txt = rng.normal(size=(B, Ltxt, 1024)).astype(np.float32)
    labels = rng.integers(2, 32000, size=(B, T)).astype(np.int64)
    labels[0, -3:] = -100
    mask = np.ones((B, 50 + Ltxt), np.int32)
    mask[1, -5:] = 0

    with torch.no_grad():
        prefix = proj(torch.tensor(vis))
        embeds = torch.cat([prefix, torch.tensor(txt)], dim=1)
        ref = hf(inputs_embeds=embeds, attention_mask=torch.tensor(mask),
                 labels=torch.tensor(labels)).loss.item()

    w = jnp.asarray(proj.weight.detach().numpy().T)
    b = jnp.asarray(proj.bias.detach().numpy())
    prefix_j = jnp.asarray(vis) @ w + b
    embeds_j = jnp.concatenate([prefix_j, jnp.asarray(txt)], axis=1)
    got = float(jt5.t5_loss(params, cfg, embeds_j, jnp.asarray(mask),
                            jnp.asarray(labels)))
    assert got == pytest.approx(ref, rel=2e-5)
