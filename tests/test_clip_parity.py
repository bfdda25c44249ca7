"""Numerical parity of the JAX CLIP towers vs HF CLIPModel (random weights).

HF's CLIPModel with hidden_act="quick_gelu" is architecturally identical to
OpenAI CLIP (which the reference loads via clip.load). We compare:
  * all-token projected image features (the reference's monkey-patched
    visual.forward, T5VisionModel.py:112-139),
  * pooled image embeddings (encode_image),
  * pooled text embeddings (encode_text, EOT-argmax pooling).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import clip as jclip
from multimodalpromptretrieval_tpu.models.convert import (
    clip_from_hf,
    state_dict_to_numpy,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def pair():
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    cfg = jclip.CLIPConfig.tiny()
    torch.manual_seed(0)
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


def test_image_tokens_match_hf(pair):
    hf, cfg, params = pair
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 3, cfg.image_resolution,
                              cfg.image_resolution)).astype(np.float32)
    with torch.no_grad():
        out = hf.vision_model(pixel_values=torch.tensor(images))
        all_tok = hf.vision_model.post_layernorm(out.last_hidden_state)
        ref = hf.visual_projection(all_tok).numpy()
    got = np.asarray(jclip.clip_image_tokens(params, cfg, jnp.asarray(images)))
    assert got.shape == (2, cfg.num_image_tokens, cfg.embed_dim)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def test_encode_image_matches_hf(pair):
    hf, cfg, params = pair
    rng = np.random.default_rng(1)
    images = rng.normal(size=(3, 3, cfg.image_resolution,
                              cfg.image_resolution)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.tensor(images)).numpy()
    got = np.asarray(jclip.clip_encode_image(params, cfg, jnp.asarray(images)))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def test_encode_text_matches_hf(pair):
    hf, cfg, params = pair
    rng = np.random.default_rng(2)
    B, L = 3, cfg.context_length
    ids = rng.integers(1, cfg.vocab_size - 2, size=(B, L))
    eot = cfg.vocab_size - 1
    for b, pos in enumerate([4, L - 1, 7]):
        ids[b, pos] = eot       # EOT = highest id -> argmax pooling position
        ids[b, pos + 1:] = 0    # zero-pad after EOT like clip.tokenize
    ids = ids.astype(np.int64)
    with torch.no_grad():
        ref = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()
    got = np.asarray(jclip.clip_encode_text(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def test_truncated_text_ids_equivalent():
    """Causal attention + EOT pooling: dropping all-pad tail columns must
    not change the pooled text embedding (models/clip.truncate_text_ids)."""
    import jax

    from multimodalpromptretrieval_tpu.models.clip import (
        CLIPConfig,
        clip_encode_text,
        init_clip,
        truncate_text_ids,
    )

    cfg = CLIPConfig.tiny()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = np.zeros((4, cfg.context_length), np.int32)
    for i in range(4):
        n = rng.integers(2, 6)
        ids[i, 0] = cfg.vocab_size - 2                      # SOT
        ids[i, 1:n] = rng.integers(1, cfg.vocab_size - 2, n - 1)
        ids[i, n] = cfg.vocab_size - 1                      # EOT (max id)
    full = np.asarray(clip_encode_text(params, cfg, jnp.asarray(ids)))
    short_ids = truncate_text_ids(ids)
    assert short_ids.shape[1] < cfg.context_length or cfg.context_length <= 8
    short = np.asarray(clip_encode_text(params, cfg,
                                        jnp.asarray(short_ids)))
    np.testing.assert_allclose(short, full, rtol=1e-5, atol=1e-6)


def test_row_text_tower_grouped_matches_xla():
    """The text-tower row path auto-engages grouped block-diagonal packing
    at L<=32 when B divides by 2/4/8 (models/clip.py). A B=8 batch (G=8)
    must match the ungrouped XLA tower, and each row must equal its own
    B=1 (G=1) run — grouping cannot leak information across sequences."""
    import dataclasses

    import jax

    from multimodalpromptretrieval_tpu.models.clip import (
        CLIPConfig,
        clip_encode_text,
        init_clip,
    )

    cfg = CLIPConfig.tiny()
    assert cfg.context_length <= 32  # grouping gate engages below
    params = init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    B, L = 8, cfg.context_length
    ids = rng.integers(1, cfg.vocab_size - 2, size=(B, L))
    for b in range(B):
        pos = int(rng.integers(2, L))
        ids[b, pos] = cfg.vocab_size - 1  # EOT (max id)
        ids[b, pos + 1:] = 0
    ids = jnp.asarray(ids.astype(np.int32))
    ref = np.asarray(clip_encode_text(params, cfg, ids))
    cfg_row = dataclasses.replace(cfg, text_attention_impl="row")
    got = np.asarray(clip_encode_text(params, cfg_row, ids))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    for b in range(B):
        solo = np.asarray(clip_encode_text(params, cfg_row, ids[b:b + 1]))
        np.testing.assert_allclose(got[b:b + 1], solo, rtol=2e-5, atol=2e-5)


def test_row_attention_impl_matches_xla_tower():
    """attention_impl='row' (2-D flattened + row-layout kernel) must match
    the default tower bit-for-fp32."""
    import dataclasses

    import jax

    from multimodalpromptretrieval_tpu.models.clip import (
        CLIPConfig,
        clip_image_tokens,
        init_clip,
    )

    cfg = CLIPConfig.tiny()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(
        size=(3, 3, cfg.image_resolution, cfg.image_resolution)).astype(
        np.float32))
    ref = np.asarray(clip_image_tokens(params, cfg, imgs))
    cfg_row = dataclasses.replace(cfg, attention_impl="row")
    got = np.asarray(clip_image_tokens(params, cfg_row, imgs))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
