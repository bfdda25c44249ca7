"""OpenAI-layout CLIP converter (clip_from_openai) vs a torch oracle.

This is the layout ``clip.load`` and PubMedCLIP's ``ckpt['state_dict']``
use (T5VisionModel.py:26,39-42): ``visual.transformer.resblocks.N.attn`` is
an ``nn.MultiheadAttention`` with fused in_proj weights. The oracle
restates OpenAI's ResidualAttentionBlock with torch modules, exports
state_dict keys in the OpenAI naming, and the converted JAX block must
reproduce its outputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import clip as jclip
from multimodalpromptretrieval_tpu.models.convert import (
    clip_config_from_openai_sd,
    clip_from_openai,
)

torch = pytest.importorskip("torch")
nn = torch.nn


class OpenAIBlock(nn.Module):
    """OpenAI CLIP ResidualAttentionBlock (pre-LN, QuickGELU MLP)."""

    def __init__(self, width, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads, batch_first=False)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("gelu", nn.Identity())  # replaced in forward
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))
        self.ln_2 = nn.LayerNorm(width)

    def forward(self, x, attn_mask=None):  # x: (L, B, W)
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        h = self.ln_2(x)
        h = self.mlp.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return x + self.mlp.c_proj(h)


def _export_openai_sd(blocks, width, patch, grid, embed_dim, vocab, ctx,
                      text_width, text_blocks):
    """Assemble a full OpenAI-naming state dict around the given blocks."""
    rng = np.random.default_rng(0)
    sd = {
        "visual.conv1.weight": rng.normal(
            size=(width, 3, patch, patch)).astype(np.float32) * 0.02,
        "visual.class_embedding": rng.normal(size=(width,)).astype(
            np.float32) * 0.02,
        "visual.positional_embedding": rng.normal(
            size=(grid * grid + 1, width)).astype(np.float32) * 0.02,
        "visual.ln_pre.weight": np.ones(width, np.float32),
        "visual.ln_pre.bias": np.zeros(width, np.float32),
        "visual.ln_post.weight": np.ones(width, np.float32),
        "visual.ln_post.bias": np.zeros(width, np.float32),
        "visual.proj": rng.normal(size=(width, embed_dim)).astype(
            np.float32) * 0.05,
        "token_embedding.weight": rng.normal(
            size=(vocab, text_width)).astype(np.float32) * 0.02,
        "positional_embedding": rng.normal(
            size=(ctx, text_width)).astype(np.float32) * 0.01,
        "ln_final.weight": np.ones(text_width, np.float32),
        "ln_final.bias": np.zeros(text_width, np.float32),
        "text_projection": rng.normal(
            size=(text_width, embed_dim)).astype(np.float32) * 0.05,
        "logit_scale": np.float32(2.6592),
    }
    for i, b in enumerate(blocks):
        pre = f"visual.transformer.resblocks.{i}"
        t = {k: v.detach().numpy() for k, v in b.state_dict().items()}
        sd[f"{pre}.attn.in_proj_weight"] = t["attn.in_proj_weight"]
        sd[f"{pre}.attn.in_proj_bias"] = t["attn.in_proj_bias"]
        sd[f"{pre}.attn.out_proj.weight"] = t["attn.out_proj.weight"]
        sd[f"{pre}.attn.out_proj.bias"] = t["attn.out_proj.bias"]
        for n in ("ln_1", "ln_2"):
            sd[f"{pre}.{n}.weight"] = t[f"{n}.weight"]
            sd[f"{pre}.{n}.bias"] = t[f"{n}.bias"]
        sd[f"{pre}.mlp.c_fc.weight"] = t["mlp.c_fc.weight"]
        sd[f"{pre}.mlp.c_fc.bias"] = t["mlp.c_fc.bias"]
        sd[f"{pre}.mlp.c_proj.weight"] = t["mlp.c_proj.weight"]
        sd[f"{pre}.mlp.c_proj.bias"] = t["mlp.c_proj.bias"]
    for i, b in enumerate(text_blocks):
        pre = f"transformer.resblocks.{i}"
        t = {k: v.detach().numpy() for k, v in b.state_dict().items()}
        sd[f"{pre}.attn.in_proj_weight"] = t["attn.in_proj_weight"]
        sd[f"{pre}.attn.in_proj_bias"] = t["attn.in_proj_bias"]
        sd[f"{pre}.attn.out_proj.weight"] = t["attn.out_proj.weight"]
        sd[f"{pre}.attn.out_proj.bias"] = t["attn.out_proj.bias"]
        for n in ("ln_1", "ln_2"):
            sd[f"{pre}.{n}.weight"] = t[f"{n}.weight"]
            sd[f"{pre}.{n}.bias"] = t[f"{n}.bias"]
        sd[f"{pre}.mlp.c_fc.weight"] = t["mlp.c_fc.weight"]
        sd[f"{pre}.mlp.c_fc.bias"] = t["mlp.c_fc.bias"]
        sd[f"{pre}.mlp.c_proj.weight"] = t["mlp.c_proj.weight"]
        sd[f"{pre}.mlp.c_proj.bias"] = t["mlp.c_proj.bias"]
    return sd


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    width, patch, grid = 32, 16, 2
    text_width, ctx, vocab, embed_dim = 24, 12, 64, 16
    # head counts must follow the CLIP width/64 convention — that is what
    # clip_config_from_openai_sd infers for real checkpoints
    heads = max(1, width // 64)
    theads = max(1, text_width // 64)
    vblocks = [OpenAIBlock(width, heads).eval() for _ in range(2)]
    tblocks = [OpenAIBlock(text_width, theads).eval() for _ in range(2)]
    sd = _export_openai_sd(vblocks, width, patch, grid, embed_dim, vocab,
                           ctx, text_width, tblocks)
    cfg = clip_config_from_openai_sd(sd)
    params = clip_from_openai(sd, cfg)
    return vblocks, tblocks, sd, cfg, params


def test_config_inference(converted):
    _, _, sd, cfg, _ = converted
    assert cfg.vision_width == 32 and cfg.vision_layers == 2
    assert cfg.patch_size == 16 and cfg.image_resolution == 32
    assert cfg.text_width == 24 and cfg.text_layers == 2
    assert cfg.embed_dim == 16 and cfg.context_length == 12
    assert cfg.vocab_size == 64


def test_visual_block_matches_torch_mha(converted):
    vblocks, _, _, cfg, params = converted
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 5, cfg.vision_width)).astype(np.float32)
    with torch.no_grad():
        ref = x.transpose(1, 0, 2)  # (L, B, W) for torch MHA
        ref = torch.tensor(ref)
        for b in vblocks:
            ref = b(ref)
        ref = ref.numpy().transpose(1, 0, 2)
    got = np.asarray(jclip._transformer(
        params["visual"]["blocks"], jnp.asarray(x), cfg.vision_heads,
        causal=False, attention_impl="xla"))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_full_towers_run(converted):
    _, _, _, cfg, params = converted
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(
        size=(2, 3, cfg.image_resolution, cfg.image_resolution)).astype(
        np.float32))
    tokens = jclip.clip_image_tokens(params, cfg, imgs)
    assert tokens.shape == (2, cfg.num_image_tokens, cfg.embed_dim)
    ids = np.zeros((2, cfg.context_length), np.int32)
    ids[:, 0] = cfg.vocab_size - 2
    ids[:, 1] = 5
    ids[:, 2] = cfg.vocab_size - 1
    txt = jclip.clip_encode_text(params, cfg, jnp.asarray(ids))
    assert txt.shape == (2, cfg.embed_dim)
    assert np.all(np.isfinite(np.asarray(txt)))
