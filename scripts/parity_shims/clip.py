"""Drop-in ``clip`` module for the cross-framework parity harness.

The reference imports the OpenAI ``clip`` pip package (installed from git,
reference README.md:14), which is absent in this environment. This shim
reimplements the parts the reference touches — ``clip.load`` returning a
torch CLIP whose module tree/state_dict matches OpenAI's layout
(dataset/VQAFeatureDataset.py:25, architectures/T5VisionModel.py:26,46-54,
112-139), ``clip.tokenize`` (VQAFeatureDataset.py:147,190), and the
torchvision-style preprocess — and loads FIXED weights exported from the
JAX framework, so both frameworks run identical parameters.

Configured via the PARITY_SPEC env var: a JSON file with
  {"clip_weights": <path to torch .pt OpenAI-layout sd>,
   "clip": {"context_length": int, "vision_heads": int, "text_heads": int},
   "corpus": <path to tokenizer corpus json>}

NOT a general CLIP implementation — only what reference code paths use.
"""

import json
import os

import numpy as np
import torch
from torch import nn

_SPEC = None


def _spec():
    global _SPEC
    if _SPEC is None:
        with open(os.environ["PARITY_SPEC"]) as f:
            _SPEC = json.load(f)
    return _SPEC


IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """OpenAI CLIP block: pre-LN, fused-in-proj MHA, QuickGELU MLP."""

    def __init__(self, d_model, n_head, attn_mask=None):
        super().__init__()
        self.attn = nn.MultiheadAttention(d_model, n_head)
        self.ln_1 = nn.LayerNorm(d_model)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d_model, d_model * 4))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", nn.Linear(d_model * 4, d_model))
        self.ln_2 = nn.LayerNorm(d_model)
        self.attn_mask = attn_mask

    def forward(self, x):
        mask = (self.attn_mask.to(dtype=x.dtype, device=x.device)
                if self.attn_mask is not None else None)
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class Transformer(nn.Module):
    def __init__(self, width, layers, heads, attn_mask=None):
        super().__init__()
        self.resblocks = nn.Sequential(*[
            ResidualAttentionBlock(width, heads, attn_mask)
            for _ in range(layers)])

    def forward(self, x):
        return self.resblocks(x)


class VisionTransformer(nn.Module):
    def __init__(self, input_resolution, patch_size, width, layers, heads,
                 output_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, kernel_size=patch_size,
                               stride=patch_size, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n_tok = (input_resolution // patch_size) ** 2 + 1
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(n_tok, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = Transformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, output_dim))

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype) + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype, device=x.device)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)
        x = self.transformer(x)
        x = x.permute(1, 0, 2)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj


class CLIP(nn.Module):
    def __init__(self, embed_dim, image_resolution, vision_layers,
                 vision_width, vision_patch_size, context_length, vocab_size,
                 transformer_width, transformer_heads, transformer_layers,
                 vision_heads):
        super().__init__()
        self.context_length = context_length
        self.visual = VisionTransformer(
            image_resolution, vision_patch_size, vision_width,
            vision_layers, vision_heads, embed_dim)
        mask = torch.full((context_length, context_length), float("-inf"))
        mask.triu_(1)
        self.transformer = Transformer(
            transformer_width, transformer_layers, transformer_heads,
            attn_mask=mask)
        self.vocab_size = vocab_size
        self.token_embedding = nn.Embedding(vocab_size, transformer_width)
        self.positional_embedding = nn.Parameter(
            torch.empty(context_length, transformer_width))
        self.ln_final = nn.LayerNorm(transformer_width)
        self.text_projection = nn.Parameter(
            torch.empty(transformer_width, embed_dim))
        self.logit_scale = nn.Parameter(torch.ones([]) * np.log(1 / 0.07))

    @property
    def dtype(self):
        return self.visual.conv1.weight.dtype

    def encode_image(self, image):
        return self.visual(image.type(self.dtype))

    def encode_text(self, text):
        x = self.token_embedding(text).type(self.dtype)
        x = x + self.positional_embedding.type(self.dtype)
        x = x.permute(1, 0, 2)
        x = self.transformer(x)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x).type(self.dtype)
        # EOT pooling: EOT has the highest token id
        x = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return x @ self.text_projection


def _preprocess(n_px):
    """torchvision-equivalent transform without torchvision: resize shorter
    side to n_px (PIL bicubic), center crop, scale, CLIP-normalize."""
    from PIL import Image

    mean = np.asarray(IMAGE_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(IMAGE_STD, np.float32).reshape(3, 1, 1)

    def run(img):
        if img.mode != "RGB":
            img = img.convert("RGB")
        w, h = img.size
        if min(w, h) != n_px:
            if h <= w:
                nh, nw = n_px, max(n_px, int(round(n_px * w / h)))
            else:
                nw, nh = n_px, max(n_px, int(round(n_px * h / w)))
            img = img.resize((nw, nh), Image.BICUBIC)
        w, h = img.size
        left, top = (w - n_px) // 2, (h - n_px) // 2
        img = img.crop((left, top, left + n_px, top + n_px))
        arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
        return torch.from_numpy((arr - mean) / std)

    return run


def load(name, device="cpu", jit=False, download_root=None):
    """Build the tiny parity CLIP and load the exported JAX weights —
    every call returns identical parameters (quirk #2: the dataset's own
    'stock' CLIP must equal the in-model tower here, since the JAX side
    uses one shared tower)."""
    spec = _spec()
    sd = torch.load(spec["clip_weights"], map_location="cpu",
                    weights_only=True)
    conv = sd["visual.conv1.weight"]
    vision_width, _, patch, _ = conv.shape
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** .5))
    vision_layers = len({k.split(".")[3] for k in sd
                         if k.startswith("visual.transformer.resblocks.")})
    text_layers = len({k.split(".")[2] for k in sd
                       if k.startswith("transformer.resblocks.")})
    model = CLIP(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=grid * patch,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["positional_embedding"].shape[1],
        transformer_heads=spec["clip"]["text_heads"],
        transformer_layers=text_layers,
        vision_heads=spec["clip"]["vision_heads"],
    )
    model.load_state_dict(sd)
    model = model.to(device).eval()
    return model, _preprocess(grid * patch)


_TOKENIZER = None


def tokenize(texts, context_length=None, truncate=True):
    """clip.tokenize parity via the framework's hermetic toy BPE — the same
    tokenizer the JAX side uses, so retrieval embeddings match exactly."""
    global _TOKENIZER
    if _TOKENIZER is None:
        from multimodalpromptretrieval_tpu.text.clip_bpe import (
            CLIPBPETokenizer,
        )

        _TOKENIZER = CLIPBPETokenizer.build_toy(
            context_length=_spec()["clip"]["context_length"])
    ids = _TOKENIZER.tokenize(texts, truncate=truncate)
    return torch.from_numpy(np.asarray(ids, np.int64))


def available_models():
    return ["ViT-B/32"]
