"""CLIP ModifiedResNet visual tower (the reference's RN path).

The reference supports ``vision_encoder`` = RN variants ("Use RNx4"):
grid features from layer4 reshaped to (B, 49, C) and projected to the T5
space by a Linear(C, 512) (architectures/T5VisionModel.py:53-54,90-109 —
the attnpool is skipped on that path). This module implements OpenAI
CLIP's ModifiedResNet in JAX:

  * 3-conv stem (each stride-1/2 conv + BN + ReLU) then 2x2 avg-pool;
  * Bottleneck blocks with expansion 4; stride-2 downsampling is an
    AvgPool before the 1x1 conv (anti-aliased rect-2 blur), and the
    shortcut is AvgPool -> 1x1 conv -> BN;
  * AttentionPool2d head (learned 2-D positional embedding + one MHA
    layer, query = mean token) — used by ``encode_image`` parity; the
    grid-feature path of the reference stops before it.

BatchNorm runs in inference mode with the checkpoint's running stats (the
vision tower is frozen in the reference, T5VisionModel.py:29-30).
Convolutions are ``lax.conv_general_dilated`` in NCHW — XLA:TPU maps them
onto the MXU directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: tuple = (3, 4, 6, 3)       # RN50; RN50x4 = (4, 6, 10, 6)
    width: int = 64                    # stem width (RN50x4 = 80)
    embed_dim: int = 1024              # attnpool output (RN50x4 = 640)
    heads: int = 32                    # attnpool heads (width*32//64)
    image_resolution: int = 224        # RN50x4 = 288

    @property
    def final_channels(self) -> int:
        return self.width * 32         # layer4 output channels (x4 expansion)

    @property
    def grid(self) -> int:
        return self.image_resolution // 32

    @staticmethod
    def rn50() -> "ResNetConfig":
        return ResNetConfig()

    @staticmethod
    def rn50x4() -> "ResNetConfig":
        return ResNetConfig(layers=(4, 6, 10, 6), width=80, embed_dim=640,
                            heads=40, image_resolution=288)

    @staticmethod
    def tiny() -> "ResNetConfig":
        return ResNetConfig(layers=(1, 1, 1, 1), width=8, embed_dim=32,
                            heads=4, image_resolution=64)


def conv2d(x, w, stride=1):
    """torch Conv2d semantics: symmetric padding (k-1)//2, floor division.
    (XLA's "SAME" pads asymmetrically under stride 2 — not torch parity.)"""
    k = w.shape[2]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def batch_norm(x, p, eps=1e-5):
    """Inference-mode BN with running stats; (C,) params over NCHW."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    scale = (p["w"] * inv)[None, :, None, None]
    shift = (p["b"] - p["mean"] * p["w"] * inv)[None, :, None, None]
    return x * scale + shift


def avg_pool(x, k, stride=None):
    stride = stride or k
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, stride, stride),
        "VALID") / (k * k)


def _init_conv(key, cin, cout, ksize):
    fan_in = cin * ksize * ksize
    return jax.random.normal(key, (cout, cin, ksize, ksize)) * fan_in**-0.5


def _init_bn(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _init_bottleneck(key, cin, cmid, stride):
    # NOTE: stride is NOT stored in the pytree (int leaves break grad);
    # it is recomputed structurally: stride 2 iff first block of layers 2-4.
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(ks[0], cin, cmid, 1), "bn1": _init_bn(cmid),
        "conv2": _init_conv(ks[1], cmid, cmid, 3), "bn2": _init_bn(cmid),
        "conv3": _init_conv(ks[2], cmid, cmid * 4, 1),
        "bn3": _init_bn(cmid * 4),
    }
    if stride > 1 or cin != cmid * 4:
        p["downsample"] = {"conv": _init_conv(ks[3], cin, cmid * 4, 1),
                           "bn": _init_bn(cmid * 4)}
    return p


def init_resnet(key, cfg: ResNetConfig) -> Params:
    ks = jax.random.split(key, 12)
    w = cfg.width
    params: Params = {
        "conv1": _init_conv(ks[0], 3, w // 2, 3), "bn1": _init_bn(w // 2),
        "conv2": _init_conv(ks[1], w // 2, w // 2, 3),
        "bn2": _init_bn(w // 2),
        "conv3": _init_conv(ks[2], w // 2, w, 3), "bn3": _init_bn(w),
    }
    cin = w
    for li, (n, cmid) in enumerate(zip(cfg.layers, (w, 2 * w, 4 * w, 8 * w))):
        blocks = []
        for bi in range(n):
            stride = (1 if li == 0 or bi > 0 else 2)
            blocks.append(_init_bottleneck(
                jax.random.fold_in(ks[3 + li], bi), cin, cmid, stride))
            cin = cmid * 4
        params[f"layer{li + 1}"] = blocks
    c = cfg.final_channels
    sp = cfg.grid
    params["attnpool"] = {
        "pos": jax.random.normal(ks[8], (sp * sp + 1, c)) * c**-0.5,
        "q": {"w": jax.random.normal(ks[9], (c, c)) * c**-0.5,
              "b": jnp.zeros((c,))},
        "k": {"w": jax.random.normal(ks[10], (c, c)) * c**-0.5,
              "b": jnp.zeros((c,))},
        "v": {"w": jax.random.normal(ks[11], (c, c)) * c**-0.5,
              "b": jnp.zeros((c,))},
        "out": {"w": jax.random.normal(
            jax.random.fold_in(ks[11], 1), (c, cfg.embed_dim)) * c**-0.5,
            "b": jnp.zeros((cfg.embed_dim,))},
    }
    return params


def _bottleneck(p: Params, x, stride: int):
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(batch_norm(conv2d(out, p["conv2"]), p["bn2"]))
    if stride > 1:
        out = avg_pool(out, stride)
    out = batch_norm(conv2d(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        idn = x
        if stride > 1:
            idn = avg_pool(idn, stride)
        idn = batch_norm(conv2d(idn, p["downsample"]["conv"]),
                         p["downsample"]["bn"])
    else:
        idn = x
    return jax.nn.relu(out + idn)


def resnet_grid_features(params: Params, cfg: ResNetConfig,
                         images: jnp.ndarray) -> jnp.ndarray:
    """Layer4 grid features (B, grid², final_channels) — the reference's
    get_resnet_features before its projection (T5VisionModel.py:90-105)."""
    x = jax.nn.relu(batch_norm(conv2d(images, params["conv1"], stride=2),
                               params["bn1"]))
    x = jax.nn.relu(batch_norm(conv2d(x, params["conv2"]), params["bn2"]))
    x = jax.nn.relu(batch_norm(conv2d(x, params["conv3"]), params["bn3"]))
    x = avg_pool(x, 2)
    for li in range(4):
        for bi, block in enumerate(params[f"layer{li + 1}"]):
            x = _bottleneck(block, x, 2 if (bi == 0 and li > 0) else 1)
    B, C, H, W = x.shape
    return jnp.transpose(x.reshape(B, C, H * W), (0, 2, 1))


def resnet_encode_image(params: Params, cfg: ResNetConfig,
                        images: jnp.ndarray) -> jnp.ndarray:
    """AttentionPool2d head -> (B, embed_dim): OpenAI encode_image parity."""
    feats = resnet_grid_features(params, cfg, images)  # (B, HW, C)
    ap = params["attnpool"]
    B, HW, C = feats.shape
    mean = jnp.mean(feats, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, feats], axis=1) + ap["pos"][None]
    H = cfg.heads
    Dh = C // H

    def proj(t, p):
        return jnp.transpose(
            (t @ p["w"].T + p["b"]).reshape(B, -1, H, Dh), (0, 2, 1, 3))

    q = proj(tokens[:, :1], ap["q"])
    k = proj(tokens, ap["k"])
    v = proj(tokens, ap["v"])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * Dh**-0.5
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, 1, C)[:, 0]
    return o @ ap["out"]["w"] + ap["out"]["b"]


# ---------------------------------------------------------------------------
# OpenAI checkpoint conversion
# ---------------------------------------------------------------------------


def resnet_config_from_openai_sd(sd: Mapping[str, np.ndarray]
                                 ) -> ResNetConfig:
    width = sd["visual.conv3.weight"].shape[0]
    layers = []
    for li in range(1, 5):
        n = len({k.split(".")[2] for k in sd
                 if k.startswith(f"visual.layer{li}.")})
        layers.append(n)
    embed_dim = sd["visual.attnpool.c_proj.weight"].shape[0]
    spacial = int(round((sd["visual.attnpool.positional_embedding"]
                         .shape[0] - 1) ** 0.5))
    c = width * 32
    return ResNetConfig(layers=tuple(layers), width=width,
                        embed_dim=embed_dim, heads=c // 64,
                        image_resolution=spacial * 32)


def _bn_from(sd, prefix):
    return {"w": jnp.asarray(sd[f"{prefix}.weight"]),
            "b": jnp.asarray(sd[f"{prefix}.bias"]),
            "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
            "var": jnp.asarray(sd[f"{prefix}.running_var"])}


def resnet_from_openai(sd: Mapping[str, np.ndarray],
                       cfg: ResNetConfig) -> Params:
    sd = dict(sd)
    params: Params = {
        "conv1": jnp.asarray(sd["visual.conv1.weight"]),
        "bn1": _bn_from(sd, "visual.bn1"),
        "conv2": jnp.asarray(sd["visual.conv2.weight"]),
        "bn2": _bn_from(sd, "visual.bn2"),
        "conv3": jnp.asarray(sd["visual.conv3.weight"]),
        "bn3": _bn_from(sd, "visual.bn3"),
    }
    for li, n in enumerate(cfg.layers):
        blocks = []
        for bi in range(n):
            pre = f"visual.layer{li + 1}.{bi}"
            b = {
                "conv1": jnp.asarray(sd[f"{pre}.conv1.weight"]),
                "bn1": _bn_from(sd, f"{pre}.bn1"),
                "conv2": jnp.asarray(sd[f"{pre}.conv2.weight"]),
                "bn2": _bn_from(sd, f"{pre}.bn2"),
                "conv3": jnp.asarray(sd[f"{pre}.conv3.weight"]),
                "bn3": _bn_from(sd, f"{pre}.bn3"),
            }
            # OpenAI CLIP names the downsample Sequential with an
            # OrderedDict [("-1", AvgPool), ("0", Conv), ("1", BN)]
            # (CLIP model.py Bottleneck), so the conv kernel is
            # `downsample.0.weight` and the BN stats live at
            # `downsample.1.*` — the AvgPool has no parameters
            if f"{pre}.downsample.0.weight" in sd:
                b["downsample"] = {
                    "conv": jnp.asarray(sd[f"{pre}.downsample.0.weight"]),
                    "bn": _bn_from(sd, f"{pre}.downsample.1"),
                }
            blocks.append(b)
        params[f"layer{li + 1}"] = blocks
    c = cfg.final_channels
    params["attnpool"] = {
        "pos": jnp.asarray(sd["visual.attnpool.positional_embedding"]),
        "q": {"w": jnp.asarray(sd["visual.attnpool.q_proj.weight"]),
              "b": jnp.asarray(sd["visual.attnpool.q_proj.bias"])},
        "k": {"w": jnp.asarray(sd["visual.attnpool.k_proj.weight"]),
              "b": jnp.asarray(sd["visual.attnpool.k_proj.bias"])},
        "v": {"w": jnp.asarray(sd["visual.attnpool.v_proj.weight"]),
              "b": jnp.asarray(sd["visual.attnpool.v_proj.bias"])},
        "out": {"w": jnp.asarray(sd["visual.attnpool.c_proj.weight"]).T,
                "b": jnp.asarray(sd["visual.attnpool.c_proj.bias"])},
    }
    return params
