"""Checkpoint converters: torch state_dicts -> JAX pytrees.

Covers the external weights the reference loads:
  * HF ``T5ForConditionalGeneration`` (architectures/T5VisionModel.py:59)
  * OpenAI CLIP (``clip.load``; same layout as PubMedCLIP's
    ``ckpt['state_dict']``, architectures/T5VisionModel.py:39-42)
  * HF ``CLIPModel`` (used for random-weight parity tests; HF's layout of
    the same architecture)

All converters accept a ``{name: numpy array}`` mapping so no torch import
is required at inference time; a small helper converts torch state_dicts.
Torch ``nn.Linear`` stores (out, in) — kernels are transposed once here so
the device-side hot path is a plain row-major matmul.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models.t5 import T5Config


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """torch state_dict -> {name: np.ndarray} (detached, fp32)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def _t(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.ascontiguousarray(x.T))


def _stack(trees):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


# ---------------------------------------------------------------------------
# T5 (HF layout)
# ---------------------------------------------------------------------------


def t5_from_hf(sd: Mapping[str, np.ndarray], cfg: T5Config) -> Dict[str, Any]:
    """HF T5ForConditionalGeneration state_dict -> init_t5 pytree layout."""
    sd = dict(sd)
    gated = cfg.feed_forward_proj == "gated-gelu"

    def attn(prefix):
        return {
            "q": _t(sd[f"{prefix}.q.weight"]),
            "k": _t(sd[f"{prefix}.k.weight"]),
            "v": _t(sd[f"{prefix}.v.weight"]),
            "o": _t(sd[f"{prefix}.o.weight"]),
        }

    def ff(prefix):
        if gated:
            return {
                "wi_0": _t(sd[f"{prefix}.wi_0.weight"]),
                "wi_1": _t(sd[f"{prefix}.wi_1.weight"]),
                "wo": _t(sd[f"{prefix}.wo.weight"]),
            }
        return {"wi": _t(sd[f"{prefix}.wi.weight"]),
                "wo": _t(sd[f"{prefix}.wo.weight"])}

    enc_layers = []
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}.layer"
        enc_layers.append({
            "attn": attn(f"{b}.0.SelfAttention"),
            "attn_ln": jnp.asarray(sd[f"{b}.0.layer_norm.weight"]),
            "ff": ff(f"{b}.1.DenseReluDense"),
            "ff_ln": jnp.asarray(sd[f"{b}.1.layer_norm.weight"]),
        })
    dec_layers = []
    for i in range(cfg.num_decoder_layers):
        b = f"decoder.block.{i}.layer"
        dec_layers.append({
            "self_attn": attn(f"{b}.0.SelfAttention"),
            "self_ln": jnp.asarray(sd[f"{b}.0.layer_norm.weight"]),
            "cross_attn": attn(f"{b}.1.EncDecAttention"),
            "cross_ln": jnp.asarray(sd[f"{b}.1.layer_norm.weight"]),
            "ff": ff(f"{b}.2.DenseReluDense"),
            "ff_ln": jnp.asarray(sd[f"{b}.2.layer_norm.weight"]),
        })

    return {
        "shared": jnp.asarray(sd["shared.weight"]),
        "encoder": {
            "block": _stack(enc_layers),
            "rel_bias": jnp.asarray(
                sd["encoder.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"]),
            "final_ln": jnp.asarray(sd["encoder.final_layer_norm.weight"]),
        },
        "decoder": {
            "block": _stack(dec_layers),
            "rel_bias": jnp.asarray(
                sd["decoder.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"]),
            "final_ln": jnp.asarray(sd["decoder.final_layer_norm.weight"]),
        },
    }


def resize_token_embeddings(params: Dict[str, Any], new_size: int,
                            seed: int = 0) -> Dict[str, Any]:
    """Replicates HF resize_token_embeddings on the tied ``shared`` matrix.

    The reference adds one "[itk]" token and resizes (T5VisionModel.py:58-61)
    — for t5-small this *shrinks* 32128 -> 32101, keeping the leading rows.
    Grown rows are normal(0, 1) like HF's default init for new rows.
    """
    shared = params["shared"]
    old = shared.shape[0]
    if new_size <= old:
        shared = shared[:new_size]
    else:
        import jax

        extra = jax.random.normal(
            jax.random.PRNGKey(seed), (new_size - old, shared.shape[1]),
            shared.dtype)
        shared = jnp.concatenate([shared, extra], axis=0)
    out = dict(params)
    out["shared"] = shared
    return out


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

from multimodalpromptretrieval_tpu.models.clip import CLIPConfig  # noqa: E402


def clip_config_from_openai_sd(sd: Mapping[str, np.ndarray]) -> CLIPConfig:
    """Infer the CLIPConfig from an OpenAI-layout state dict (like clip.load)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[2]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vision_layers = len({k.split(".")[3] for k in sd
                         if k.startswith("visual.transformer.resblocks.")})
    text_layers = len({k.split(".")[2] for k in sd
                       if k.startswith("transformer.resblocks.")})
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=grid * patch,
        vision_width=vision_width,
        vision_layers=vision_layers,
        patch_size=patch,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=sd["positional_embedding"].shape[1],
        text_layers=text_layers,
    )


def _openai_block(sd, prefix):
    return {
        "ln_1": {"w": jnp.asarray(sd[f"{prefix}.ln_1.weight"]),
                 "b": jnp.asarray(sd[f"{prefix}.ln_1.bias"])},
        "attn": {
            "wqkv": _t(sd[f"{prefix}.attn.in_proj_weight"]),
            "bqkv": jnp.asarray(sd[f"{prefix}.attn.in_proj_bias"]),
            "out": _t(sd[f"{prefix}.attn.out_proj.weight"]),
            "out_b": jnp.asarray(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "ln_2": {"w": jnp.asarray(sd[f"{prefix}.ln_2.weight"]),
                 "b": jnp.asarray(sd[f"{prefix}.ln_2.bias"])},
        "mlp": {
            "fc": _t(sd[f"{prefix}.mlp.c_fc.weight"]),
            "fc_b": jnp.asarray(sd[f"{prefix}.mlp.c_fc.bias"]),
            "proj": _t(sd[f"{prefix}.mlp.c_proj.weight"]),
            "proj_b": jnp.asarray(sd[f"{prefix}.mlp.c_proj.bias"]),
        },
    }


def clip_from_openai(sd: Mapping[str, np.ndarray],
                     cfg: CLIPConfig) -> Dict[str, Any]:
    """OpenAI ``clip.load`` / PubMedCLIP ``ckpt['state_dict']`` layout
    (architectures/T5VisionModel.py:26,39-42) -> init_clip pytree layout."""
    sd = dict(sd)
    conv = sd["visual.conv1.weight"]  # (width, 3, p, p)
    conv_flat = conv.reshape(conv.shape[0], -1).T  # (3·p², width)
    return {
        "visual": {
            "conv1": jnp.asarray(np.ascontiguousarray(conv_flat)),
            "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
            "pos_embedding": jnp.asarray(sd["visual.positional_embedding"]),
            "ln_pre": {"w": jnp.asarray(sd["visual.ln_pre.weight"]),
                       "b": jnp.asarray(sd["visual.ln_pre.bias"])},
            "blocks": _stack([
                _openai_block(sd, f"visual.transformer.resblocks.{i}")
                for i in range(cfg.vision_layers)]),
            "ln_post": {"w": jnp.asarray(sd["visual.ln_post.weight"]),
                        "b": jnp.asarray(sd["visual.ln_post.bias"])},
            "proj": jnp.asarray(sd["visual.proj"]),
        },
        "text": {
            "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
            "pos_embedding": jnp.asarray(sd["positional_embedding"]),
            "blocks": _stack([
                _openai_block(sd, f"transformer.resblocks.{i}")
                for i in range(cfg.text_layers)]),
            "ln_final": {"w": jnp.asarray(sd["ln_final.weight"]),
                         "b": jnp.asarray(sd["ln_final.bias"])},
            "text_projection": jnp.asarray(sd["text_projection"]),
        },
        "logit_scale": jnp.asarray(sd["logit_scale"]),
    }


def _hf_clip_block(sd, prefix):
    wq = sd[f"{prefix}.self_attn.q_proj.weight"]
    wk = sd[f"{prefix}.self_attn.k_proj.weight"]
    wv = sd[f"{prefix}.self_attn.v_proj.weight"]
    bq = sd[f"{prefix}.self_attn.q_proj.bias"]
    bk = sd[f"{prefix}.self_attn.k_proj.bias"]
    bv = sd[f"{prefix}.self_attn.v_proj.bias"]
    return {
        "ln_1": {"w": jnp.asarray(sd[f"{prefix}.layer_norm1.weight"]),
                 "b": jnp.asarray(sd[f"{prefix}.layer_norm1.bias"])},
        "attn": {
            "wqkv": _t(np.concatenate([wq, wk, wv], axis=0)),
            "bqkv": jnp.asarray(np.concatenate([bq, bk, bv])),
            "out": _t(sd[f"{prefix}.self_attn.out_proj.weight"]),
            "out_b": jnp.asarray(sd[f"{prefix}.self_attn.out_proj.bias"]),
        },
        "ln_2": {"w": jnp.asarray(sd[f"{prefix}.layer_norm2.weight"]),
                 "b": jnp.asarray(sd[f"{prefix}.layer_norm2.bias"])},
        "mlp": {
            "fc": _t(sd[f"{prefix}.mlp.fc1.weight"]),
            "fc_b": jnp.asarray(sd[f"{prefix}.mlp.fc1.bias"]),
            "proj": _t(sd[f"{prefix}.mlp.fc2.weight"]),
            "proj_b": jnp.asarray(sd[f"{prefix}.mlp.fc2.bias"]),
        },
    }


def clip_from_hf(sd: Mapping[str, np.ndarray],
                 cfg: CLIPConfig) -> Dict[str, Any]:
    """HF transformers CLIPModel layout -> init_clip pytree layout.

    Same architecture as OpenAI CLIP when hidden_act == "quick_gelu"; used by
    the random-weight parity tests (tests/test_clip_parity.py).
    """
    sd = dict(sd)
    conv = sd["vision_model.embeddings.patch_embedding.weight"]
    conv_flat = conv.reshape(conv.shape[0], -1).T
    return {
        "visual": {
            "conv1": jnp.asarray(np.ascontiguousarray(conv_flat)),
            "class_embedding": jnp.asarray(
                sd["vision_model.embeddings.class_embedding"]),
            "pos_embedding": jnp.asarray(
                sd["vision_model.embeddings.position_embedding.weight"]),
            "ln_pre": {"w": jnp.asarray(sd["vision_model.pre_layrnorm.weight"]),
                       "b": jnp.asarray(sd["vision_model.pre_layrnorm.bias"])},
            "blocks": _stack([
                _hf_clip_block(sd, f"vision_model.encoder.layers.{i}")
                for i in range(cfg.vision_layers)]),
            "ln_post": {"w": jnp.asarray(sd["vision_model.post_layernorm.weight"]),
                        "b": jnp.asarray(sd["vision_model.post_layernorm.bias"])},
            "proj": _t(sd["visual_projection.weight"]),
        },
        "text": {
            "token_embedding": jnp.asarray(
                sd["text_model.embeddings.token_embedding.weight"]),
            "pos_embedding": jnp.asarray(
                sd["text_model.embeddings.position_embedding.weight"]),
            "blocks": _stack([
                _hf_clip_block(sd, f"text_model.encoder.layers.{i}")
                for i in range(cfg.text_layers)]),
            "ln_final": {"w": jnp.asarray(sd["text_model.final_layer_norm.weight"]),
                         "b": jnp.asarray(sd["text_model.final_layer_norm.bias"])},
            "text_projection": jnp.asarray(_t(sd["text_projection.weight"])),
        },
        "logit_scale": jnp.asarray(sd["logit_scale"]),
    }


# ---------------------------------------------------------------------------
# Full reference-model checkpoints (the drop-in migration path)
# ---------------------------------------------------------------------------


def _scalar(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x).reshape(()))


def _wn_linear_from(sd, prefix):
    """torch weight_norm(nn.Linear, dim=None): weight_g scalar, weight_v
    (out, in) -> our {v (in, out), g scalar, b}."""
    return {
        "v": _t(sd[f"{prefix}.weight_v"]),
        "g": _scalar(sd[f"{prefix}.weight_g"]),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _fcnet_from(sd, prefix, n_layers=1):
    """FCNet.main Sequential: with dropout the Linear sits at odd indices
    ([Dropout, Linear, Act?, ...]); locate Linears by key presence."""
    layers = []
    i = 0
    found = 0
    while found < n_layers and i < 16:
        if f"{prefix}.main.{i}.weight_v" in sd:
            layers.append(_wn_linear_from(sd, f"{prefix}.main.{i}"))
            found += 1
        i += 1
    return layers


def _bcnet_from(sd, prefix, with_hmat: bool):
    p = {
        "v_net": _fcnet_from(sd, f"{prefix}.v_net"),
        "q_net": _fcnet_from(sd, f"{prefix}.q_net"),
    }
    if with_hmat:
        p["h_mat"] = {"v": jnp.asarray(sd[f"{prefix}.h_mat_v"]),
                      "g": _scalar(sd[f"{prefix}.h_mat_g"])}
        p["h_bias"] = jnp.asarray(sd[f"{prefix}.h_bias"])
    return p


def mprgen_from_reference_checkpoint(sd: Mapping[str, np.ndarray], cfg
                                     ) -> Dict[str, Any]:
    """Convert a saved reference model (torch.save of the full
    T5VisionModel* state_dict — main.py:199-206 checkpoints) into this
    framework's params pytree, for drop-in migration of trained models.

    cfg: models.mprgen.MPRGenConfig matching the checkpoint's variant.
    Handles: vision_model.* (OpenAI CLIP or ModifiedResNet layout),
    T5_model.* (HF T5; tied lm_head/embed_tokens copies ignored),
    projection.* (t5-large ViT proj or RN grid proj), mapping.*,
    prediction_head.*, BAN_att.* / BAN_resnet.* (weight-normed).
    """
    sd = dict(sd)
    params: Dict[str, Any] = {}

    t5_sd = {k[len("T5_model."):]: v for k, v in sd.items()
             if k.startswith("T5_model.")}
    params["t5"] = t5_from_hf(t5_sd, cfg.t5)

    clip_sd = {k[len("vision_model."):]: v for k, v in sd.items()
               if k.startswith("vision_model.")}
    if "visual.layer1.0.conv1.weight" in clip_sd:
        from multimodalpromptretrieval_tpu.models import resnet as rn

        params["clip_rn"] = rn.resnet_from_openai(clip_sd, cfg.resnet)
        # the text tower still ships inside the checkpoint; keep a random
        # ViT init for the retrieval-query path (quirk #2: retrieval uses
        # the dataset's own stock ViT, not this checkpoint)
        import jax

        from multimodalpromptretrieval_tpu.models.clip import init_clip

        params["clip"] = init_clip(jax.random.PRNGKey(0), cfg.clip)
    else:
        params["clip"] = clip_from_openai(clip_sd, cfg.clip)

    if "projection.weight" in sd:
        proj = {"w": _t(sd["projection.weight"]),
                "b": jnp.asarray(sd["projection.bias"])}
        if cfg.resnet is not None:
            params["rn_proj"] = proj
        else:
            params["proj"] = proj
    if "mapping.linear_relu_stack.0.weight" in sd:
        params["mapping"] = {
            "fc1": {"w": _t(sd["mapping.linear_relu_stack.0.weight"]),
                    "b": jnp.asarray(sd["mapping.linear_relu_stack.0.bias"])},
            "fc2": {"w": _t(sd["mapping.linear_relu_stack.2.weight"]),
                    "b": jnp.asarray(sd["mapping.linear_relu_stack.2.bias"])},
            "logit_scale": _scalar(sd["mapping.logit_scale"]),
        }
    if "prediction_head.weight" in sd:
        params["head"] = {"w": _t(sd["prediction_head.weight"]),
                          "b": jnp.asarray(sd["prediction_head.bias"])}
    if "BAN_att.logits.h_mat_v" in sd:
        glimpse = sd["BAN_att.logits.h_mat_v"].shape[1]
        params["ban"] = {
            "att": {"logits": _bcnet_from(sd, "BAN_att.logits", True)},
            "res": {
                "b_net": [
                    _bcnet_from(sd, f"BAN_resnet.b_net.{g}", False)
                    for g in range(glimpse)],
                "q_prj": [
                    _fcnet_from(sd, f"BAN_resnet.q_prj.{g}")
                    for g in range(glimpse)],
            },
        }
    return params
