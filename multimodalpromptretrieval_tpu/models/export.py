"""Checkpoint exporters: JAX pytrees -> reference/torch state_dict layouts.

The inverse of models/convert.py — lets a model trained in this framework be
loaded by the reference implementation (``torch.save({'model_state_dict':
...})`` consumed by reference main.py:230-232) or by HF
``T5ForConditionalGeneration`` / OpenAI ``clip.load`` style code. Used by
the cross-framework accuracy parity harness (scripts/run_parity.py), which
runs the *actual* reference driver on weights trained here and diffs the
metric tables.

All outputs are ``{name: np.ndarray}``; callers wrap in torch tensors.
Round-trip (export -> convert) is identity — tests/test_export.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import numpy as np

from multimodalpromptretrieval_tpu.models.t5 import T5Config


def _n(x) -> np.ndarray:
    return np.asarray(x)


def _nt(x) -> np.ndarray:
    """Undo convert._t: our (in, out) kernels -> torch (out, in)."""
    return np.ascontiguousarray(np.asarray(x).T)


def _unstack(tree) -> List[Dict[str, Any]]:
    """Invert convert._stack: a pytree with leading layer dim -> per-layer
    pytrees."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    n = leaves[0].shape[0]
    return [jax.tree.unflatten(treedef, [np.asarray(l[i]) for l in leaves])
            for i in range(n)]


# ---------------------------------------------------------------------------
# T5 -> HF layout
# ---------------------------------------------------------------------------


def t5_to_hf(params: Mapping[str, Any], cfg: T5Config) -> Dict[str, np.ndarray]:
    """init_t5 pytree -> HF T5ForConditionalGeneration state_dict arrays.

    Includes the tied copies HF's state_dict carries
    (encoder/decoder.embed_tokens.weight, lm_head.weight = shared.weight).
    """
    gated = cfg.feed_forward_proj == "gated-gelu"
    sd: Dict[str, np.ndarray] = {}

    def put_attn(prefix, a):
        for k in ("q", "k", "v", "o"):
            sd[f"{prefix}.{k}.weight"] = _nt(a[k])

    def put_ff(prefix, f):
        if gated:
            sd[f"{prefix}.wi_0.weight"] = _nt(f["wi_0"])
            sd[f"{prefix}.wi_1.weight"] = _nt(f["wi_1"])
        else:
            sd[f"{prefix}.wi.weight"] = _nt(f["wi"])
        sd[f"{prefix}.wo.weight"] = _nt(f["wo"])

    shared = _n(params["shared"])
    sd["shared.weight"] = shared
    sd["encoder.embed_tokens.weight"] = shared
    sd["decoder.embed_tokens.weight"] = shared
    # this framework always ties the head (t5.py unscaled tied head);
    # HF strict loaders that untie simply ignore/overwrite this copy
    sd["lm_head.weight"] = shared

    for i, layer in enumerate(_unstack(params["encoder"]["block"])):
        b = f"encoder.block.{i}.layer"
        put_attn(f"{b}.0.SelfAttention", layer["attn"])
        sd[f"{b}.0.layer_norm.weight"] = _n(layer["attn_ln"])
        put_ff(f"{b}.1.DenseReluDense", layer["ff"])
        sd[f"{b}.1.layer_norm.weight"] = _n(layer["ff_ln"])
    sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
       ".weight"] = _n(params["encoder"]["rel_bias"])
    sd["encoder.final_layer_norm.weight"] = _n(params["encoder"]["final_ln"])

    for i, layer in enumerate(_unstack(params["decoder"]["block"])):
        b = f"decoder.block.{i}.layer"
        put_attn(f"{b}.0.SelfAttention", layer["self_attn"])
        sd[f"{b}.0.layer_norm.weight"] = _n(layer["self_ln"])
        put_attn(f"{b}.1.EncDecAttention", layer["cross_attn"])
        sd[f"{b}.1.layer_norm.weight"] = _n(layer["cross_ln"])
        put_ff(f"{b}.2.DenseReluDense", layer["ff"])
        sd[f"{b}.2.layer_norm.weight"] = _n(layer["ff_ln"])
    sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias"
       ".weight"] = _n(params["decoder"]["rel_bias"])
    sd["decoder.final_layer_norm.weight"] = _n(params["decoder"]["final_ln"])
    return sd


# ---------------------------------------------------------------------------
# CLIP -> OpenAI layout
# ---------------------------------------------------------------------------


def _put_openai_block(sd, prefix, b):
    sd[f"{prefix}.ln_1.weight"] = _n(b["ln_1"]["w"])
    sd[f"{prefix}.ln_1.bias"] = _n(b["ln_1"]["b"])
    sd[f"{prefix}.attn.in_proj_weight"] = _nt(b["attn"]["wqkv"])
    sd[f"{prefix}.attn.in_proj_bias"] = _n(b["attn"]["bqkv"])
    sd[f"{prefix}.attn.out_proj.weight"] = _nt(b["attn"]["out"])
    sd[f"{prefix}.attn.out_proj.bias"] = _n(b["attn"]["out_b"])
    sd[f"{prefix}.ln_2.weight"] = _n(b["ln_2"]["w"])
    sd[f"{prefix}.ln_2.bias"] = _n(b["ln_2"]["b"])
    sd[f"{prefix}.mlp.c_fc.weight"] = _nt(b["mlp"]["fc"])
    sd[f"{prefix}.mlp.c_fc.bias"] = _n(b["mlp"]["fc_b"])
    sd[f"{prefix}.mlp.c_proj.weight"] = _nt(b["mlp"]["proj"])
    sd[f"{prefix}.mlp.c_proj.bias"] = _n(b["mlp"]["proj_b"])


def clip_to_openai(params: Mapping[str, Any], cfg) -> Dict[str, np.ndarray]:
    """init_clip pytree -> OpenAI ``clip.load`` state_dict arrays."""
    v = params["visual"]
    t = params["text"]
    sd: Dict[str, np.ndarray] = {}
    conv_flat = _n(v["conv1"])  # (3·p², width)
    width = conv_flat.shape[1]
    p = cfg.patch_size
    sd["visual.conv1.weight"] = np.ascontiguousarray(
        conv_flat.T.reshape(width, 3, p, p))
    sd["visual.class_embedding"] = _n(v["class_embedding"])
    sd["visual.positional_embedding"] = _n(v["pos_embedding"])
    sd["visual.ln_pre.weight"] = _n(v["ln_pre"]["w"])
    sd["visual.ln_pre.bias"] = _n(v["ln_pre"]["b"])
    for i, b in enumerate(_unstack(v["blocks"])):
        _put_openai_block(sd, f"visual.transformer.resblocks.{i}", b)
    sd["visual.ln_post.weight"] = _n(v["ln_post"]["w"])
    sd["visual.ln_post.bias"] = _n(v["ln_post"]["b"])
    sd["visual.proj"] = _n(v["proj"])
    sd["token_embedding.weight"] = _n(t["token_embedding"])
    sd["positional_embedding"] = _n(t["pos_embedding"])
    for i, b in enumerate(_unstack(t["blocks"])):
        _put_openai_block(sd, f"transformer.resblocks.{i}", b)
    sd["ln_final.weight"] = _n(t["ln_final"]["w"])
    sd["ln_final.bias"] = _n(t["ln_final"]["b"])
    sd["text_projection"] = _n(t["text_projection"])
    sd["logit_scale"] = _n(params["logit_scale"])
    return sd


# ---------------------------------------------------------------------------
# Full model -> reference T5VisionModel* state_dict
# ---------------------------------------------------------------------------


def _put_wn_linear(sd, prefix, p):
    """Inverse of convert._wn_linear_from (weight_norm dim=None)."""
    sd[f"{prefix}.weight_v"] = _nt(p["v"])
    sd[f"{prefix}.weight_g"] = _n(p["g"]).reshape(())
    sd[f"{prefix}.bias"] = _n(p["b"])


def _put_fcnet(sd, prefix, layers):
    """Reference FCNet.main Sequential puts the weight-normed Linear after
    a Dropout (network/connect.py:14-38) — Linear lives at index 1 of each
    [Dropout, Linear, Act?] group."""
    for j, p in enumerate(layers):
        _put_wn_linear(sd, f"{prefix}.main.{3 * j + 1}", p)


def _put_bcnet(sd, prefix, p, with_hmat):
    _put_fcnet(sd, f"{prefix}.v_net", p["v_net"])
    _put_fcnet(sd, f"{prefix}.q_net", p["q_net"])
    if with_hmat:
        sd[f"{prefix}.h_mat_v"] = _n(p["h_mat"]["v"])
        sd[f"{prefix}.h_mat_g"] = _n(p["h_mat"]["g"]).reshape(())
        sd[f"{prefix}.h_bias"] = _n(p["h_bias"])


def mprgen_to_reference_state_dict(params: Mapping[str, Any], cfg
                                   ) -> Dict[str, np.ndarray]:
    """params pytree -> the reference T5VisionModel* state_dict layout
    (inverse of convert.mprgen_from_reference_checkpoint), so a model
    trained here loads into the reference via
    ``model.load_state_dict(checkpoint['model_state_dict'])``.
    """
    sd: Dict[str, np.ndarray] = {}
    for k, v in t5_to_hf(params["t5"], cfg.t5).items():
        sd[f"T5_model.{k}"] = v
    for k, v in clip_to_openai(params["clip"], cfg.clip).items():
        sd[f"vision_model.{k}"] = v
    if "proj" in params:
        sd["projection.weight"] = _nt(params["proj"]["w"])
        sd["projection.bias"] = _n(params["proj"]["b"])
    if "rn_proj" in params:
        sd["projection.weight"] = _nt(params["rn_proj"]["w"])
        sd["projection.bias"] = _n(params["rn_proj"]["b"])
    if "mapping" in params and params["mapping"]:
        m = params["mapping"]
        sd["mapping.linear_relu_stack.0.weight"] = _nt(m["fc1"]["w"])
        sd["mapping.linear_relu_stack.0.bias"] = _n(m["fc1"]["b"])
        sd["mapping.linear_relu_stack.2.weight"] = _nt(m["fc2"]["w"])
        sd["mapping.linear_relu_stack.2.bias"] = _n(m["fc2"]["b"])
        sd["mapping.logit_scale"] = _n(m["logit_scale"]).reshape(())
    if "head" in params:
        sd["prediction_head.weight"] = _nt(params["head"]["w"])
        sd["prediction_head.bias"] = _n(params["head"]["b"])
    if "ban" in params:
        ban = params["ban"]
        _put_bcnet(sd, "BAN_att.logits", ban["att"]["logits"], True)
        for g, p in enumerate(ban["res"]["b_net"]):
            _put_bcnet(sd, f"BAN_resnet.b_net.{g}", p, False)
        for g, p in enumerate(ban["res"]["q_prj"]):
            _put_fcnet(sd, f"BAN_resnet.q_prj.{g}", p)
    return sd
