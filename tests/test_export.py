"""Export round-trip: params -> reference state_dict -> convert -> params.

Validates models/export.py (the migration path OUT of the framework used by
the cross-framework parity harness) against models/convert.py, and the HF
key-set against a real torch T5ForConditionalGeneration.
"""

import numpy as np
import pytest
import jax

from multimodalpromptretrieval_tpu.models import convert, export, mprgen
from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
from multimodalpromptretrieval_tpu.models.t5 import T5Config


def _tiny_cfg(**kw):
    return mprgen.MPRGenConfig(
        t5=T5Config(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                    num_layers=2, num_decoder_layers=2, num_heads=4),
        clip=CLIPConfig(embed_dim=64, image_resolution=32, vision_width=64,
                        vision_layers=2, patch_size=16, context_length=16,
                        vocab_size=96, text_width=64,
                        vision_heads_override=2, text_heads_override=2),
        use_image_info=True, max_source_length=64, max_target_length=16,
        **kw)


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_base_variant():
    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    sd = export.mprgen_to_reference_state_dict(params, cfg)
    back = convert.mprgen_from_reference_checkpoint(sd, cfg)
    _assert_tree_equal(params["t5"], back["t5"])
    _assert_tree_equal(params["clip"], back["clip"])


def test_roundtrip_ban_variant():
    cfg = _tiny_cfg(use_prediction_head=True, use_ban=True, num_classes=7)
    params = mprgen.init_mprgen(jax.random.PRNGKey(1), cfg)
    sd = export.mprgen_to_reference_state_dict(params, cfg)
    back = convert.mprgen_from_reference_checkpoint(sd, cfg)
    _assert_tree_equal(params["ban"], back["ban"])
    _assert_tree_equal(params["head"], back["head"])


def test_hf_t5_keyset_and_load():
    """The exported T5 keys must load strict into a real HF model — and the
    loaded torch model must agree with the export source arrays."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    cfg = _tiny_cfg()
    params = mprgen.init_mprgen(jax.random.PRNGKey(2), cfg)
    sd = export.t5_to_hf(params["t5"], cfg.t5)
    hf = T5ForConditionalGeneration(HFT5Config(
        vocab_size=cfg.t5.vocab_size, d_model=cfg.t5.d_model,
        d_kv=cfg.t5.d_kv, d_ff=cfg.t5.d_ff, num_layers=cfg.t5.num_layers,
        num_decoder_layers=cfg.t5.num_decoder_layers,
        num_heads=cfg.t5.num_heads, feed_forward_proj="relu",
        tie_word_embeddings=True))
    missing, unexpected = hf.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, f"exported keys HF doesn't know: {unexpected}"
    # every real HF key must be covered (tied lm_head may be absent from
    # the model's state_dict depending on version; both directions checked)
    assert not [m for m in missing if "lm_head" not in m], missing
    got = hf.shared.weight.detach().numpy()
    np.testing.assert_array_equal(got, np.asarray(params["t5"]["shared"]))
