"""Full reference-checkpoint conversion (the drop-in migration path).

Assembles a torch state_dict with the reference model's exact naming —
``T5_model.*`` (HF T5), ``vision_model.*`` (OpenAI CLIP layout),
``projection.*``, ``prediction_head.*``, ``mapping.*``, ``BAN_att.*`` /
``BAN_resnet.*`` (weight-normed, connect.py structure) — and checks
mprgen_from_reference_checkpoint reproduces each subsystem's outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import ban as jban
from multimodalpromptretrieval_tpu.models import mprgen
from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
from multimodalpromptretrieval_tpu.models.convert import (
    mprgen_from_reference_checkpoint,
    state_dict_to_numpy,
)
from multimodalpromptretrieval_tpu.models.t5 import T5Config, t5_loss

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
nn = torch.nn
from torch.nn.utils import weight_norm  # noqa: E402

from tests.test_ban_parity import TorchFCNet  # noqa: E402
from tests.test_clip_openai_convert import _export_openai_sd, OpenAIBlock  # noqa: E402


class RefBCNet(nn.Module):
    """connect.py BCNet structure/naming (h_mat glimpse path or None)."""

    def __init__(self, v_dim, q_dim, h_dim, glimpse, k, dropout=0.2):
        super().__init__()
        self.v_net = TorchFCNet([v_dim, h_dim * k], dropout=dropout)
        self.q_net = TorchFCNet([q_dim, h_dim * k], dropout=dropout)
        self.glimpse = glimpse
        self.k = k
        if glimpse is not None:
            self.h_mat = nn.Parameter(
                torch.Tensor(1, glimpse, 1, h_dim * k).normal_())
            self.h_bias = nn.Parameter(
                torch.Tensor(1, glimpse, 1, 1).normal_())


class RefBiResNet(nn.Module):
    def __init__(self, v_dim, q_dim, glimpse):
        super().__init__()
        self.b_net = nn.ModuleList(
            [RefBCNet(v_dim, q_dim, q_dim, None, k=1)
             for _ in range(glimpse)])
        self.q_prj = nn.ModuleList(
            [TorchFCNet([q_dim, q_dim], act="", dropout=0.2)
             for _ in range(glimpse)])


@pytest.fixture(scope="module")
def reference_sd_and_cfg():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(0)
    t5c = T5Config.tiny(vocab_size=96)
    clipc = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                       vision_layers=2, patch_size=16, context_length=12,
                       vocab_size=64, text_width=24, text_layers=2,
                       vision_heads_override=1, text_heads_override=1)
    cfg = mprgen.MPRGenConfig(
        t5=t5c, clip=clipc, use_prediction_head=True, use_ban=True,
        num_classes=7, glimpse=3, use_mapping=True)

    hf = T5ForConditionalGeneration(HFT5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
        decoder_start_token_id=0)).eval()
    sd = {f"T5_model.{k}": v for k, v in hf.state_dict().items()}

    vblocks = [OpenAIBlock(32, 1).eval() for _ in range(2)]
    tblocks = [OpenAIBlock(24, 1).eval() for _ in range(2)]
    clip_sd = _export_openai_sd(vblocks, 32, 16, 2, 16, 64, 12, 24, tblocks)
    sd.update({f"vision_model.{k}": torch.tensor(v)
               for k, v in clip_sd.items()})

    head = nn.Linear(32, 7)
    sd.update({f"prediction_head.{k}": v for k, v in head.state_dict().items()})

    mapping = nn.Sequential(nn.Linear(16, 16), nn.ReLU(), nn.Linear(16, 16))
    sd.update({f"mapping.linear_relu_stack.{k}": v
               for k, v in mapping.state_dict().items()})
    sd["mapping.logit_scale"] = torch.tensor(2.6592)

    att = weight_norm(RefBCNet(32, 32, 32, glimpse=3, k=3),
                      name="h_mat", dim=None).eval()
    sd.update({f"BAN_att.logits.{k}": v for k, v in att.state_dict().items()})
    res = RefBiResNet(32, 32, glimpse=3).eval()
    sd.update({f"BAN_resnet.{k}": v for k, v in res.state_dict().items()})

    return state_dict_to_numpy(sd), cfg, hf, att, res


def test_converts_all_subsystems(reference_sd_and_cfg):
    sd, cfg, *_ = reference_sd_and_cfg
    params = mprgen_from_reference_checkpoint(sd, cfg)
    for key in ("t5", "clip", "head", "mapping", "ban"):
        assert key in params, key
    assert params["head"]["w"].shape == (32, 7)
    assert len(params["ban"]["res"]["b_net"]) == 3


def test_t5_numerics_survive(reference_sd_and_cfg):
    sd, cfg, hf, *_ = reference_sd_and_cfg
    params = mprgen_from_reference_checkpoint(sd, cfg)
    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(2, 6, 32)).astype(np.float32)
    mask = np.ones((2, 6), np.int32)
    labels = rng.integers(2, 96, size=(2, 4))
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(embeds),
                 attention_mask=torch.tensor(mask),
                 labels=torch.tensor(labels)).loss.item()
    got = float(t5_loss(params["t5"], cfg.t5, jnp.asarray(embeds),
                        jnp.asarray(mask), jnp.asarray(labels)))
    assert got == pytest.approx(ref, rel=1e-5)


def test_ban_numerics_survive(reference_sd_and_cfg):
    sd, cfg, _, att, res = reference_sd_and_cfg
    params = mprgen_from_reference_checkpoint(sd, cfg)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(2, 5, 32)).astype(np.float32)
    q = rng.normal(size=(2, 4, 32)).astype(np.float32)

    # torch oracle of the BiAttention logits path (glimpse h_mat broadcast)
    with torch.no_grad():
        tv = att.v_net(torch.tensor(v)).unsqueeze(1)
        tq = att.q_net(torch.tensor(q))
        h_ = tv * att.h_mat
        ref_logits = (torch.matmul(
            h_, tq.unsqueeze(1).transpose(2, 3)) + att.h_bias).numpy()
    got_logits = np.asarray(jban.bcnet_logits(
        params["ban"]["att"]["logits"], jnp.asarray(v), jnp.asarray(q), k=3))
    np.testing.assert_allclose(got_logits, ref_logits, rtol=1e-4, atol=1e-5)

    # BiResNet fusion with a fixed attention map
    att_p = rng.random(size=(2, 3, 5, 4)).astype(np.float32)
    with torch.no_grad():
        q_emb = torch.tensor(q)
        for g in range(3):
            bc = res.b_net[g]
            v_ = bc.v_net(torch.tensor(v)).transpose(1, 2).unsqueeze(2)
            q_ = bc.q_net(q_emb).transpose(1, 2).unsqueeze(3)
            w = torch.tensor(att_p[:, g]).unsqueeze(1)
            logits = torch.matmul(torch.matmul(v_, w), q_).squeeze(3).squeeze(2)
            q_emb = res.q_prj[g](logits.unsqueeze(1)) + q_emb
        ref_fused = q_emb.sum(1).numpy()
    got_fused = np.asarray(jban.biresnet_apply(
        params["ban"]["res"], jnp.asarray(v), jnp.asarray(q),
        jnp.asarray(att_p)))
    np.testing.assert_allclose(got_fused, ref_fused, rtol=1e-4, atol=1e-4)
