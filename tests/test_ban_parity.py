"""BAN fusion ops vs a torch oracle (weight-normed FCNet / BCNet).

The reference vendors network/connect.py (weight_norm(dim=None) everywhere)
and builds BiAttention/BiResNet on top. The oracle below restates those
modules in torch with the same math; weights are shared through the
converter and outputs must match at fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import ban
from multimodalpromptretrieval_tpu.ops.layers import weight_norm_kernel

torch = pytest.importorskip("torch")
nn = torch.nn
from torch.nn.utils import weight_norm  # noqa: E402


def _wn_linear(inp, out):
    return weight_norm(nn.Linear(inp, out), dim=None)


class TorchFCNet(nn.Module):
    def __init__(self, dims, act="ReLU", dropout=0.0):
        super().__init__()
        layers = []
        for i in range(len(dims) - 1):
            if dropout > 0:
                layers.append(nn.Dropout(dropout))
            layers.append(_wn_linear(dims[i], dims[i + 1]))
            if act:
                layers.append(getattr(nn, act)())
        self.main = nn.Sequential(*layers)

    def forward(self, x):
        return self.main(x)


class TorchBCNet(nn.Module):
    """Low-rank bilinear pooling, glimpse h_mat path (k=3) and the
    forward_with_weights path (k=1)."""

    def __init__(self, v_dim, q_dim, h_dim, glimpse, k):
        super().__init__()
        self.k = k
        self.v_net = TorchFCNet([v_dim, h_dim * k])
        self.q_net = TorchFCNet([q_dim, h_dim * k])
        self.dropout = nn.Dropout(0.2)
        self.glimpse = glimpse
        if glimpse is not None:
            self.h_mat = nn.Parameter(
                torch.Tensor(1, glimpse, 1, h_dim * k).normal_())
            self.h_bias = nn.Parameter(
                torch.Tensor(1, glimpse, 1, 1).normal_())
            # weight_norm with dim=None over h_mat, as in connect.py
            self.h_g = nn.Parameter(self.h_mat.norm())

    def logits(self, v, q):
        v_ = self.v_net(v).unsqueeze(1)  # (b, 1, nv, hk)
        q_ = self.q_net(q)               # (b, nq, hk)
        h = self.h_g * self.h_mat / self.h_mat.norm()
        h_ = v_ * h                      # (b, g, nv, hk)
        logits = torch.einsum("bgvh,bqh->bgvq", h_, q_)
        return logits + self.h_bias

    def forward_with_weights(self, v, q, w):
        v_ = self.v_net(v)
        q_ = self.q_net(q)
        logits = torch.einsum("bvd,bvq,bqd->bd", v_, w, q_)
        if self.k > 1:
            b, d = logits.shape
            logits = logits.view(b, d // self.k, self.k).sum(-1)
        return logits


def _convert_fcnet(torch_fc):
    layers = []
    for m in torch_fc.main:
        if isinstance(m, nn.Linear):
            v = m.weight_v.detach().numpy().T
            g = float(m.weight_g.detach())
            b = m.bias.detach().numpy()
            layers.append({"v": jnp.asarray(v), "g": jnp.asarray(g),
                           "b": jnp.asarray(b)})
    return layers


def _convert_bcnet(tb):
    p = {"v_net": _convert_fcnet(tb.v_net), "q_net": _convert_fcnet(tb.q_net)}
    if tb.glimpse is not None:
        p["h_mat"] = {"v": jnp.asarray(tb.h_mat.detach().numpy()),
                      "g": jnp.asarray(float(tb.h_g.detach()))}
        p["h_bias"] = jnp.asarray(tb.h_bias.detach().numpy())
    return p


def test_weight_norm_kernel_matches_torch():
    torch.manual_seed(0)
    lin = _wn_linear(8, 6)
    w_ref = lin.weight.detach().numpy()
    w_got = np.asarray(weight_norm_kernel(
        jnp.asarray(lin.weight_v.detach().numpy()),
        jnp.asarray(float(lin.weight_g.detach()))))
    np.testing.assert_allclose(w_got, w_ref, rtol=1e-6, atol=1e-6)


def test_fcnet_matches_torch():
    torch.manual_seed(1)
    tf = TorchFCNet([8, 12, 6]).eval()
    params = _convert_fcnet(tf)
    x = np.random.default_rng(0).normal(size=(3, 5, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tf(torch.tensor(x)).numpy()
    got = np.asarray(ban.fcnet_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bcnet_logits_match_torch():
    torch.manual_seed(2)
    tb = TorchBCNet(8, 10, 6, glimpse=4, k=3).eval()
    params = _convert_bcnet(tb)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(2, 7, 8)).astype(np.float32)
    q = rng.normal(size=(2, 5, 10)).astype(np.float32)
    with torch.no_grad():
        ref = tb.logits(torch.tensor(v), torch.tensor(q)).numpy()
    got = np.asarray(ban.bcnet_logits(params, jnp.asarray(v),
                                      jnp.asarray(q), k=3))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_bcnet_forward_with_weights_matches_torch():
    torch.manual_seed(3)
    tb = TorchBCNet(8, 10, 10, glimpse=None, k=1).eval()
    params = _convert_bcnet(tb)
    rng = np.random.default_rng(2)
    v = rng.normal(size=(2, 7, 8)).astype(np.float32)
    q = rng.normal(size=(2, 5, 10)).astype(np.float32)
    w = rng.normal(size=(2, 7, 5)).astype(np.float32)
    with torch.no_grad():
        ref = tb.forward_with_weights(
            torch.tensor(v), torch.tensor(q), torch.tensor(w)).numpy()
    got = np.asarray(ban.bcnet_forward_with_weights(
        params, jnp.asarray(v), jnp.asarray(q), jnp.asarray(w), k=1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_biattention_masks_zero_image_rows():
    key = jax.random.PRNGKey(0)
    p = ban.init_biattention(key, 8, 8, 8, glimpse=2)
    rng = np.random.default_rng(3)
    v = rng.normal(size=(1, 4, 8)).astype(np.float32)
    v[0, 2] = 0.0  # all-zero image row must get zero attention
    q = rng.normal(size=(1, 3, 8)).astype(np.float32)
    att, _ = ban.biattention_apply(p, jnp.asarray(v), jnp.asarray(q))
    att = np.asarray(att)
    assert att.shape == (1, 2, 4, 3)
    np.testing.assert_allclose(att[0, :, 2, :], 0.0, atol=1e-7)
    np.testing.assert_allclose(att.reshape(2, -1).sum(-1), 1.0, rtol=1e-5)


def test_ban_logits_bucket_width_invariant():
    """ban_logits must equal the reference's padding="longest" layout no
    matter how far the bucket pads past the batch's longest row: the
    q_valid mask (models/mprgen.ban_logits) hides the extra columns from
    the BiAttention softmax (BAN.py:122-124) and the BiResNet final sum
    (BAN.py:75)."""
    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
    from multimodalpromptretrieval_tpu.models.t5 import T5Config

    t5c = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32,
                   num_layers=1, num_decoder_layers=1, num_heads=2)
    clipc = CLIPConfig(
        embed_dim=16, image_resolution=32, vision_layers=1,
        vision_width=16, patch_size=16, context_length=16,
        vocab_size=64, text_width=16, vision_heads_override=2,
        text_heads_override=2)
    cfg = mprgen.MPRGenConfig(t5=t5c, clip=clipc, use_prediction_head=True,
                              use_ban=True, num_classes=5)
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    B, longest = 3, 9
    images = jnp.asarray(rng.normal(size=(B, 3, 32, 32)).astype(np.float32))
    lens = [5, 9, 7]
    rows = [rng.integers(2, 60, size=ln).astype(np.int32) for ln in lens]

    def build(width):
        ids = np.zeros((B, width), np.int32)
        mask = np.zeros((B, width), np.int32)
        for i, r in enumerate(rows):
            ids[i, :len(r)] = r
            mask[i, :len(r)] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    ids_l, mask_l = build(longest)       # the reference's "longest" layout
    ids_b, mask_b = build(longest + 23)  # a bucketed width far past it
    out_l = np.asarray(mprgen.ban_logits(params, cfg, images, ids_l, mask_l))
    out_b = np.asarray(mprgen.ban_logits(params, cfg, images, ids_b, mask_b))
    np.testing.assert_allclose(out_b, out_l, rtol=2e-5, atol=2e-5)
