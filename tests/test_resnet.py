"""ModifiedResNet tower: parity vs a torch re-statement of CLIP's RN
architecture on shared random weights, plus the RN-path model wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.models import resnet as rn

torch = pytest.importorskip("torch")
nn = torch.nn


# -- torch ModifiedResNet (independent re-statement of the public CLIP RN
#    architecture, used only as a test oracle) -------------------------------


class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            # the real CLIP layout: OrderedDict [("-1", AvgPool),
            # ("0", Conv), ("1", BN)] -> state_dict keys downsample.0
            # (conv) / downsample.1 (BN), which the converter must read
            from collections import OrderedDict

            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride) if stride > 1
                 else nn.Identity()),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, stride=1,
                                bias=False)),
                ("1", nn.BatchNorm2d(planes * 4))]))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchStemAndLayers(nn.Module):
    def __init__(self, layers, width):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return x


def _convert(torch_model, cfg):
    """torch module -> our params pytree, via the OpenAI state_dict naming."""
    sd = {f"visual.{k}": v.detach().numpy()
          for k, v in torch_model.state_dict().items()
          if "num_batches" not in k}
    # the converter also expects attnpool keys; synthesize minimal ones
    c = cfg.final_channels
    sp = cfg.grid
    rng = np.random.default_rng(0)
    sd["visual.attnpool.positional_embedding"] = rng.normal(
        size=(sp * sp + 1, c)).astype(np.float32)
    for n in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{n}.weight"] = rng.normal(
            size=(c, c)).astype(np.float32) * 0.02
        sd[f"visual.attnpool.{n}.bias"] = np.zeros((c,), np.float32)
    sd["visual.attnpool.c_proj.weight"] = rng.normal(
        size=(cfg.embed_dim, c)).astype(np.float32) * 0.02
    sd["visual.attnpool.c_proj.bias"] = np.zeros((cfg.embed_dim,),
                                                 np.float32)
    return rn.resnet_from_openai(sd, cfg)


def test_grid_features_match_torch():
    cfg = rn.ResNetConfig(layers=(1, 1, 1, 1), width=16, embed_dim=32,
                          heads=4, image_resolution=64)
    torch.manual_seed(0)
    tm = TorchStemAndLayers(cfg.layers, cfg.width).eval()
    # randomize BN running stats so the BN math is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)
    params = _convert(tm, cfg)
    x = np.random.default_rng(1).normal(size=(2, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()  # (B, C, H, W)
    ref = np.transpose(ref.reshape(ref.shape[0], ref.shape[1], -1),
                       (0, 2, 1))
    got = np.asarray(rn.resnet_grid_features(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_encode_image_runs():
    cfg = rn.ResNetConfig.tiny()
    params = rn.init_resnet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, cfg.image_resolution, cfg.image_resolution)).astype(
        np.float32))
    out = rn.resnet_encode_image(params, cfg, x)
    assert out.shape == (2, cfg.embed_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rn_model_variant_trains():
    """RN visual prefix flows through the generative loss + a train step."""
    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
    from multimodalpromptretrieval_tpu.models.t5 import T5Config
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh
    from multimodalpromptretrieval_tpu.train.optim import adamw_init

    cfg = mprgen.MPRGenConfig(
        t5=T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                    num_layers=1, num_decoder_layers=1, num_heads=4),
        clip=CLIPConfig.tiny(),
        resnet=rn.ResNetConfig.tiny(),
    )
    assert cfg.num_image_tokens == (64 // 32) ** 2
    params = mprgen.init_mprgen(jax.random.PRNGKey(0), cfg)
    assert "clip_rn" in params and "rn_proj" in params
    mask = mprgen.trainable_mask(params, cfg)
    assert not any(jax.tree.leaves(mask["clip_rn"]))
    assert all(jax.tree.leaves(mask["rn_proj"]))
    rng = np.random.default_rng(0)
    R = cfg.resnet.image_resolution
    batch = {
        "images": rng.normal(size=(2, 3, R, R)).astype(np.float32),
        "input_ids": rng.integers(2, 128, size=(2, 8)).astype(np.int32),
        "text_mask": np.ones((2, 8), np.int32),
        "labels": rng.integers(2, 128, size=(2, 4)).astype(np.int64),
    }
    step = pmesh.make_train_step(cfg, mask, donate=False)
    import jax.numpy as jnp_

    p2, _, loss = step(params, adamw_init(params), batch,
                       jnp_.float32(1e-3), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # frozen RN unchanged; projection updated
    np.testing.assert_array_equal(
        np.asarray(p2["clip_rn"]["conv1"]), np.asarray(params["clip_rn"]["conv1"]))
    assert not np.allclose(np.asarray(p2["rn_proj"]["w"]),
                           np.asarray(params["rn_proj"]["w"]))
