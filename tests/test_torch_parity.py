"""Numerical parity vs torch for the building blocks whose semantics must
match the reference exactly: MultiheadAttention (packed qkv conversion),
post-norm encoder layer, ResNet bottleneck with FrozenBN + DC5 dilation.
These validate both the Flax modules and tools/convert_weights.py's layout
conventions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from interactron_tpu.models.layers import Conv2d, FrozenBatchNorm, MultiHeadAttention
from interactron_tpu.models.detr import EncoderLayer
from interactron_tpu.models.resnet import Bottleneck
from tools.convert_weights import _conv, _frozen_bn, _linear, _mha


def test_mha_matches_torch():
    d, h, B, T = 32, 4, 2, 9
    torch.manual_seed(0)
    mha = tnn.MultiheadAttention(d, h, dropout=0.0)
    x = torch.randn(T, B, d)
    out_t, _ = mha(x, x, x)
    sd = {f"attn.{k}": v.detach().numpy() for k, v in mha.state_dict().items()}
    params = _mha(sd, "attn", d)
    mod = MultiHeadAttention(embed_dim=d, num_heads=h)
    xj = jnp.asarray(x.permute(1, 0, 2).detach().numpy())
    out_j = mod.apply({"params": params}, xj, xj, xj)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(1, 0, 2).detach().numpy(), atol=2e-5
    )


def test_encoder_layer_matches_torch_reference_layer():
    """Re-express the reference TransformerEncoderLayer post-norm forward
    (detr_models/transformer.py:148-161) in torch and compare."""
    d, h, B, T = 32, 4, 2, 7
    torch.manual_seed(1)

    attn = tnn.MultiheadAttention(d, h, dropout=0.0)
    linear1, linear2 = tnn.Linear(d, 64), tnn.Linear(64, d)
    norm1, norm2 = tnn.LayerNorm(d), tnn.LayerNorm(d)

    src = torch.randn(T, B, d)
    pos = torch.randn(T, 1, d).expand(T, B, d)
    q = k = src + pos
    src2 = attn(q, k, src)[0]
    t = norm1(src + src2)
    t2 = linear2(tF.relu(linear1(t)))
    out_t = norm2(t + t2)

    sd = {}
    for name, mod in [("self_attn", attn), ("linear1", linear1), ("linear2", linear2),
                      ("norm1", norm1), ("norm2", norm2)]:
        for k2, v in mod.state_dict().items():
            sd[f"{name}.{k2}"] = v.detach().numpy()
    params = {
        "self_attn": _mha(sd, "self_attn", d),
        "linear1": _linear(sd, "linear1"),
        "linear2": _linear(sd, "linear2"),
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
    }
    layer = EncoderLayer(d_model=d, num_heads=h, ff_dim=64, dropout_rate=0.0, dtype=jnp.float32)
    out_j = layer.apply(
        {"params": params},
        jnp.asarray(src.permute(1, 0, 2).detach().numpy()),
        jnp.asarray(pos.permute(1, 0, 2).detach().numpy()),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(1, 0, 2).detach().numpy(), atol=3e-5
    )


class _TorchFrozenBN(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.rand(n) + 0.5)
        self.register_buffer("bias", torch.randn(n))
        self.register_buffer("running_mean", torch.randn(n) * 0.1)
        self.register_buffer("running_var", torch.rand(n) + 0.5)

    def forward(self, x):
        scale = self.weight * (self.running_var + 1e-5).rsqrt()
        return x * scale.reshape(1, -1, 1, 1) + (self.bias - self.running_mean * scale).reshape(1, -1, 1, 1)


class _TorchBottleneck(tnn.Module):
    """torchvision Bottleneck semantics (stride on conv2, optional dilation)."""

    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = _TorchFrozenBN(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn2 = _TorchFrozenBN(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = _TorchFrozenBN(planes * 4)
        self.down = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                _TorchFrozenBN(planes * 4),
            )
            self.down = True

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        identity = self.downsample(x) if self.down else x
        return tF.relu(out + identity)


@pytest.mark.parametrize("stride,dilation,downsample", [(1, 1, True), (2, 1, True), (1, 2, False)])
def test_bottleneck_matches_torch(stride, dilation, downsample):
    torch.manual_seed(2)
    cin = 16 if downsample else 32
    planes = 8
    tb = _TorchBottleneck(cin, planes, stride, dilation, downsample)
    x = torch.randn(1, cin, 12, 12)
    out_t = tb(x).detach().numpy()

    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    tree = {}
    frozen = {}
    for i in (1, 2, 3):
        tree[f"conv{i}"] = _conv(sd, f"conv{i}")
        frozen[f"bn{i}"] = _frozen_bn(sd, f"bn{i}")
    if downsample:
        tree["downsample_conv"] = _conv(sd, "downsample.0")
        frozen["downsample_bn"] = _frozen_bn(sd, "downsample.1")

    mod = Bottleneck(planes=planes, stride=stride, dilation=dilation,
                     downsample=downsample, dtype=jnp.float32)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    out_j = mod.apply({"params": tree, "frozen": frozen}, xj)
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=3e-5
    )


def test_stem_space_to_depth_matches_direct_conv():
    """The s2d execution of the 7x7/s2/p3 stem conv (Conv2d.space_to_depth)
    must equal the direct convolution — same weights, same variable layout,
    only the schedule differs (reference stem: torchvision resnet conv1,
    detr_models/backbone.py:82-92)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 60, 60, 3).astype(np.float32))
    direct = Conv2d(64, (7, 7), (2, 2), 3, frozen=True)
    s2d = Conv2d(64, (7, 7), (2, 2), 3, frozen=True, space_to_depth=True)
    var = direct.init(jax.random.PRNGKey(1), x)
    y_direct = direct.apply(var, x)
    y_s2d = s2d.apply(var, x)
    assert y_s2d.shape == y_direct.shape == (2, 30, 30, 64)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_direct), atol=2e-5, rtol=1e-5
    )

    # torch cross-check on the same weights
    w = np.asarray(var["frozen"]["kernel"])  # HWIO
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    yt = tF.conv2d(xt, wt, stride=2, padding=3).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y_s2d), yt, atol=2e-5, rtol=1e-5)
