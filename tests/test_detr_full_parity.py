"""Full-detector parity: a complete torch re-expression of the reference
DETR (ResNet-50-DC5 + 6+6 transformer + heads, detr_models/) with random
weights, converted through tools/convert_weights.convert_detector, must
produce the same pred_logits/pred_boxes as our Flax DETR. This is the
end-to-end guarantee that real pretrained checkpoints transfer exactly.

Small input (64x64 -> 4x4 feature map) keeps the CPU cost low while
exercising every layer at true channel widths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from interactron_tpu.models.detr import DETR
from tests.test_position_encoding import torch_sine
from tools.convert_weights import convert_detector

NUM_CLASSES = 7
D = 256


class FrozenBN(tnn.Module):
    def __init__(self, n):
        super().__init__()
        g = torch.Generator().manual_seed(n)
        self.register_buffer("weight", torch.rand(n, generator=g) + 0.5)
        self.register_buffer("bias", torch.randn(n, generator=g) * 0.1)
        self.register_buffer("running_mean", torch.randn(n, generator=g) * 0.1)
        self.register_buffer("running_var", torch.rand(n, generator=g) + 0.5)

    def forward(self, x):
        s = self.weight * (self.running_var + 1e-5).rsqrt()
        return x * s.reshape(1, -1, 1, 1) + (self.bias - self.running_mean * s).reshape(1, -1, 1, 1)


class Bottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = FrozenBN(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn2 = FrozenBN(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = FrozenBN(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False), FrozenBN(planes * 4)
            )

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        idn = self.downsample(x) if self.downsample is not None else x
        return tF.relu(out + idn)


def _layer(cin, planes, blocks, stride, dilate=False):
    # torchvision semantics: dilate replaces stride (backbone DC5 on layer4)
    first_stride = 1 if dilate else stride
    mods = [Bottleneck(cin, planes, stride=first_stride, dilation=1, downsample=True)]
    for _ in range(1, blocks):
        mods.append(Bottleneck(planes * 4, planes, dilation=2 if dilate else 1))
    return tnn.Sequential(*mods)


class TorchResNet50DC5(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FrozenBN(64)
        self.layer1 = _layer(64, 64, 3, 1)
        self.layer2 = _layer(256, 128, 4, 2)
        self.layer3 = _layer(512, 256, 6, 2)
        self.layer4 = _layer(1024, 512, 3, 2, dilate=True)

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        x = tF.max_pool2d(x, 3, stride=2, padding=1)
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class EncLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(D, 8, dropout=0.0)
        self.linear1 = tnn.Linear(D, 2048)
        self.linear2 = tnn.Linear(2048, D)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)

    def forward(self, src, pos):
        q = k = src + pos
        src2 = self.self_attn(q, k, src)[0]
        src = self.norm1(src + src2)
        src2 = self.linear2(tF.relu(self.linear1(src)))
        return self.norm2(src + src2)


class DecLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(D, 8, dropout=0.0)
        self.multihead_attn = tnn.MultiheadAttention(D, 8, dropout=0.0)
        self.linear1 = tnn.Linear(D, 2048)
        self.linear2 = tnn.Linear(2048, D)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)
        self.norm3 = tnn.LayerNorm(D)

    def forward(self, tgt, memory, qpos, pos):
        q = k = tgt + qpos
        tgt = self.norm1(tgt + self.self_attn(q, k, tgt)[0])
        tgt2 = self.multihead_attn(tgt + qpos, memory + pos, memory)[0]
        tgt = self.norm2(tgt + tgt2)
        tgt2 = self.linear2(tF.relu(self.linear1(tgt)))
        return self.norm3(tgt + tgt2)


class TorchDETR(tnn.Module):
    def __init__(self, num_queries=50):
        super().__init__()
        self.backbone = TorchResNet50DC5()
        self.input_proj = tnn.Conv2d(2048, D, 1)
        self.query_embed = tnn.Embedding(num_queries, D)
        self.enc = tnn.ModuleList([EncLayer() for _ in range(6)])
        self.dec = tnn.ModuleList([DecLayer() for _ in range(6)])
        self.dec_norm = tnn.LayerNorm(D)
        self.class_embed = tnn.Linear(D, NUM_CLASSES + 1)
        self.bbox_embed = tnn.ModuleList(
            [tnn.Linear(D, D), tnn.Linear(D, D), tnn.Linear(D, 4)]
        )

    def forward(self, x):
        feats = self.backbone(x)  # (B, 2048, h, w)
        src = self.input_proj(feats)
        b, c, h, w = src.shape
        pos = torch.tensor(torch_sine(h, w, D // 2)).T.reshape(1, c, h, w)
        src_f = src.flatten(2).permute(2, 0, 1)  # (hw, B, C)
        pos_f = pos.flatten(2).permute(2, 0, 1).expand(-1, b, -1)
        mem = src_f
        for layer in self.enc:
            mem = layer(mem, pos_f)
        qpos = self.query_embed.weight.unsqueeze(1).expand(-1, b, -1)
        tgt = torch.zeros_like(qpos)
        for layer in self.dec:
            tgt = layer(tgt, mem, qpos, pos_f)
        hs = self.dec_norm(tgt).permute(1, 0, 2)  # (B, Q, C)
        logits = self.class_embed(hs)
        x1 = tF.relu(self.bbox_embed[0](hs))
        x2 = tF.relu(self.bbox_embed[1](x1))
        boxes = self.bbox_embed[2](x2).sigmoid()
        return logits, boxes


def _torch_state_dict_in_reference_layout(m):
    """Rename TorchDETR params into the reference checkpoint layout expected
    by convert_detector (backbone.0.body.*, transformer.encoder.layers.i.*)."""
    sd = {}
    for k, v in m.state_dict().items():
        nk = k
        if k.startswith("backbone."):
            nk = "backbone.0.body." + k[len("backbone."):]
        elif k.startswith("enc."):
            i = k.split(".")[1]
            nk = f"transformer.encoder.layers.{i}." + k.split(".", 2)[2]
        elif k.startswith("dec."):
            i = k.split(".")[1]
            nk = f"transformer.decoder.layers.{i}." + k.split(".", 2)[2]
        elif k.startswith("dec_norm."):
            nk = "transformer.decoder.norm." + k.split(".", 1)[1]
        elif k.startswith("bbox_embed."):
            i = k.split(".")[1]
            nk = f"bbox_embed.layers.{i}." + k.split(".", 2)[2]
        sd[nk] = v.detach().numpy()
    return sd


def test_full_detr_forward_parity():
    torch.manual_seed(0)
    m = TorchDETR().eval()
    x = torch.randn(2, 3, 64, 64) * 0.5
    with torch.no_grad():
        logits_t, boxes_t = m(x)

    sd = _torch_state_dict_in_reference_layout(m)
    params, frozen = convert_detector(sd)
    detr = DETR(num_classes=NUM_CLASSES, dtype=jnp.float32)
    out = detr.apply(
        {"params": params, "frozen": frozen["detector"]},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), logits_t.numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), boxes_t.numpy(), atol=5e-4
    )
