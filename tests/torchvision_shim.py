"""Minimal torchvision stand-in so the LIVE reference code at /root/reference
can run in this container (torchvision is not installed). Provides exactly
what the reference's model path imports:

  * torchvision.__version__ / _is_tracing (detr_models/util/misc.py:19-21)
  * torchvision.ops.boxes.box_area, ops.nms / box_iou / batched_nms
    (util/box_ops.py:5, engine evaluators)
  * torchvision.models.resnet50 with torchvision's exact module layout,
    replace_stride_with_dilation and norm_layer semantics
    (detr_models/backbone.py:88-92)
  * torchvision.models._utils.IntermediateLayerGetter

The ResNet matches torchvision's ResNet-V1.5 structure (stride on conv2,
dilation replaces stride on the dilated stage, first block of a dilated
stage keeps the previous dilation) so state_dicts are interchangeable with
real torchvision checkpoints.
"""

import sys
import types
from collections import OrderedDict

import torch
import torch.nn as nn


# --------------------------------------------------------------------- ops

def box_area(boxes):
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def box_iou(boxes1, boxes2):
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union.clamp(min=1e-12)


def nms(boxes, scores, iou_threshold):
    """Exact greedy NMS, torchvision convention (score-descending, strict >
    threshold suppression)."""
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    ious = box_iou(boxes, boxes)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        suppressed |= ious[idx] > iou_threshold
        suppressed[idx] = True
    return torch.tensor(keep, dtype=torch.long)


def batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long)
    # torchvision trick: offset boxes per category so they never overlap
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + 1)
    return nms(boxes + offsets[:, None], scores, iou_threshold)


# ------------------------------------------------------------------ resnet

def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


def _conv3x3(cin, cout, stride=1, dilation=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation,
                     dilation=dilation, bias=False)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = _conv1x1(inplanes, planes)
        self.bn1 = norm_layer(planes)
        self.conv2 = _conv3x3(planes, planes, stride, dilation)
        self.bn2 = norm_layer(planes)
        self.conv3 = _conv1x1(planes, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        identity = self.downsample(x) if self.downsample is not None else x
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3), replace_stride_with_dilation=None,
                 norm_layer=None, num_classes=1000):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self._norm_layer = norm_layer
        self.inplanes = 64
        self.dilation = 1
        rswd = replace_stride_with_dilation or [False, False, False]
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2, dilate=rswd[0])
        self.layer3 = self._make_layer(256, layers[2], stride=2, dilate=rswd[1])
        self.layer4 = self._make_layer(512, layers[3], stride=2, dilate=rswd[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * Bottleneck.expansion, num_classes)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        norm_layer = self._norm_layer
        previous_dilation = self.dilation
        downsample = None
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * Bottleneck.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * Bottleneck.expansion, stride),
                norm_layer(planes * Bottleneck.expansion),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                             previous_dilation, norm_layer)]
        self.inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes,
                                     dilation=self.dilation,
                                     norm_layer=norm_layer))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet50(pretrained=False, replace_stride_with_dilation=None,
             norm_layer=None, **kwargs):
    # `pretrained` is accepted but ignored: no network access here, and the
    # reference overwrites these weights from its own checkpoint anyway
    return ResNet((3, 4, 6, 3),
                  replace_stride_with_dilation=replace_stride_with_dilation,
                  norm_layer=norm_layer)


class IntermediateLayerGetter(nn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter semantics."""

    def __init__(self, model, return_layers):
        orig = {str(k): str(v) for k, v in return_layers.items()}
        remaining = dict(orig)
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


# ----------------------------------------------------------------- install

def install():
    """Register the shim as `torchvision` in sys.modules (idempotent)."""
    if "torchvision" in sys.modules and getattr(
        sys.modules["torchvision"], "__shim__", False
    ):
        return sys.modules["torchvision"]

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.0"
    tv.__shim__ = True
    tv._is_tracing = lambda: False
    # a real ModuleSpec so importlib.util.find_spec("torchvision") (e.g. HF
    # datasets' availability probe) does not raise on the shim
    import importlib.machinery

    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)

    ops = types.ModuleType("torchvision.ops")
    ops.nms = nms
    ops.box_iou = box_iou
    ops.batched_nms = batched_nms
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.box_area = box_area
    boxes_mod.box_iou = box_iou
    boxes_mod.nms = nms
    misc_mod = types.ModuleType("torchvision.ops.misc")
    misc_mod.interpolate = torch.nn.functional.interpolate
    ops.boxes = boxes_mod
    ops.misc = misc_mod

    models = types.ModuleType("torchvision.models")
    models.resnet50 = resnet50
    utils_mod = types.ModuleType("torchvision.models._utils")
    utils_mod.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = utils_mod

    # transforms: enough surface for the reference's transform modules to
    # IMPORT (utils/transform_utis.py builds Compose pipelines at module
    # scope; the functional ops are only invoked on real image data, which
    # the differential tests feed as pre-transformed tensors)
    transforms_mod = types.ModuleType("torchvision.transforms")
    tfunc = types.ModuleType("torchvision.transforms.functional")

    def _to_tensor(img):
        import numpy as _np

        arr = _np.asarray(img, _np.float32) / 255.0
        return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

    def _normalize(t, mean, std, inplace=False):
        m = torch.tensor(mean).view(-1, 1, 1)
        s = torch.tensor(std).view(-1, 1, 1)
        return (t - m) / s

    def _hflip(img):
        import PIL.Image

        return img.transpose(PIL.Image.FLIP_LEFT_RIGHT)

    def _resize(img, size):
        """torchvision F.resize on a PIL image: size is (h, w), PIL wants
        (w, h); the PIL backend uses BILINEAR by default. Same-size resizes
        short-circuit (the reference's RandomResize always calls F.resize,
        transforms.py:107-108, even when the size is unchanged)."""
        import PIL.Image

        h, w = size
        if (w, h) == img.size:
            return img
        return img.resize((w, h), PIL.Image.BILINEAR)

    tfunc.to_tensor = _to_tensor
    tfunc.normalize = _normalize
    tfunc.hflip = _hflip
    tfunc.resize = _resize
    transforms_mod.functional = tfunc

    class _RandomCrop:
        @staticmethod
        def get_params(img, size):
            import random as _random

            w, h = img.size
            th, tw = size
            return (
                _random.randint(0, max(0, h - th)),
                _random.randint(0, max(0, w - tw)),
                th,
                tw,
            )

    transforms_mod.RandomCrop = _RandomCrop
    transforms_mod.RandomErasing = type("RandomErasing", (), {})

    class _Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class _Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean, self.std = mean, std

        def __call__(self, t):
            return _normalize(t, self.mean, self.std)

    class _ToPILImage:
        def __call__(self, t):
            import numpy as _np
            import PIL.Image

            arr = t.permute(1, 2, 0).clamp(0, 1).numpy()
            return PIL.Image.fromarray((arr * 255).astype(_np.uint8))

    transforms_mod.Compose = _Compose
    transforms_mod.Normalize = _Normalize
    transforms_mod.ToPILImage = _ToPILImage

    tv.ops = ops
    tv.models = models
    tv.transforms = transforms_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.ops.misc"] = misc_mod
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = utils_mod
    sys.modules["torchvision.transforms"] = transforms_mod
    sys.modules["torchvision.transforms.functional"] = tfunc
    return tv
