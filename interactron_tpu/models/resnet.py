"""ResNet-50-DC5 backbone in Flax, matching the reference's torchvision
backbone semantics (detr_models/backbone.py:82-92):

  * `replace_stride_with_dilation=[False, False, True]`: layer4 keeps
    stride 1 and dilates its 3x3 convs by 2 -> output stride 16, a 19x19
    feature map at 300x300 input.
  * FrozenBatchNorm everywhere (backbone.py:19-54).
  * stem + layer1 parameters are frozen (backbone.py:61-63 freezes all
    params whose names lack layer2/3/4) — realized here by routing those
    kernels into the `frozen` variable collection, so the optimizer and the
    meta inner loop see only trainable weights.

Weights convert 1:1 from torchvision/DETR checkpoints (tools/convert_weights.py).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from interactron_tpu.models.layers import Conv2d, FrozenBatchNorm


def _max_pool_3x3_s2p1(x):
    """3x3/s2/p1 max pool as two separable passes of strided-slice maxima.

    `reduce_window` reads every input element 9x from HBM (profiled 0.677
    ms/iter at an effective 99 GB/s useful bandwidth in the predict step);
    row-then-column decomposition of the max reads each element ~1.5x per
    pass. Each pass is shift-max (y[j] = max(x[j], x[j+1]), contiguous
    slices) followed by a reshape pair-max (out[i] = max(y[2i], y[2i+1]) =
    the 3-window max) — stride-2 SLICES must not appear anywhere, they
    lower to gathers (profiled +0.6 ms/iter, worse than reduce_window).
    Padding uses -inf, matching reduce_window's identity padding bit-exactly
    (tests/test_torch_parity.py covers the stem output)."""
    n, h, w, c = x.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)

    def pool_axis(t, axis, size):
        # pad so the shift-max y comes out at EXACTLY 2*size rows: a
        # trailing trim slice materializes a copy (profiled 0.69 ms/iter),
        # while the padded chain fuses into one pass and the (size, 2)
        # reshape is a bitcast. Even extents never use a right pad (the
        # last 3-window ends at the last row); odd extents need one.
        pad = [(0, 0)] * 4
        pad[axis] = (1, 2 * size - t.shape[axis])
        tp = jnp.pad(t, pad, constant_values=neg)
        lo = [slice(None)] * 4
        hi = [slice(None)] * 4
        lo[axis] = slice(0, tp.shape[axis] - 1)
        hi[axis] = slice(1, tp.shape[axis])
        y = jnp.maximum(tp[tuple(lo)], tp[tuple(hi)])
        shp = list(y.shape)
        shp[axis : axis + 1] = [size, 2]
        return jnp.max(y.reshape(shp), axis=axis + 1)

    ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    return pool_axis(pool_axis(x, 1, ho), 2, wo)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, p, d, name: Conv2d(
            f, (k, k), (s, s), p, (d, d), frozen=self.frozen, dtype=self.dtype, name=name
        )
        out = conv(self.planes, 1, 1, 0, 1, "conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, self.stride, self.dilation, self.dilation, "conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, 1, 0, 1, "conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = conv(self.planes * 4, 1, self.stride, 0, 1, "downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class ResNet50DC5(nn.Module):
    """Returns the C5 feature map: (B, 19, 19, 2048) for 300x300 inputs.

    `stage` splits the network at its frozen/trainable boundary
    (backbone.py:61-63): "prefix" runs only the frozen stem+layer1 (pure
    function of the input — the meta loop computes it once per episode and
    reuses it across the pre-adaptive/adapted passes), "trunk" resumes from
    layer2 given prefix features, "all" is the full network.
    """

    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, stage="all"):
        assert stage in ("all", "prefix", "trunk")

        def layer(x, planes, blocks, stride, dilation, frozen, name):
            # torchvision _make_layer: first block carries stride+downsample
            # with the PREVIOUS dilation; later blocks use the new dilation.
            # remat: keep only block boundaries for the backward pass (the
            # frozen stage carries no grads, so remat there buys nothing)
            Bot = nn.remat(Bottleneck) if (self.remat and not frozen) else Bottleneck
            first_dilation = 1
            x = Bot(
                planes,
                stride=stride,
                dilation=first_dilation,
                downsample=True,
                frozen=frozen,
                dtype=self.dtype,
                name=f"{name}_block0",
            )(x)
            for i in range(1, blocks):
                x = Bot(
                    planes,
                    dilation=dilation,
                    frozen=frozen,
                    dtype=self.dtype,
                    name=f"{name}_block{i}",
                )(x)
            return x

        if stage in ("all", "prefix"):
            # frozen stem + layer1
            # NOTE: Conv2d(space_to_depth=True) exists for this conv (the
            # 3-channel contraction runs at ~14 TF/s) but measured 9% SLOWER
            # end-to-end on chip (89.0 vs 98.3 eps/s predict, round 3): the
            # 2x2 regroup transpose costs more than the deeper contraction
            # saves. Direct conv stays the production path.
            x = Conv2d(64, (7, 7), (2, 2), 3, frozen=True, dtype=self.dtype, name="conv1")(x)
            x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
            x = _max_pool_3x3_s2p1(x)
            x = layer(x, 64, 3, 1, 1, True, "layer1")
            if stage == "prefix":
                return x
        x = layer(x, 128, 4, 2, 1, False, "layer2")
        x = layer(x, 256, 6, 2, 1, False, "layer3")
        # DC5: stride->1, dilation 2 on the 3x3s of blocks 1..n-1
        x = layer(x, 512, 3, 1, 2, False, "layer4")
        return x
