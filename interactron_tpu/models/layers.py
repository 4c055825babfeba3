"""Small building blocks shared by the backbone and transformers.

Everything stores parameters in float32 and computes in a configurable
`dtype` (bfloat16 on TPU by default); LayerNorm statistics are always fp32.
Modules that mirror frozen (requires_grad=False) reference parameters put
them in the `frozen` variable collection so they are excluded from both the
optimizer and the meta inner loop by construction (utils/meta_utils.py:5-24
walks only requires_grad params; backbone.py:61-63 freezes stem + layer1).
"""

import contextlib
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()
he_normal = nn.initializers.he_normal()
normal02 = nn.initializers.normal(stddev=0.02)

# Express trainable k>1 convs as im2col GEMMs (patch extraction + dot).
# Matters under the vmapped meta step: the adapted conv KERNELS are
# per-episode there, so both the forward and the dW of a lax conv lower to
# batch-grouped convolutions, which the TPU executes far below MXU peak.
# As GEMMs they lower to batched matmuls at any differentiation order.
# Frozen convs (stem+layer1) keep the direct conv: their kernels are never
# per-episode. Toggled from config (MODEL.IM2COL_CONV) at task build.
_USE_IM2COL = False


def set_im2col_conv(enabled: bool):
    global _USE_IM2COL
    _USE_IM2COL = bool(enabled)


@contextlib.contextmanager
def im2col_convs():
    """Trace-time scope: express trainable k>1 convs as im2col GEMMs inside
    this context only. Used around the detector passes whose conv KERNELS
    are per-episode (the adapted fast-weight passes of the meta step):
    there a lax conv lowers to a batch-grouped convolution (~20 TF/s
    profiled at the 19x19x512 shapes) while the im2col batched GEMM rides
    the MXU. Shared-weight passes keep the direct conv — applying im2col
    globally measured 38 vs 91 eps/s (patch HBM traffic dominates when the
    grouped lowering isn't the alternative). Plain differentiable jnp, so
    any AD order is fine."""
    global _USE_IM2COL
    prev = _USE_IM2COL
    _USE_IM2COL = True
    try:
        yield
    finally:
        _USE_IM2COL = prev


# Express per-episode (fast-weight) stride-1 3x3 convs as 9 shifted batched
# GEMMs. Scoped like im2col_convs; see episode_shift_convs().
_USE_SHIFT9 = False


@contextlib.contextmanager
def episode_shift_convs():
    """Trace-time scope: run trainable stride-1 3x3 convs as 9 shifted
    x-slices contracted against w[dy, dx] (a sum of batched GEMMs). Used
    around the detector passes whose conv KERNELS are per-episode (the
    adapted fast-weight passes): there a lax conv lowers to a batch-grouped
    convolution PLUS a physical per-episode weight transpose on the critical
    path (profiled 0.31 ms/block just transposing layer4's (E,3,3,512,512)
    fast kernels in the 1-frame adapted detect). The shifted-GEMM form needs
    no weight transform at all — w[dy, dx] is a contiguous (E, Ci, Co) slice
    — and measured 3.2x faster at the F=1 layer4 shape (0.126 vs 0.404 ms,
    tools/bench_econv.py). Strided 3x3 convs keep the grouped conv (the
    strided x-slices made shift9 ~2.4x slower there). Plain differentiable
    jnp, so any AD order is fine."""
    global _USE_SHIFT9
    prev = _USE_SHIFT9
    _USE_SHIFT9 = True
    try:
        yield
    finally:
        _USE_SHIFT9 = prev


class Conv2d(nn.Module):
    """NHWC conv with torch-style explicit padding and an optional `frozen`
    flag that routes the kernel into the `frozen` collection."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    frozen: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Callable = he_normal
    # Space-to-depth execution for the stem-shaped conv (7x7 stride 2 pad 3):
    # a conv on 3 input channels feeds the MXU a 3-deep contraction (~14
    # TF/s profiled). Rewriting it as a 2x2 space-to-depth followed by a
    # 4x4 stride-1 conv on 12 channels quadruples the contraction depth at
    # identical arithmetic: y[i,j] = sum_{a,b<7} x[2i+a-3, 2j+b-3] w[a,b]
    # re-indexed with a'=2*alpha+p (w zero-padded 7->8 on the leading edge).
    # The parameter layout is unchanged — the repack happens at apply time.
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        shape = (*self.kernel_size, in_features, self.features)
        if self.frozen:
            kernel = self.variable(
                "frozen", "kernel", self.kernel_init, self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0), shape
            ).value
        else:
            kernel = self.param("kernel", self.kernel_init, shape)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        if self.kernel_size == (1, 1) and pad in (0, ((0, 0), (0, 0))):
            # A 1x1 conv IS a matmul. Expressing it as dot matters under the
            # vmapped meta step: the per-episode weight gradient then lowers
            # to a batched GEMM instead of a batch-grouped convolution,
            # which the TPU executes far less efficiently (profiled: the
            # grouped dW convs dominated the predict step's conv time).
            sh, sw = self.strides
            xs = x[:, ::sh, ::sw, :] if (sh, sw) != (1, 1) else x
            y = jnp.dot(
                xs.astype(self.dtype),
                kernel[0, 0].astype(self.dtype),
            )
        elif (
            _USE_SHIFT9
            and not self.frozen
            and self.kernel_size == (3, 3)
            and self.strides == (1, 1)
            and pad == ((self.dilation[0],) * 2, (self.dilation[1],) * 2)
        ):
            # 9 shifted GEMMs; partial sums stay f32 (the direct conv also
            # accumulates f32 internally)
            dh, dw = self.dilation
            hh, ww = x.shape[1], x.shape[2]
            xd = x.astype(self.dtype)
            xp = jnp.pad(xd, ((0, 0), (dh, dh), (dw, dw), (0, 0)))
            kd = kernel.astype(self.dtype)
            acc = None
            for dy in range(3):
                for dx in range(3):
                    xs = xp[:, dy * dh : dy * dh + hh, dx * dw : dx * dw + ww, :]
                    t = jax.lax.dot_general(
                        xs, kd[dy, dx], (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = t if acc is None else acc + t
            y = acc.astype(self.dtype)
        elif _USE_IM2COL and not self.frozen:
            # patches feature order is (C, kh, kw) — verified against the
            # direct conv; kernel transposes to match
            patches = jax.lax.conv_general_dilated_patches(
                x.astype(self.dtype),
                self.kernel_size,
                self.strides,
                pad,
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            kh, kw = self.kernel_size
            w = (
                kernel.astype(self.dtype)
                .transpose(2, 0, 1, 3)
                .reshape(in_features * kh * kw, self.features)
            )
            y = jnp.dot(patches, w)
        elif (
            self.space_to_depth
            and self.kernel_size == (7, 7)
            and self.strides == (2, 2)
            and pad == ((3, 3), (3, 3))
            and self.dilation == (1, 1)
        ):
            n, h, w_in, c = x.shape
            # zero-pad so every 8-wide window starting at an even offset is
            # in-bounds, and the padded extent is even for the 2x2 regroup:
            # left 4 (= kernel pad 3 + the zero row prepended to w), right 4
            xp = jnp.pad(x.astype(self.dtype), ((0, 0), (4, 4), (4, 4), (0, 0)))
            hp, wp = h + 8, w_in + 8
            xs = (
                xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, hp // 2, wp // 2, 4 * c)
            )
            k8 = jnp.pad(kernel.astype(self.dtype), ((1, 0), (1, 0), (0, 0), (0, 0)))
            k4 = (
                k8.reshape(4, 2, 4, 2, c, self.features)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 4 * c, self.features)
            )
            y = jax.lax.conv_general_dilated(
                xs, k4, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[:, : h // 2, : w_in // 2, :]
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=self.strides,
                padding=pad,
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            if self.frozen:
                bias = self.variable(
                    "frozen", "bias", nn.initializers.zeros, jax.random.PRNGKey(0), (self.features,)
                ).value
            else:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params (backbone.py:19-54).

    All four tensors live in the `frozen` collection: they are never trained
    and never adapted, exactly like the reference buffers.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ones = lambda *_: jnp.ones((self.features,), jnp.float32)
        zeros = lambda *_: jnp.zeros((self.features,), jnp.float32)
        w = self.variable("frozen", "weight", ones).value
        b = self.variable("frozen", "bias", zeros).value
        rm = self.variable("frozen", "running_mean", zeros).value
        rv = self.variable("frozen", "running_var", ones).value
        scale = w * jax.lax.rsqrt(rv + 1e-5)
        bias = b - rm * scale
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class Dense(nn.Module):
    """Linear layer with fp32 params, configurable compute dtype."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32, cast back to input dtype."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (y * scale + bias).astype(dtype)


class MLP(nn.Module):
    """DETR's simple FFN head: n-1 ReLU layers + linear out
    (detr_models/detr.py:299-311)."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = Dense(self.hidden_dim, dtype=self.dtype, name=f"layer{i}")(x)
            x = nn.relu(x)
        return Dense(self.out_dim, dtype=self.dtype, name=f"layer{self.num_layers - 1}")(x)


class _ProjParams(nn.Module):
    """Parameter holder matching Dense's tree ({kernel, bias}) so MHA can
    merge aliased projections into one GEMM without changing checkpoints."""

    features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self, in_features):
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Torch-style MHA: separate q/k/v/out projections with bias, softmax in
    fp32, optional key padding mask and attention dropout."""

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, q, k, v, *, key_padding_mask=None, deterministic=True):
        from interactron_tpu.ops.attention import packed_attention

        d = self.embed_dim
        h = self.num_heads

        # Params stay under the torch-layout names (q_proj/k_proj/v_proj,
        # kernel+bias each) but the GEMMs merge when inputs alias: the GPT
        # fusion passes one tensor for q/k/v (3 projections -> 1 GEMM) and
        # the DETR layers share q = k (+pos). Column blocks of the merged
        # product are bitwise the separate products.
        wq, bq_ = _ProjParams(d, self.kernel_init, name="q_proj")(q.shape[-1])
        wk, bk_ = _ProjParams(d, self.kernel_init, name="k_proj")(k.shape[-1])
        wv, bv_ = _ProjParams(d, self.kernel_init, name="v_proj")(v.shape[-1])
        dt = self.dtype
        lin = lambda x, w, b: jnp.dot(x.astype(dt), w.astype(dt)) + b.astype(dt)
        if q is k and k is v:
            qkv = lin(q, jnp.concatenate([wq, wk, wv], axis=1),
                      jnp.concatenate([bq_, bk_, bv_]))
            qh, kh, vh = jnp.split(qkv, 3, axis=-1)
        elif q is k:
            qk = lin(q, jnp.concatenate([wq, wk], axis=1),
                     jnp.concatenate([bq_, bk_]))
            qh, kh = jnp.split(qk, 2, axis=-1)
            vh = lin(v, wv, bv_)
        elif k is v:
            # query-pruned last fusion block: q is a slice of the k/v tensor
            kv = lin(k, jnp.concatenate([wk, wv], axis=1),
                     jnp.concatenate([bk_, bv_]))
            kh, vh = jnp.split(kv, 2, axis=-1)
            qh = lin(q, wq, bq_)
        else:
            qh = lin(q, wq, bq_)
            kh = lin(k, wk, bk_)
            vh = lin(v, wv, bv_)
        rng = self.make_rng("dropout") if (self.dropout_rate > 0 and not deterministic) else None
        out = packed_attention(
            qh,
            kh,
            vh,
            h,
            key_padding_mask=key_padding_mask,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dropout_rng=rng,
        )
        return Dense(d, dtype=self.dtype, kernel_init=self.kernel_init, name="out_proj")(out)


# Rematerialized dropout application: without TRAINER.REMAT the train step
# saves every dropout mask as an autodiff residual (profiled ~16 ms/step of
# (5,8,361,361) DETR attention-mask writes+reads at inner_batch=4). Wrapping
# just the mask-apply in jax.checkpoint makes the residual the (already-live)
# input tensor + the PRNG key; the backward regenerates the mask — cheap with
# the hardware RNG (MODEL.PRNG_IMPL=rbg). jax.checkpoint composes under
# repeated differentiation, so the twice-differentiated inner pass is fine.
# Toggled from config (MODEL.REMAT_DROPOUT) at task build.
_REMAT_DROPOUT = True


def set_remat_dropout(enabled: bool):
    global _REMAT_DROPOUT
    _REMAT_DROPOUT = bool(enabled)


def _dropout_mask_apply(x, rng, rate, out_dtype):
    # integer-threshold keep mask on raw RNG bits (P(keep) = 1 - rate,
    # exact to 2^-32): bernoulli() goes bits -> f32 uniform -> compare,
    # and those convert passes showed up at ~9 ms/step in the train
    # profile. Same trick as the flash kernels' _keep_mask.
    keep = 1.0 - rate
    thresh = jnp.uint32(min(int(round(rate * 4294967296.0)), 4294967295))
    bits = jax.random.bits(rng, x.shape, jnp.uint32)
    return jnp.where(bits >= thresh, x / keep, 0.0).astype(out_dtype)


_dropout_mask_apply_ckpt = jax.checkpoint(_dropout_mask_apply, static_argnums=(2, 3))


def dropout_apply(x, rng, rate, out_dtype=None):
    """Apply inverted dropout; identical values either side of the remat
    switch (the checkpoint only changes WHERE the mask is computed)."""
    out_dtype = x.dtype if out_dtype is None else out_dtype
    fn = _dropout_mask_apply_ckpt if _REMAT_DROPOUT else _dropout_mask_apply
    return fn(x, rng, float(rate), out_dtype)


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.rate == 0.0 or deterministic:
            return x
        return dropout_apply(x, self.make_rng("dropout"), self.rate)
