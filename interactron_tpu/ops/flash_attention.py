"""Pallas TPU fused attention with custom VJP for the fusion transformer.

The fusion GPT attends over T=2060 tokens with head_dim 64: the XLA fallback
materializes the (B, H, T, T) probability tensor in HBM (~1 GB at B=8 in
fp32), making the op HBM-bandwidth bound both forward AND backward — and the
meta inner loop (grad of the learned loss, interactron.py:99) differentiates
through this attention, so the backward pass is on the hot path too.

Design (sizes are small enough that full K/V fit VMEM, so no online-softmax
streaming is needed):
  forward: per (batch*head, q_block): load K/V (~0.5 MB each at T<=2176),
    fp32 logits + softmax in VMEM, write O block and the softmax
    log-normalizer L (for the backward recomputation).
  backward: two kernels —
    dQ: per (bh, q_block): recompute P from (Q_blk, K, L_blk);
        dS = P*(dO@V^T - D); dQ = scale * dS @ K.
    dK/dV: per (bh, k_block): recompute P^T from (K_blk, Q, L);
        dV = P^T @ dO; dS^T = P^T*(V_blk@dO^T - D^T); dK = scale * dS^T @ Q.
  D = rowsum(dO * O) is a cheap jnp reduction outside the kernels.

Sequence lengths are static at trace time, so padding masks are compile-time
index comparisons. Full bidirectional attention (the fusion GPT's all-ones
mask, gpt.py:35-36).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
_NEG = -1e30  # python literal: jnp constants would be captured by the kernel


def _mask_cols(logits, t_real):
    t_pad = logits.shape[-1]
    if t_pad != t_real:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < t_real, logits, _NEG)
    return logits


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, t_real, scale):
    # keep inputs in their storage dtype (bf16 on the hot path): the MXU
    # accumulates in fp32 via preferred_element_type, and skipping the fp32
    # VMEM copies keeps the 256-row blocks inside the VMEM budget
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = _mask_cols(logits, t_real)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = (
        jax.lax.dot_general((p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ).astype(o_ref.dtype)
    l_ref[0, :, 0] = (m + jnp.log(denom))[:, 0]


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dq_ref, *, t_real, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    L = l_ref[0]  # (BQ, 1)
    D = d_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = _mask_cols(logits, t_real)
    p = jnp.exp(logits - L)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - D)).astype(k.dtype)
    dq_ref[0] = (
        jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dk_ref, dv_ref, *, t_real, scale):
    # this program owns one K/V block; iterate over all queries at once
    q = q_ref[0]                            # (T_pad, hd)
    k = k_ref[0]                            # (BQ, hd)
    v = v_ref[0]
    do = do_ref[0]                          # (T_pad, hd)
    L = l_ref[0]                            # (T_pad, 1)
    D = d_ref[0]
    logits_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                               # (BQ, T_pad) == S^T block
    # mask padded QUERY columns so exp(-L) with L=0 padding cannot pollute
    t_pad = logits_t.shape[-1]
    if t_pad != t_real:
        col = jax.lax.broadcasted_iota(jnp.int32, logits_t.shape, 1)
        logits_t = jnp.where(col < t_real, logits_t, _NEG)
    p_t = jnp.exp(logits_t - L[:, 0][None, :])  # (BQ, T_pad); L col-bcast over k rows
    dv_ref[0] = jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (BQ, T_pad)
    ds_t = (p_t * (dp_t - D[:, 0][None, :])).astype(q.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(ds_t, q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    ).astype(dk_ref.dtype)


def _pad_len(t):
    return -(-t // BLOCK_Q) * BLOCK_Q


def _flatten_pad(x, t_pad):
    b, h, t, d = x.shape
    x = x.reshape(b * h, t, d)
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    return x


MIN_D = 64


def _pad_d(x):
    d = x.shape[-1]
    if d >= MIN_D:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, MIN_D - d)))


def _fwd_impl(q, k, v):
    # zero-pad small head dims to the MXU-friendly minimum: padded channels
    # contribute zero to q.k^T, so results are exact
    d0 = q.shape[-1]
    scale = 1.0 / (d0 ** 0.5)
    q, k, v = _pad_d(q), _pad_d(k), _pad_d(v)
    b, h, t, d = q.shape
    s = k.shape[2]
    t_pad = _pad_len(t)
    s_pad = _pad_len(s)
    qf = _flatten_pad(q, t_pad)
    kf = _flatten_pad(k, s_pad)
    vf = _flatten_pad(v, s_pad)
    grid = (b * h, t_pad // BLOCK_Q)
    o, L = pl.pallas_call(
        functools.partial(_fwd_kernel, t_real=s, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf)
    return o, L


@jax.custom_vjp
def flash_attention(q, k, v):
    """q, k, v: (B, H, T, D) -> (B, H, T, D)."""
    o, _ = _fwd_impl(q, k, v)
    b, h, t, d = q.shape
    return o[:, :t, :d].reshape(b, h, t, d)


def _fa_fwd(q, k, v):
    o, L = _fwd_impl(q, k, v)
    b, h, t, d = q.shape
    return o[:, :t, :d].reshape(b, h, t, d), (q, k, v, o, L)


def _fa_bwd(res, g):
    q, k, v, o_pad, L = res
    b, h, t, d0 = q.shape
    s = k.shape[2]
    scale = 1.0 / (d0 ** 0.5)
    q, k, v, g = _pad_d(q), _pad_d(k), _pad_d(v), _pad_d(g)
    d = q.shape[-1]
    t_pad = _pad_len(t)
    s_pad = _pad_len(s)
    qf = _flatten_pad(q, t_pad)
    kf = _flatten_pad(k, s_pad)
    vf = _flatten_pad(v, s_pad)
    gf = _flatten_pad(g, t_pad)
    D = jnp.sum(gf.astype(jnp.float32) * o_pad.astype(jnp.float32), axis=-1)[..., None]  # (bh, t_pad, 1)

    grid_q = (b * h, t_pad // BLOCK_Q)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, t_real=s, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
    )(qf, kf, vf, gf, L, D)

    grid_k = (b * h, s_pad // BLOCK_Q)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, t_real=t, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),    # q full
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),  # k blk
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),  # v blk
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),    # do full
            pl.BlockSpec((1, t_pad, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),    # L full
            pl.BlockSpec((1, t_pad, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),    # D full
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf, gf, L, D)

    dq = dq[:, :t, :d0].reshape(b, h, t, d0)
    dk = dk[:, :s, :d0].reshape(b, h, s, d0)
    dv = dv[:, :s, :d0].reshape(b, h, s, d0)
    return dq, dk, dv


flash_attention.defvjp(_fa_fwd, _fa_bwd)
