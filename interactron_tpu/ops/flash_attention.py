"""Pallas TPU fused attention with custom VJP and in-kernel dropout.

The fusion GPT attends over T=2060 tokens with head_dim 64. The XLA fallback
materializes the (B, H, T, T) probability tensor in HBM (~1 GB in fp32 at
B=8) — and the meta inner loop differentiates through this attention twice
(second order), so during TRAINING those buffers dominate both time and HBM
(inner_batch=8 OOMs a 16 GB chip outright). This kernel keeps logits/softmax
in VMEM and implements the reference's attention-probability dropout
(gpt.py:51) with the on-chip PRNG: the forward seeds a counter-based stream
per (batch*head, q_block) program and the backward REGENERATES the same mask
instead of storing it.

Layout (full K/V fit VMEM at these sizes — no online-softmax streaming):
  forward: per (bh, q_block): fp32 logits + softmax, dropout mask, write O
    and the log-normalizer L.
  backward dQ: per (bh, q_block): recompute P and the mask;
    dS = P * (keep/(1-r) * (dO V^T) - D); dQ = scale * dS @ K. The standard
    D = rowsum(dO*O) identity still holds under prob-dropout.
  backward dK/dV: per (bh, k_block): loop over q_blocks (regenerating each
    q-block's mask stream), accumulate dV += Pdrop^T dO and
    dK += scale * (P*(keep/(1-r)*(V dO^T) - D))^T Q.

Head dims < 64 are zero-padded to the MXU-friendly minimum (exact: padded
channels contribute zero to qk^T). Sequence padding masks are compile-time
index comparisons. No jnp module-level constants (they would be captured by
the kernels and fetched per-lowering through the axon tunnel).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
MIN_D = 64
_NEG = -1e30


def _block_q(t):
    """Row-block size: 256 for the fusion-sized problems, 128 for the DETR
    encoder/decoder (T<=512) where a 256 block would mostly be padding."""
    return BLOCK_Q if t > 512 else 128


def _mask_cols(logits, real):
    pad = logits.shape[-1]
    if pad != real:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < real, logits, _NEG)
    return logits


def _keep_mask(seed_val, i, jq, jk, shape, rate):
    """Counter-based dropout keep-mask for the (q_block jq, k_block jk) tile
    of head-batch i: the same (seed, i, jq, jk) always regenerates the same
    bits, so the backward kernels rebuild the exact forward mask without
    storing it."""
    pltpu.prng_seed(seed_val + (i * 4096 + jq) * 64 + jk)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = min(int(rate * 4294967296.0), 4294967295)
    return bits >= jnp.uint32(threshold)


def _keep_mask_row(seed_val, i, jq, n_k_blocks, bk, rows, rate):
    """Full (rows, n_k_blocks*bk) keep mask for one q block, assembled from
    per-(jq, jk) tiles (static concat — Pallas TC has no dynamic_slice)."""
    tiles = [
        _keep_mask(seed_val, i, jq, jk, (rows, bk), rate)
        for jk in range(n_k_blocks)
    ]
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=1)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, l_ref, *, s_real, scale, rate,
                n_k_blocks):
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = _mask_cols(logits, s_real)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    if rate > 0.0:
        bk = p.shape[1] // n_k_blocks
        keep = _keep_mask_row(seed_ref[0], i, j, n_k_blocks, bk, p.shape[0], rate)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)
    l_ref[0, :, 0] = (m + jnp.log(denom))[:, 0]


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dq_ref, *,
               s_real, scale, rate, n_k_blocks):
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    L = l_ref[0]  # (BQ, 1)
    D = d_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = _mask_cols(logits, s_real)
    p = jnp.exp(logits - L)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        bk = p.shape[1] // n_k_blocks
        keep = _keep_mask_row(seed_ref[0], i, j, n_k_blocks, bk, p.shape[0], rate)
        dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
    ds = (p * (dp - D)).astype(k.dtype)
    dq_ref[0] = (
        jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dk_ref, dv_ref, *,
                t_real, scale, rate, n_q_blocks, bq):
    i = pl.program_id(0)
    jk = pl.program_id(1)
    k = k_ref[0]   # (BK, d)
    v = v_ref[0]
    bk, d = k.shape
    dv_acc = jnp.zeros((bk, d), jnp.float32)
    dk_acc = jnp.zeros((bk, d), jnp.float32)
    s_pad_total = pl.num_programs(1) * bk
    # loop over query blocks in q-major orientation (p is (BQ, BK), the same
    # layout as the forward's mask tile — no boolean transposes for Mosaic)
    for jq in range(n_q_blocks):
        q = q_ref[0, pl.ds(jq * bq, bq), :]                # (BQ, d)
        do = do_ref[0, pl.ds(jq * bq, bq), :]
        L = l_ref[0, pl.ds(jq * bq, bq), :]                # (BQ, 1)
        D = d_ref[0, pl.ds(jq * bq, bq), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                          # (BQ, BK)
        # mask padded QUERY rows
        q_low = jq * bq
        if q_low + bq > t_real:
            row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + q_low
            logits = jnp.where(row < t_real, logits, _NEG)
        p = jnp.exp(logits - L)                            # (BQ, BK)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (BQ, BK)
        if rate > 0.0:
            # regenerate exactly this (jq, jk) tile of the fwd mask
            keep = _keep_mask(seed_ref[0], i, jq, jk, (bq, bk), rate)
            p_drop = jnp.where(keep, p / (1.0 - rate), 0.0)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        else:
            p_drop = p
        # dV += Pdrop^T @ dO, dK += dS^T @ Q: transposes via contraction dims
        dv_acc += jax.lax.dot_general(
            p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - D)).astype(q.dtype)                # (BQ, BK)
        dk_acc += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _pad_len(t, bq=BLOCK_Q):
    return -(-t // bq) * bq


def _pad_d(x):
    d = x.shape[-1]
    if d >= MIN_D:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, MIN_D - d)))


def _flatten_pad(x, t_pad):
    b, h, t, d = x.shape
    x = x.reshape(b * h, t, d)
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    return x


def _fwd_impl(q, k, v, seed, rate):
    d0 = q.shape[-1]
    scale = 1.0 / (d0 ** 0.5)
    q, k, v = _pad_d(q), _pad_d(k), _pad_d(v)
    b, h, t, d = q.shape
    s = k.shape[2]
    bq = _block_q(max(t, s))
    t_pad = _pad_len(t, bq)
    s_pad = _pad_len(s, bq)
    qf = _flatten_pad(q, t_pad)
    kf = _flatten_pad(k, s_pad)
    vf = _flatten_pad(v, s_pad)
    grid = (b * h, t_pad // bq)
    o, L = pl.pallas_call(
        functools.partial(_fwd_kernel, s_real=s, scale=scale, rate=rate,
                          n_k_blocks=s_pad // bq),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
    )(seed, qf, kf, vf)
    return o, L


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash(q, k, v, seed, rate):
    o, _ = _fwd_impl(q, k, v, seed, rate)
    b, h, t, d = q.shape
    return o[:, :t, :d].reshape(b, h, t, d)


def _flash_fwd(q, k, v, seed, rate):
    o, L = _fwd_impl(q, k, v, seed, rate)
    b, h, t, d = q.shape
    return o[:, :t, :d].reshape(b, h, t, d), (q, k, v, seed, o, L)


def _flash_bwd(rate, res, g):
    q, k, v, seed, o_pad, L = res
    b, h, t, d0 = q.shape
    s = k.shape[2]
    scale = 1.0 / (d0 ** 0.5)
    q, k, v, g = _pad_d(q), _pad_d(k), _pad_d(v), _pad_d(g)
    d = q.shape[-1]
    bq = _block_q(max(t, s))
    t_pad = _pad_len(t, bq)
    s_pad = _pad_len(s, bq)
    qf = _flatten_pad(q, t_pad)
    kf = _flatten_pad(k, s_pad)
    vf = _flatten_pad(v, s_pad)
    gf = _flatten_pad(g, t_pad)
    D = jnp.sum(gf.astype(jnp.float32) * o_pad.astype(jnp.float32), axis=-1)[..., None]

    grid_q = (b * h, t_pad // bq)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, s_real=s, scale=scale, rate=rate,
                          n_k_blocks=s_pad // bq),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
    )(seed, qf, kf, vf, gf, L, D)

    grid_k = (b * h, s_pad // bq)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, t_real=t, scale=scale, rate=rate,
            n_q_blocks=t_pad // bq, bq=bq,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
    )(seed, qf, kf, vf, gf, L, D)

    dq = dq[:, :t, :d0].reshape(b, h, t, d0)
    dk = dk[:, :s, :d0].reshape(b, h, s, d0)
    dv = dv[:, :s, :d0].reshape(b, h, s, d0)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, dropout_rate=0.0, dropout_rng=None):
    """q, k, v: (B, H, T/S, D) -> (B, H, T, D). Full bidirectional attention
    (the fusion GPT's all-ones mask, gpt.py:35-36) with optional in-kernel
    attention-probability dropout (mask regenerated in the backward)."""
    if dropout_rate > 0.0 and dropout_rng is not None:
        seed = jax.random.randint(dropout_rng, (1,), 0, 2**31 - 1, jnp.int32)
        rate = float(dropout_rate)
    else:
        seed = jnp.zeros((1,), jnp.int32)
        rate = 0.0
    return _flash(q, k, v, seed, rate)
