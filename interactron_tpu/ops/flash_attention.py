"""Pallas TPU fused attention with custom VJP and in-kernel dropout.

The fusion GPT attends over T=2060 tokens with head_dim 64. The XLA fallback
materializes the (B, H, T, T) probability tensor in HBM (~1 GB in fp32 at
B=8) — and the meta inner loop differentiates through this attention twice
(second order), so during TRAINING those buffers dominate both time and HBM
(inner_batch=8 OOMs a 16 GB chip outright). This kernel keeps logits/softmax
in VMEM and implements the reference's attention-probability dropout
(gpt.py:51) with the on-chip PRNG: the forward seeds a counter-based stream
per (head, q_block) program and the backward REGENERATES the same mask
instead of storing it.

PACKED-HEAD LAYOUT: the kernels read q/k/v in the dense (B, T, H*D) layout
the projection GEMMs produce, processing a GROUP of 128//D heads per grid
program (lane-dim slices of one 128-lane block). This kills both the
(B,T,H,D)->(B,H,T,D) transposes around the kernel and the 2x lane-padding
DMA waste of a 64-lane last dimension — ~7 ms/step of pure layout traffic
in the profiled predict step — and head_dim 32 (DETR) packs 4 heads per
program with no zero-padding at all.

Per-head math (full K/V fit VMEM at these sizes — no online-softmax
streaming):
  forward: per (bh-group, q_block), per head in group: fp32 logits +
    softmax, dropout mask, write O columns and the log-normalizer L.
  backward dQ: recompute P and the mask; dS = P * (keep/(1-r) * (dO V^T)
    - D); dQ = scale * dS @ K. The standard D = rowsum(dO*O) identity
    holds under prob-dropout.
  backward dK/dV: per (bh-group, k_block): loop over q_blocks (regenerating
    each q-block's mask stream), accumulate dV += Pdrop^T dO and
    dK += scale * (P*(keep/(1-r)*(V dO^T) - D))^T Q.

Sequence padding masks are compile-time index comparisons. No jnp
module-level constants (they would be captured by the kernels and fetched
per-lowering through the axon tunnel).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
_NEG = -1e30


def _block_q(t):
    """Row-block size: 256 for the fusion-sized problems (measured equal to
    128-blocks' 11%-smaller padded area — the deeper pipeline wins it back),
    128 for T<=512 where a 256 block would mostly be padding."""
    return BLOCK_Q if t > 512 else 128


def _group(h, hd):
    """Heads per grid program: pack heads until the lane dim reaches 128."""
    g = max(1, 128 // hd)
    g = min(g, h)
    while h % g:
        g -= 1
    return g


def _mask_cols(logits, real):
    pad = logits.shape[-1]
    if pad != real:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < real, logits, _NEG)
    return logits


def _keep_mask(seed_val, ih, jq, jk, shape, rate):
    """Counter-based dropout keep-mask for the (q_block jq, k_block jk) tile
    of head ih: the same (seed, ih, jq, jk) always regenerates the same
    bits, so the backward kernels rebuild the exact forward mask without
    storing it."""
    pltpu.prng_seed(seed_val + (ih * 4096 + jq) * 64 + jk)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = min(int(rate * 4294967296.0), 4294967295)
    return bits >= jnp.uint32(threshold)


def _keep_mask_row(seed_val, ih, jq, n_k_blocks, bk, rows, rate):
    """Full (rows, n_k_blocks*bk) keep mask for one q block, assembled from
    per-(jq, jk) tiles (static concat — Pallas TC has no dynamic_slice)."""
    tiles = [
        _keep_mask(seed_val, ih, jq, jk, (rows, bk), rate)
        for jk in range(n_k_blocks)
    ]
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=1)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, l_ref, *, s_real, scale,
                rate, n_k_blocks, hd, g_sz):
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]   # (BQ, g_sz*hd)
    k = k_ref[0]   # (S_pad, g_sz*hd)
    v = v_ref[0]
    outs = []
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = _mask_cols(logits, s_real)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = p / denom
        if rate > 0.0:
            bk = p.shape[1] // n_k_blocks
            keep = _keep_mask_row(seed_ref[0, 0], i * g_sz + g, j, n_k_blocks,
                                  bk, p.shape[0], rate)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        l_ref[0, g, :, 0] = (m + jnp.log(denom))[:, 0]
    o = outs[0] if g_sz == 1 else jnp.concatenate(outs, axis=1)
    o_ref[0] = o.astype(o_ref.dtype)


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dq_ref, *,
               s_real, scale, rate, n_k_blocks, hd, g_sz):
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    dqs = []
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        L = l_ref[0, g]   # (BQ, 1)
        D = d_ref[0, g]
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = _mask_cols(logits, s_real)
        p = jnp.exp(logits - L)
        dp = jax.lax.dot_general(do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            bk = p.shape[1] // n_k_blocks
            keep = _keep_mask_row(seed_ref[0, 0], i * g_sz + g, j, n_k_blocks,
                                  bk, p.shape[0], rate)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        ds = (p * (dp - D)).astype(k.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)
    dq = dqs[0] if g_sz == 1 else jnp.concatenate(dqs, axis=1)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dk_ref,
                dv_ref, *, t_real, scale, rate, n_q_blocks, bq, hd, g_sz):
    i = pl.program_id(0)
    jk = pl.program_id(1)
    k = k_ref[0]   # (BK, g_sz*hd)
    v = v_ref[0]
    bk = k.shape[0]
    dks = []
    dvs = []
    # loop over query blocks in q-major orientation (p is (BQ, BK), the same
    # layout as the forward's mask tile — no boolean transposes for Mosaic)
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        kg = k[:, sl]
        vg = v[:, sl]
        dv_acc = jnp.zeros((bk, hd), jnp.float32)
        dk_acc = jnp.zeros((bk, hd), jnp.float32)
        for jq in range(n_q_blocks):
            qg = q_ref[0, pl.ds(jq * bq, bq), sl]          # (BQ, hd)
            dog = do_ref[0, pl.ds(jq * bq, bq), sl]
            L = l_ref[0, g, pl.ds(jq * bq, bq), :]         # (BQ, 1)
            D = d_ref[0, g, pl.ds(jq * bq, bq), :]
            logits = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                      # (BQ, BK)
            # mask padded QUERY rows
            q_low = jq * bq
            if q_low + bq > t_real:
                row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + q_low
                logits = jnp.where(row < t_real, logits, _NEG)
            p = jnp.exp(logits - L)                        # (BQ, BK)
            dp = jax.lax.dot_general(dog, vg, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if rate > 0.0:
                # regenerate exactly this (jq, jk) tile of the fwd mask
                keep = _keep_mask(seed_ref[0, 0], i * g_sz + g, jq, jk, (bq, bk), rate)
                p_drop = jnp.where(keep, p / (1.0 - rate), 0.0)
                dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
            else:
                p_drop = p
            # dV += Pdrop^T @ dO, dK += dS^T @ Q: transposes via contraction dims
            dv_acc += jax.lax.dot_general(
                p_drop.astype(dog.dtype), dog, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - D)).astype(qg.dtype)           # (BQ, BK)
            dk_acc += jax.lax.dot_general(
                ds, qg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
        dks.append(dk_acc)
        dvs.append(dv_acc)
    dk = dks[0] if g_sz == 1 else jnp.concatenate(dks, axis=1)
    dv = dvs[0] if g_sz == 1 else jnp.concatenate(dvs, axis=1)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_len(t, bq=BLOCK_Q):
    return -(-t // bq) * bq


def _pad_t(x, t_pad):
    t = x.shape[1]
    if t_pad == t:
        return x
    return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))


def _fwd_impl(q, k, v, seed, rate, h):
    b, t, dim = q.shape
    s = k.shape[1]
    hd = dim // h
    scale = 1.0 / (hd ** 0.5)
    g_sz = _group(h, hd)
    ng = h // g_sz
    lanes = g_sz * hd
    bq = _block_q(max(t, s))
    t_pad = _pad_len(t, bq)
    s_pad = _pad_len(s, bq)
    qf = _pad_t(q, t_pad)
    kf = _pad_t(k, s_pad)
    vf = _pad_t(v, s_pad)
    grid = (b * ng, t_pad // bq)
    o, L = pl.pallas_call(
        functools.partial(_fwd_kernel, s_real=s, scale=scale, rate=rate,
                          n_k_blocks=s_pad // bq, hd=hd, g_sz=g_sz),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, dim), q.dtype),
            jax.ShapeDtypeStruct((b * ng, g_sz, t_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_sz, bq, 1), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(seed, qf, kf, vf)
    return o, L


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, seed, rate, h):
    o, _ = _fwd_impl(q, k, v, seed, rate, h)
    return o[:, : q.shape[1]]


def _flash_fwd(q, k, v, seed, rate, h):
    o, L = _fwd_impl(q, k, v, seed, rate, h)
    return o[:, : q.shape[1]], (q, k, v, seed, o, L)


def _flash_bwd(rate, h, res, g):
    q, k, v, seed, o_pad, L = res
    b, t, dim = q.shape
    s = k.shape[1]
    hd = dim // h
    scale = 1.0 / (hd ** 0.5)
    g_sz = _group(h, hd)
    ng = h // g_sz
    lanes = g_sz * hd
    bq = _block_q(max(t, s))
    t_pad = _pad_len(t, bq)
    s_pad = _pad_len(s, bq)
    qf = _pad_t(q, t_pad)
    kf = _pad_t(k, s_pad)
    vf = _pad_t(v, s_pad)
    gf = _pad_t(g, t_pad)
    # D = rowsum(dO * O) per head: (b, t_pad, h) -> (b*ng, g_sz, t_pad, 1)
    d_bth = jnp.sum(
        gf.astype(jnp.float32).reshape(b, t_pad, h, hd)
        * o_pad.astype(jnp.float32).reshape(b, t_pad, h, hd),
        axis=-1,
    )
    D = d_bth.transpose(0, 2, 1).reshape(b * ng, g_sz, t_pad, 1)

    grid_q = (b * ng, t_pad // bq)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, s_real=s, scale=scale, rate=rate,
                          n_k_blocks=s_pad // bq, hd=hd, g_sz=g_sz),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, dim), q.dtype),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_sz, bq, 1), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_sz, bq, 1), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                               memory_space=pltpu.VMEM),
    )(seed, qf, kf, vf, gf, L, D)

    grid_k = (b * ng, s_pad // bq)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, t_real=t, scale=scale, rate=rate,
            n_q_blocks=t_pad // bq, bq=bq, hd=hd, g_sz=g_sz,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_pad, dim), q.dtype),
            jax.ShapeDtypeStruct((b, s_pad, dim), q.dtype),
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_pad, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_sz, t_pad, 1), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_sz, t_pad, 1), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                         memory_space=pltpu.VMEM),
        ),
    )(seed, qf, kf, vf, gf, L, D)

    return dq[:, :t], dk[:, :s], dv[:, :s], None


_flash.defvjp(_flash_fwd, _flash_bwd)


def _seed_rate(dropout_rate, dropout_rng):
    # (1, 1) so that a vmapped (per-episode) seed batches to (B, 1, 1) —
    # the Mosaic block-mapping check requires the last two dims of a
    # batched SMEM operand to equal the array dims
    if dropout_rate > 0.0 and dropout_rng is not None:
        seed = jax.random.randint(dropout_rng, (1, 1), 0, 2**31 - 1, jnp.int32)
        return seed, float(dropout_rate)
    return jnp.zeros((1, 1), jnp.int32), 0.0


def flash_attention_bthd(q, k, v, num_heads, dropout_rate=0.0, dropout_rng=None):
    """Packed-head entry: q (B, T, H*D), k/v (B, S, H*D) -> (B, T, H*D).

    This is the layout the q/k/v projection GEMMs produce, so callers need
    no head transposes at all. Full bidirectional attention (the fusion
    GPT's all-ones mask, gpt.py:35-36) with optional in-kernel
    attention-probability dropout (mask regenerated in the backward)."""
    seed, rate = _seed_rate(dropout_rate, dropout_rng)
    return _flash(q, k, v, seed, rate, num_heads)


def flash_attention(q, k, v, dropout_rate=0.0, dropout_rng=None):
    """Head-major adapter: q, k, v (B, H, T/S, D) -> (B, H, T, D). Prefer
    flash_attention_bthd — this wrapper pays two layout transposes."""
    b, h, t, d = q.shape
    s = k.shape[2]
    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, x.shape[2], h * d)
    o = flash_attention_bthd(pack(q), pack(k), pack(v), h, dropout_rate, dropout_rng)
    return o.reshape(b, t, h, d).transpose(0, 2, 1, 3)


# --------------------------------------------------------------------------
# Second-order-capable hybrid: Pallas forward, differentiable blockwise
# backward.
#
# The pure-kernel path above is first-order only — its backward is made of
# Pallas kernels with no AD rules, so code that is differentiated TWICE (the
# meta inner loss: the supervisor backprops through the detector's gradient,
# interactron.py:99-123) cannot trace it. Reverse-over-reverse through
# jax.custom_vjp works fine, however, when the registered bwd is built from
# differentiable ops. This variant therefore runs the SAME Pallas forward
# (fast, no (T,S) materialization) and registers a bwd of per-q-block
# jax.checkpoint'd jnp regions: the outer differentiation re-derives each
# block from its inputs, so the (T,S) probability tensor never materializes
# at any order. Dropout keep-masks are regenerated by an AD-free Pallas
# helper kernel with the forward's exact counter scheme (a constant function
# of the seed — it carries no tangents, so it is invisible to the outer AD).
# --------------------------------------------------------------------------


def _mask_row_kernel(seed_ref, o_ref, *, ih0_stride, jq, n_k_blocks, bk, rate):
    i = pl.program_id(0)  # flattened (b*h) index -> matches fwd's i*g_sz+g
    keep = _keep_mask_row(seed_ref[0, 0], i, jq, n_k_blocks, bk, o_ref.shape[1], rate)
    o_ref[0] = keep.astype(jnp.float32)


def _dropout_mask_row(seed, bh, jq, bq, n_k_blocks, bk, rate):
    """(bh, bq, n_k_blocks*bk) keep mask for q-block jq, regenerated with the
    forward kernel's counter scheme (head index = grid dim 0)."""
    return pl.pallas_call(
        functools.partial(_mask_row_kernel, ih0_stride=0, jq=jq,
                          n_k_blocks=n_k_blocks, bk=bk, rate=rate),
        out_shape=jax.ShapeDtypeStruct((bh, bq, n_k_blocks * bk), jnp.float32),
        grid=(bh,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, bq, n_k_blocks * bk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash2(q, k, v, seed, rate, h):
    o, _ = _fwd_impl(q, k, v, seed, rate, h)
    return o[:, : q.shape[1]]


def _flash2_fwd(q, k, v, seed, rate, h):
    # NOTE: must call the custom-vjp-wrapped function itself (not _fwd_impl)
    # so nested differentiation re-enters this rule instead of trying to
    # linearize the Pallas call ("Linearization failed to produce known
    # values" otherwise). Residuals: inputs + the OUTPUT (for the
    # D = rowsum(dO*O) identity) — no extra kernel state.
    out = _flash2(q, k, v, seed, rate, h)
    return out, (q, k, v, seed, out)


def _flash2_bwd(rate, h, res, g):
    q, k, v, seed, out = res
    b, t, dim = q.shape
    s = k.shape[1]
    hd = dim // h
    scale = 1.0 / (hd ** 0.5)
    bq = _block_q(max(t, s))
    t_pad = _pad_len(t, bq)
    s_pad = _pad_len(s, bq)
    n_k_blocks = s_pad // bq

    # head-major views (einsum layout folding — no physical transposes).
    # Zero-padded g/o rows self-nullify their dk/dv contributions
    # (dp = 0, D = 0 => ds = 0), so no row masking is needed.
    qh = _pad_t(q, t_pad).reshape(b, t_pad, h, hd)
    kh = k.reshape(b, s, h, hd)
    vh = v.reshape(b, s, h, hd)
    gh = _pad_t(g, t_pad).reshape(b, t_pad, h, hd)
    oh = _pad_t(out, t_pad).reshape(b, t_pad, h, hd)

    def make_block(jq):
        @jax.checkpoint
        def one_block(q_b, g_b, o_b, kh, vh, seed):
            # q_b/g_b/o_b: (b, bq, h, hd). Each block sees FULL rows, so the
            # softmax row stats are local — no saved normalizer needed.
            logits = jnp.einsum(
                "bthd,bshd->bhts", q_b, kh, preferred_element_type=jnp.float32
            ) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)         # (b, h, bq, s)
            dp = jnp.einsum("bthd,bshd->bhts", g_b, vh,
                            preferred_element_type=jnp.float32)
            if rate > 0.0:
                # regenerated inside the region: recomputed (never stored)
                # at every differentiation level; AD-constant, so invisible
                # to the outer differentiation
                keep = _dropout_mask_row(seed, b * h, jq, bq, n_k_blocks, bq, rate)
                keep = keep.reshape(b, h, bq, s_pad)[..., :s]
                inv = 1.0 / (1.0 - rate)
                p_drop = p * keep * inv
                dp = dp * keep * inv
            else:
                p_drop = p
            D = jnp.sum(g_b.astype(jnp.float32) * o_b.astype(jnp.float32),
                        axis=-1)                               # (b, bq, h)
            ds = p * (dp - D.transpose(0, 2, 1)[..., None])
            dq_b = jnp.einsum("bhts,bshd->bthd", ds.astype(kh.dtype), kh,
                              preferred_element_type=jnp.float32) * scale
            dk_b = jnp.einsum("bhts,bthd->bshd", ds.astype(q_b.dtype), q_b,
                              preferred_element_type=jnp.float32) * scale
            dv_b = jnp.einsum("bhts,bthd->bshd", p_drop.astype(g_b.dtype), g_b,
                              preferred_element_type=jnp.float32)
            return dq_b, dk_b, dv_b

        return one_block

    dq_blocks = []
    dk = jnp.zeros(kh.shape, jnp.float32)
    dv = jnp.zeros(vh.shape, jnp.float32)
    for jq in range(t_pad // bq):
        sl = slice(jq * bq, (jq + 1) * bq)
        dq_b, dk_b, dv_b = make_block(jq)(
            qh[:, sl], gh[:, sl], oh[:, sl], kh, vh, seed
        )
        dq_blocks.append(dq_b)
        dk = dk + dk_b
        dv = dv + dv_b

    dq = jnp.concatenate(dq_blocks, axis=1) if len(dq_blocks) > 1 else dq_blocks[0]
    return (
        dq[:, :t].reshape(b, t, dim).astype(q.dtype),
        dk.reshape(b, s, dim).astype(k.dtype),
        dv.reshape(b, s, dim).astype(v.dtype),
        None,
    )


_flash2.defvjp(_flash2_fwd, _flash2_bwd)


def flash_attention_2nd_bthd(q, k, v, num_heads, dropout_rate=0.0,
                             dropout_rng=None):
    """Packed-head fused attention usable under REPEATED differentiation:
    Pallas forward, blockwise differentiable backward. Same signature and
    semantics as flash_attention_bthd."""
    seed, rate = _seed_rate(dropout_rate, dropout_rng)
    return _flash2(q, k, v, seed, rate, num_heads)
