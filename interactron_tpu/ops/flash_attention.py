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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
_NEG = -1e30


def _block_q(t):
    """Row-block size. 128 everywhere: at the fusion size (T=2060) the
    11%-smaller padded area beats 256-blocks' deeper pipeline on chip
    (98.3 vs 97.3 eps/s predict, round 3); at T<=512 a 256 block would
    mostly be padding anyway. FLASH_BLOCK_Q overrides for sweeps."""
    import os

    env = os.environ.get("FLASH_BLOCK_Q")
    if env:
        return int(env)
    return BLOCK_Q


def _group(h, hd):
    """Heads per grid program: pack heads until the lane dim reaches 128."""
    g = max(1, 128 // hd)
    g = min(g, h)
    while h % g:
        g -= 1
    return g


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
    # VPU-pass economy (the kernels are softmax-VPU-bound, not MXU-bound):
    #   * q is pre-scaled ONCE (a (BQ, 128) pass) with scale*log2(e) folded
    #     in, so neither the (BQ, S) logits scale pass nor exp->exp2
    #     conversion costs anything;
    #   * NO column masking pass: K/V are zero-padded by construction, so
    #     every padded column contributes exactly exp2(0 - m) to the row
    #     denominator (and nothing to P@V since v_pad = 0) — subtract the
    #     analytic pad mass from denom instead of masking (BQ, S) logits;
    #   * the 1/denom normalization folds into the (BQ, hd) output, not a
    #     (BQ, S) division pass.
    q = q_ref[0] * (scale * 1.4426950408889634)   # (BQ, g_sz*hd)
    k = k_ref[0]   # (S_pad, g_sz*hd)
    v = v_ref[0]
    s_pad = k.shape[0]
    n_pad = s_pad - s_real
    outs = []
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if n_pad:
            denom = denom - n_pad * jnp.exp2(-m)
        if rate > 0.0:
            bk = p.shape[1] // n_k_blocks
            keep = _keep_mask_row(seed_ref[0, 0], i * g_sz + g, j, n_k_blocks,
                                  bk, p.shape[0], rate)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom)
        # L stays in natural-log space (the backward kernels consume it)
        l_ref[0, g, :, 0] = m[:, 0] * 0.6931471805599453 + jnp.log(denom[:, 0])
    o = outs[0] if g_sz == 1 else jnp.concatenate(outs, axis=1)
    o_ref[0] = o.astype(o_ref.dtype)


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dq_ref, *,
               scale, rate, n_k_blocks, hd, g_sz):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # no column masking needed anywhere here: padded K ROWS are zero, so
    # whatever dS values the padded columns carry, their dQ contribution
    # (dS @ K) is exactly zero
    q = q_ref[0] * (scale * 1.4426950408889634)
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
        )
        p = jnp.exp2(logits - L * 1.4426950408889634)
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
            # no padded-query-row masking: dO and D are zero-padded, so
            # dS = P*(dP - D) vanishes on padded rows, and dV's padded-row
            # contribution is P^T @ 0
            qg = q_ref[0, pl.ds(jq * bq, bq), sl]          # raw: dK needs it
            qs = qg * (scale * 1.4426950408889634)         # scaled: logits
            dog = do_ref[0, pl.ds(jq * bq, bq), sl]
            L = l_ref[0, g, pl.ds(jq * bq, bq), :]         # (BQ, 1)
            D = d_ref[0, g, pl.ds(jq * bq, bq), :]
            logits = jax.lax.dot_general(
                qs, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (BQ, BK)
            p = jnp.exp2(logits - L * 1.4426950408889634)  # (BQ, BK)
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


def _keep_mask_col(seed_val, ih, jk, n_q_blocks, bq, bk, rate):
    """Full (n_q_blocks*bq, bk) keep mask for one K block: the same
    per-(jq, jk) tiles the forward generated, stacked along rows."""
    tiles = [
        _keep_mask(seed_val, ih, jq, jk, (bq, bk), rate)
        for jq in range(n_q_blocks)
    ]
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=0)


def _dkv_kernel_fullt(seed_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref,
                      dk_ref, dv_ref, *, scale, rate, n_q_blocks, bq, hd, g_sz):
    """dK/dV with FULL-T GEMMs — the dq kernel's shape, transposed.

    The blocked variant (_dkv_kernel) sweeps q in bq-row tiles, so every
    GEMM is (bq, bk, 64): M=N=128, K=64 — half MXU depth AND a 136-step
    unrolled chain Mosaic must schedule. Here each grid step computes one
    K-block against ALL query rows at once: logits/dp are (T_pad, bk) with
    M=2176, and the dV/dK contractions run K=T_pad=2176 deep — the same
    total arithmetic in 4 big GEMMs per head instead of 68 small ones.
    Padded q rows are harmless for the same reason as in _dkv_kernel: dO
    and D are zero there, so their dV/dK contributions vanish."""
    i = pl.program_id(0)
    jk = pl.program_id(1)
    qs = q_ref[0] * (scale * 1.4426950408889634)   # one (T_pad, lanes) pass
    k = k_ref[0]                                    # (BK, g_sz*hd)
    v = v_ref[0]
    do = do_ref[0]                                  # (T_pad, g_sz*hd)
    inv_log2e = 0.6931471805599453
    dks = []
    dvs = []
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        qg = qs[:, sl]
        dog = do[:, sl]
        L = l_ref[0, g]                             # (T_pad, 1)
        D = d_ref[0, g]
        logits = jax.lax.dot_general(
            qg, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (T_pad, BK)
        p = jnp.exp2(logits - L * 1.4426950408889634)
        dp = jax.lax.dot_general(dog, v[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            bk_cols = p.shape[1]
            keep = _keep_mask_col(seed_ref[0, 0], i * g_sz + g, jk,
                                  n_q_blocks, bq, bk_cols, rate)
            p_drop = jnp.where(keep, p / (1.0 - rate), 0.0)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        else:
            p_drop = p
        dvs.append(jax.lax.dot_general(
            p_drop.astype(dog.dtype), dog, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))                                          # (BK, hd), K=T_pad
        ds = (p * (dp - D)).astype(qg.dtype)
        # qg carries scale*log2e; dK = dS^T Q * scale => divide log2e back out
        dks.append(jax.lax.dot_general(
            ds, qg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * inv_log2e)
    dk = dks[0] if g_sz == 1 else jnp.concatenate(dks, axis=1)
    dv = dvs[0] if g_sz == 1 else jnp.concatenate(dvs, axis=1)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_merged_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, l_ref, d_ref,
                       dq_ref, dk_ref, dv_ref, *, scale, rate,
                       n_k_blocks, n_q_blocks, bq, hd, g_sz):
    """Single-pass backward: dQ, dK, dV from ONE logits/P/dS computation.

    The two-kernel split (_dq_kernel + _dkv_kernel/_dkv_kernel_fullt)
    recomputes the (T, S) probability tile TWICE — two full exp2 sweeps and
    two logits GEMMs over every (q, k) block pair. Profiled on chip the
    fusion backward is not MXU-bound (77 TF/s against a ~130 TF/s blended
    ceiling), so the duplicated VPU softmax sweep is on the critical path.
    Here the K-block grid of the fullt kernel also accumulates
    dQ += dS @ K_block into an f32 REVISITED output block that stays VMEM-
    resident across the jk sweep (the standard Pallas accumulator-output
    pattern; the caller casts to the input dtype) — 5 GEMMs and one
    exp2 sweep per block pair instead of 7 and two."""
    i = pl.program_id(0)
    jk = pl.program_id(1)
    qs = q_ref[0] * (scale * 1.4426950408889634)
    k = k_ref[0]                                    # (BK, g_sz*hd)
    v = v_ref[0]
    do = do_ref[0]                                  # (T_pad, g_sz*hd)

    @pl.when(jk == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    inv_log2e = 0.6931471805599453
    dks = []
    dvs = []
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        qg = qs[:, sl]
        dog = do[:, sl]
        L = l_ref[0, g]                             # (T_pad, 1)
        D = d_ref[0, g]
        logits = jax.lax.dot_general(
            qg, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (T_pad, BK)
        p = jnp.exp2(logits - L * 1.4426950408889634)
        dp = jax.lax.dot_general(dog, v[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask_col(seed_ref[0, 0], i * g_sz + g, jk,
                                  n_q_blocks, bq, p.shape[1], rate)
            p_drop = jnp.where(keep, p / (1.0 - rate), 0.0)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        else:
            p_drop = p
        dvs.append(jax.lax.dot_general(
            p_drop.astype(dog.dtype), dog, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        ds = (p * (dp - D)).astype(qg.dtype)        # (T_pad, BK)
        dks.append(jax.lax.dot_general(
            ds, qg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * inv_log2e)
        # dQ contribution of this K block: dS @ K (K=BK deep), true scale
        dq_ref[0, :, sl] += jax.lax.dot_general(
            ds, k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
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


def _fwd_impl(q, k, v, seed, rate, h, bq=None):
    b, t, dim = q.shape
    s = k.shape[1]
    hd = dim // h
    scale = 1.0 / (hd ** 0.5)
    g_sz = _group(h, hd)
    ng = h // g_sz
    lanes = g_sz * hd
    bq = bq if bq is not None else _block_q(max(t, s))
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


def _make_D(gf, o_pad, b, t_pad, h, hd, ng, g_sz):
    """D = rowsum(dO * O) per head: (b, t_pad, h) -> (b*ng, g_sz, t_pad, 1)."""
    d_bth = jnp.sum(
        gf.astype(jnp.float32).reshape(b, t_pad, h, hd)
        * o_pad.astype(jnp.float32).reshape(b, t_pad, h, hd),
        axis=-1,
    )
    return d_bth.transpose(0, 2, 1).reshape(b * ng, g_sz, t_pad, 1)


def _flash_bwd(rate, h, res, g):
    q, k, v, seed, o_pad, L = res
    dq, dk, dv = _bwd_kernels(q, k, v, g, o_pad, L, seed, rate, h,
                              _block_q(max(q.shape[1], k.shape[1])))
    return dq, dk, dv, None


def _bwd_kernels(q, k, v, g, o_pad, L, seed, rate, h, bq):
    b, t, dim = q.shape
    s = k.shape[1]
    hd = dim // h
    scale = 1.0 / (hd ** 0.5)
    g_sz = _group(h, hd)
    ng = h // g_sz
    lanes = g_sz * hd
    t_pad = _pad_len(t, bq)
    s_pad = _pad_len(s, bq)
    qf = _pad_t(q, t_pad)
    kf = _pad_t(k, s_pad)
    vf = _pad_t(v, s_pad)
    gf = _pad_t(g, t_pad)
    D = _make_D(gf, o_pad, b, t_pad, h, hd, ng, g_sz)

    # the full-T resident blocks (q/do/L/D plus the revisited dq accumulator
    # in the merged kernel) sit just over Mosaic's 16M default scoped-vmem
    # cap once an OUTER vmap adds a batch grid dim (measured 16.20M at the
    # fusion shape under the predict bench's episode vmap at batch 8 —
    # compile-time OOM, 200K over); same remedy as the second-order merged
    # kernel's 64M cap
    vmem_cap = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)
    grid_q = (b * ng, t_pad // bq)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, rate=rate,
                          n_k_blocks=s_pad // bq, hd=hd, g_sz=g_sz),
        compiler_params=vmem_cap,
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

    import os

    if os.environ.get("FLASH_BWD", "merged") == "merged":
        grid_k = (b * ng, s_pad // bq)
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_merged_kernel, scale=scale, rate=rate,
                n_k_blocks=s_pad // bq, n_q_blocks=t_pad // bq, bq=bq,
                hd=hd, g_sz=g_sz,
            ),
            compiler_params=vmem_cap,
            out_shape=(
                jax.ShapeDtypeStruct((b, t_pad, dim), jnp.float32),
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
                pl.BlockSpec((1, t_pad, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
                             memory_space=pltpu.VMEM),
            ),
        )(seed, qf, kf, vf, gf, L, D)
        return dq.astype(q.dtype)[:, :t], dk[:, :s], dv[:, :s]

    use_fullt = os.environ.get("FLASH_DKV", "fullt") == "fullt"
    kern = (
        functools.partial(
            _dkv_kernel_fullt, scale=scale, rate=rate,
            n_q_blocks=t_pad // bq, bq=bq, hd=hd, g_sz=g_sz,
        )
        if use_fullt
        else functools.partial(
            _dkv_kernel, t_real=t, scale=scale, rate=rate,
            n_q_blocks=t_pad // bq, bq=bq, hd=hd, g_sz=g_sz,
        )
    )
    grid_k = (b * ng, s_pad // bq)
    dk, dv = pl.pallas_call(
        kern,
        compiler_params=vmem_cap,
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

    return dq[:, :t], dk[:, :s], dv[:, :s]


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


# --------------------------------------------------------------------------
# Explicit second-order kernels: the attention BACKWARD as a custom-vjp
# function whose own VJP is two Pallas kernels.
#
# Reverse-over-reverse (the meta inner loss, interactron.py:99-123)
# differentiates the inner gradient computation. With the backward expressed
# as a custom_vjp function B(q,k,v,dO) -> (dq,dk,dv), the outer
# differentiation consumes B's registered VJP instead of trying to trace
# Pallas internals, and every pass — forward, first-order backward, and the
# second-order backward — runs fused kernels with no (T,S) HBM tensors.
#
# Derivative of the backward (per head; P true softmax, M keep mask,
# inv = 1/(1-rate), dp_m = M*inv*(dO V^T), D = rowsum(P*dp_m),
# dS = P*(dp_m - D)), given cotangents (A, Bc, C) of (dq, dk, dv):
#   g_dS = scale*(A K^T + Q Bc^T)
#   g_P  = M*inv*(dO C^T) + g_dS*(dp_m - D) - rowsum(P*g_dS)*dp_m
#   g_dp = M*inv*(P*g_dS - rowsum(P*g_dS)*P)
#   g_S  = P*(g_P - rowsum(P*g_P))
#   c_q  = scale*(g_S K + dS Bc)        c_k = scale*(g_S^T Q + dS^T A)
#   c_v  = g_dp^T dO                    c_dO = (M*inv*P) C + g_dp V
# --------------------------------------------------------------------------

SO_BLOCK_Q = 128  # fp32 (bq, S) tile working set caps the row kernel


def _sov_row_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, a_ref, bc_ref,
                    c_ref, l_ref, d_ref, cq_ref, cdo_ref, stats_ref, *,
                    scale, rate, n_k_blocks, hd, g_sz):
    i = pl.program_id(0)
    j = pl.program_id(1)
    cqs = []
    cdos = []
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        # VPU-pass economy on the (BQ, S) tiles (the kernel is VPU-bound,
        # not MXU-bound — ~17 elementwise f32 passes per tile originally):
        #   * q pre-scaled ONCE on its (BQ, hd) slice with scale*log2(e)
        #     folded in, so the (BQ, S) logits never see a scale pass and
        #     exp becomes exp2 for free (L converts on its (BQ, 1) column);
        #   * NO padded-column masking: every padded-column value only ever
        #     contracts against zero-padded k-side operands (k, v, Bc, C)
        #     or enters the row sums with a zero factor — g_dS, dp and
        #     g_P1 all vanish there because kg = vg = Bg = Cg = 0;
        #   * e = dp - D computed once (dS and g_P share it), and
        #     g_dp = p*(g_dS + g_D) instead of p*g_dS + g_D*p.
        qg = q_ref[0][:, sl]
        qs = qg * (scale * 1.4426950408889634)
        kg = k_ref[0][:, sl]
        vg = v_ref[0][:, sl]
        dog = do_ref[0][:, sl]
        Ag = a_ref[0][:, sl]
        Bg = bc_ref[0][:, sl]
        Cg = c_ref[0][:, sl]
        L = l_ref[0, g]     # (BQ, 1)
        D = d_ref[0, g]
        mm = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        mn = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        logits = mm(qs, kg)
        p = jnp.exp2(logits - L * 1.4426950408889634)  # (BQ, S)
        dp_raw = mm(dog, vg)
        g_dS = (mm(Ag, kg) + mm(qg, Bg)) * scale
        g_Pd_raw = mm(dog, Cg)
        if rate > 0.0:
            bk = p.shape[1] // n_k_blocks
            keep = _keep_mask_row(seed_ref[0, 0], i * g_sz + g, j, n_k_blocks,
                                  bk, p.shape[0], rate)
            inv = 1.0 / (1.0 - rate)
            dp = jnp.where(keep, dp_raw * inv, 0.0)
            g_P1 = jnp.where(keep, g_Pd_raw * inv, 0.0)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            keep = None
            dp = dp_raw
            g_P1 = g_Pd_raw
            pd = p
        e = dp - D
        dS = p * e
        g_D = -jnp.sum(p * g_dS, axis=-1, keepdims=True)   # (BQ, 1)
        g_P = g_P1 + g_dS * e + g_D * dp
        g_dpm = p * (g_dS + g_D)
        if rate > 0.0:
            g_dp_raw = jnp.where(keep, g_dpm / (1.0 - rate), 0.0)
        else:
            g_dp_raw = g_dpm
        s_gp = jnp.sum(p * g_P, axis=-1, keepdims=True)
        g_S = p * (g_P - s_gp)
        cqs.append((mn(g_S.astype(kg.dtype), kg)
                    + mn(dS.astype(Bg.dtype), Bg)) * scale)
        cdos.append(mn(pd.astype(Cg.dtype), Cg) + mn(g_dp_raw.astype(vg.dtype), vg))
        # row-global statistics for the column kernel (it only sees one
        # k-block per tile and cannot form full-row sums itself)
        stats_ref[0, g, :, 0] = g_D[:, 0]
        stats_ref[0, g_sz + g, :, 0] = s_gp[:, 0]
    cq = cqs[0] if g_sz == 1 else jnp.concatenate(cqs, axis=1)
    cdo = cdos[0] if g_sz == 1 else jnp.concatenate(cdos, axis=1)
    cq_ref[0] = cq.astype(cq_ref.dtype)
    cdo_ref[0] = cdo.astype(cdo_ref.dtype)


def _sov_col_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, a_ref, bc_ref,
                    c_ref, l_ref, d_ref, ck_ref, cv_ref, *, scale,
                    rate, bq, ch, hd, g_sz):
    """One (k_block jk, q-block-CHUNK jc) tile of the c_k/c_v accumulation.

    The q loop is split between the GRID (chunk index jc, innermost dim) and
    an in-kernel loop over the ch q-blocks of the chunk. Both extremes
    measured bad at the production fusion shape:
      * whole rows in one program OOMs Mosaic's 16M scoped VMEM (20.56M):
        a (t_pad, 1) f32 statistics block physically pads its lane dim
        1 -> 128, so L + the packed D/g_D/s_gp channels alone cost
        8 x 1.11M x double-buffering;
      * one q-block per grid step (ch=1) serializes the pipeline through
        the output read-modify-write chain — each step carries ~1.8 us of
        dependency stall around ~0.4 us of MXU work (11.0 ms/call, vs
        3.3 ms for the comparable dkv kernel).
    ch q-blocks per step amortize the revisit chain while the stat windows
    stay bounded; the output tile's index map ignores jc, so the fp32
    accumulators stay VMEM-resident across the whole chunk sweep.

    No padded-query-row masking: for a padded row q = dO = A = 0 and the
    row stats are zero, so every contribution carries a zero factor —
    g_S^T q, dS^T A (dS = p*(0-0)), g_dp^T dO — even though p itself is
    nonzero (exp(0-L)) on those rows.
    """
    i = pl.program_id(0)
    jk = pl.program_id(1)
    jc = pl.program_id(2)

    @pl.when(jc == 0)
    def _init():
        ck_ref[...] = jnp.zeros_like(ck_ref)
        cv_ref[...] = jnp.zeros_like(cv_ref)

    mm = lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    mt = lambda x, y: jax.lax.dot_general(
        x, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    cks = []
    cvs = []
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        kg = k_ref[0][:, sl]       # (BK, hd)
        vg = v_ref[0][:, sl]
        Bg = bc_ref[0][:, sl]
        Cg = c_ref[0][:, sl]
        bk = kg.shape[0]
        ck_acc = None
        cv_acc = None
        for u in range(ch):
            rows = pl.ds(u * bq, bq)
            # same VPU-pass economy as the row kernel: pre-scaled q for
            # exp2 logits, e = dp - D shared, g_dp = p*(g_dS + g_D)
            qg = q_ref[0, rows, sl]        # (BQ, hd) — raw: g_S^T q needs it
            qs = qg * (scale * 1.4426950408889634)
            dog = do_ref[0, rows, sl]
            Ag = a_ref[0, rows, sl]
            L = l_ref[0, g, rows, :]       # (BQ, 1)
            D = d_ref[0, g, rows, :]
            # row-global sums rowsum(P*g_dS) and rowsum(P*g_P) span the
            # FULL row, which this tile cannot form — they arrive
            # precomputed by the row kernel through d_ref's extra channels
            g_D = d_ref[0, g_sz + g, rows, :]
            s_gp = d_ref[0, 2 * g_sz + g, rows, :]
            logits = mm(qs, kg)                         # (BQ, BK)
            p = jnp.exp2(logits - L * 1.4426950408889634)
            dp_raw = mm(dog, vg)
            g_dS = (mm(Ag, kg) + mm(qg, Bg)) * scale
            g_Pd_raw = mm(dog, Cg)
            if rate > 0.0:
                # the dropout counter is keyed by the GLOBAL q-block index
                keep = _keep_mask(seed_ref[0, 0], i * g_sz + g, jc * ch + u,
                                  jk, (qg.shape[0], bk), rate)
                inv = 1.0 / (1.0 - rate)
                dp = jnp.where(keep, dp_raw * inv, 0.0)
                g_P1 = jnp.where(keep, g_Pd_raw * inv, 0.0)
            else:
                keep = None
                dp = dp_raw
                g_P1 = g_Pd_raw
            e = dp - D
            dS = p * e
            g_P = g_P1 + g_dS * e + g_D * dp
            g_dpm = p * (g_dS + g_D)
            if rate > 0.0:
                g_dp_raw = jnp.where(keep, g_dpm / (1.0 - rate), 0.0)
            else:
                g_dp_raw = g_dpm
            g_S = p * (g_P - s_gp)
            ck_u = (mt(g_S.astype(qg.dtype), qg)
                    + mt(dS.astype(Ag.dtype), Ag)) * scale
            cv_u = mt(g_dp_raw.astype(dog.dtype), dog)
            ck_acc = ck_u if ck_acc is None else ck_acc + ck_u
            cv_acc = cv_u if cv_acc is None else cv_acc + cv_u
        cks.append(ck_acc)
        cvs.append(cv_acc)
    ck = cks[0] if g_sz == 1 else jnp.concatenate(cks, axis=1)
    cv = cvs[0] if g_sz == 1 else jnp.concatenate(cvs, axis=1)
    ck_ref[0] = ck_ref[0] + ck
    cv_ref[0] = cv_ref[0] + cv


def _sov_merged_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, a_ref, bc_ref,
                       c_ref, l_ref, d_ref, cq_ref, cdo_ref, ck_ref, cv_ref, *,
                       scale, rate, n_k_blocks, hd, g_sz):
    """Single-sweep second-order backward: the row kernel extended to ALSO
    accumulate c_k/c_v across its q-block grid sweep.

    The separate row+column pair recomputes every (q, k) tile's
    logits/p/dp/g_dS/g_P chain TWICE (once per kernel) because the column
    kernel cannot form full-row sums. But the row kernel already holds the
    FULL k/v/Bc/C sequence in VMEM (col_full specs) and materializes g_S,
    dS and g_dp for its q block — the missing c_k/c_v contributions are two
    transposed GEMMs per head group. Keeping (s_pad, lanes) fp32 c_k/c_v
    accumulators VMEM-resident across the j sweep (output index map ignores
    j; grid iterates j innermost) adds ~2.2 MB and eliminates the column
    kernel's 5 GEMMs + ~10 VPU passes per tile — ~40% of the second-order
    cost at the fusion shape. Heavy per-step work (a whole row sweep)
    amortizes the output revisit chain that made the ch=1 column layout
    slow (see _sov_col_kernel docstring)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        ck_ref[...] = jnp.zeros_like(ck_ref)
        cv_ref[...] = jnp.zeros_like(cv_ref)

    mt = lambda x, y: jax.lax.dot_general(
        x, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    cqs, cdos, cks, cvs = [], [], [], []
    for g in range(g_sz):
        sl = slice(g * hd, (g + 1) * hd)
        qg = q_ref[0][:, sl]
        qs = qg * (scale * 1.4426950408889634)
        kg = k_ref[0][:, sl]
        vg = v_ref[0][:, sl]
        dog = do_ref[0][:, sl]
        Ag = a_ref[0][:, sl]
        Bg = bc_ref[0][:, sl]
        Cg = c_ref[0][:, sl]
        L = l_ref[0, g]     # (BQ, 1)
        D = d_ref[0, g]
        mm = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        mn = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        logits = mm(qs, kg)
        p = jnp.exp2(logits - L * 1.4426950408889634)  # (BQ, S)
        dp_raw = mm(dog, vg)
        g_dS = (mm(Ag, kg) + mm(qg, Bg)) * scale
        g_Pd_raw = mm(dog, Cg)
        if rate > 0.0:
            bk = p.shape[1] // n_k_blocks
            keep = _keep_mask_row(seed_ref[0, 0], i * g_sz + g, j, n_k_blocks,
                                  bk, p.shape[0], rate)
            inv = 1.0 / (1.0 - rate)
            dp = jnp.where(keep, dp_raw * inv, 0.0)
            g_P1 = jnp.where(keep, g_Pd_raw * inv, 0.0)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            keep = None
            dp = dp_raw
            g_P1 = g_Pd_raw
            pd = p
        e = dp - D
        dS = p * e
        g_D = -jnp.sum(p * g_dS, axis=-1, keepdims=True)   # (BQ, 1)
        g_P = g_P1 + g_dS * e + g_D * dp
        g_dpm = p * (g_dS + g_D)
        if rate > 0.0:
            g_dp_raw = jnp.where(keep, g_dpm / (1.0 - rate), 0.0)
        else:
            g_dp_raw = g_dpm
        s_gp = jnp.sum(p * g_P, axis=-1, keepdims=True)
        g_S = p * (g_P - s_gp)
        cqs.append((mn(g_S.astype(kg.dtype), kg)
                    + mn(dS.astype(Bg.dtype), Bg)) * scale)
        cdos.append(mn(pd.astype(Cg.dtype), Cg) + mn(g_dp_raw.astype(vg.dtype), vg))
        # c_k/c_v contributions of this q block (the column kernel's math,
        # without recomputing the tile chain)
        cks.append((mt(g_S.astype(qg.dtype), qg)
                    + mt(dS.astype(Ag.dtype), Ag)) * scale)
        cvs.append(mt(g_dp_raw.astype(dog.dtype), dog))
    cq = cqs[0] if g_sz == 1 else jnp.concatenate(cqs, axis=1)
    cdo = cdos[0] if g_sz == 1 else jnp.concatenate(cdos, axis=1)
    ck = cks[0] if g_sz == 1 else jnp.concatenate(cks, axis=1)
    cv = cvs[0] if g_sz == 1 else jnp.concatenate(cvs, axis=1)
    cq_ref[0] = cq.astype(cq_ref.dtype)
    cdo_ref[0] = cdo.astype(cdo_ref.dtype)
    ck_ref[0] = ck_ref[0] + ck
    cv_ref[0] = cv_ref[0] + cv


def _so_vjp_impl(q, k, v, do, A, Bc, C, L, D, seed, rate, h):
    """VJP of the attention backward: cotangents (A, Bc, C) of (dq, dk, dv)
    -> cotangents (c_q, c_k, c_v, c_dO). All of q/k/v/do/A/Bc/C are packed
    (B, T|S, H*Dh); L, D are (b*ng, g_sz, t_pad, 1) row stats."""
    b, t, dim = q.shape
    s = k.shape[1]
    hd = dim // h
    scale = 1.0 / (hd ** 0.5)
    g_sz = _group(h, hd)
    ng = h // g_sz
    lanes = g_sz * hd
    bq = _so_bq(t, s)
    t_pad = _pad_len(t, bq)
    s_pad = _pad_len(s, bq)
    qf = _pad_t(q, t_pad)
    kf = _pad_t(k, s_pad)
    vf = _pad_t(v, s_pad)
    dof = _pad_t(do, t_pad)
    Af = _pad_t(A, t_pad)
    Bf = _pad_t(Bc, s_pad)
    Cf = _pad_t(C, s_pad)

    row_specs = lambda: pl.BlockSpec(
        (1, bq, lanes), lambda i, j, ng=ng: (i // ng, j, i % ng),
        memory_space=pltpu.VMEM)
    col_full = lambda n: pl.BlockSpec(
        (1, n, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
        memory_space=pltpu.VMEM)
    stat_blk = lambda c: pl.BlockSpec(
        (1, c, bq, 1), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
    stat_full = lambda c: pl.BlockSpec(
        (1, c, t_pad, 1), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    grid_q = (b * ng, t_pad // bq)

    if os.environ.get("SO_MERGED", "1") != "0":
        # single-sweep kernel: c_k/c_v accumulate in VMEM-resident fp32
        # tiles across the q-block sweep — no column kernel, no stats
        # round-trip, no tile-chain recompute (see _sov_merged_kernel)
        out_full = lambda: pl.BlockSpec(
            (1, s_pad, lanes), lambda i, j, ng=ng: (i // ng, 0, i % ng),
            memory_space=pltpu.VMEM)
        # the resident fp32 c_k/c_v accumulators + their double buffers push
        # the working set past Mosaic's 16M default scoped-vmem cap at the
        # fusion shape (21.1M measured); v5e VMEM is 128M — raise the cap
        vmem_cap = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        cq, cdo, ck, cv = pl.pallas_call(
            functools.partial(_sov_merged_kernel, scale=scale, rate=rate,
                              n_k_blocks=s_pad // bq, hd=hd, g_sz=g_sz),
            out_shape=(
                jax.ShapeDtypeStruct((b, t_pad, dim), q.dtype),
                jax.ShapeDtypeStruct((b, t_pad, dim), q.dtype),
                jax.ShapeDtypeStruct((b, s_pad, dim), jnp.float32),
                jax.ShapeDtypeStruct((b, s_pad, dim), jnp.float32),
            ),
            grid=grid_q,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                row_specs(),            # q
                col_full(s_pad),        # k
                col_full(s_pad),        # v
                row_specs(),            # do
                row_specs(),            # A
                col_full(s_pad),        # Bc
                col_full(s_pad),        # C
                stat_blk(g_sz),         # L
                stat_blk(g_sz),         # D
            ],
            out_specs=(row_specs(), row_specs(), out_full(), out_full()),
            compiler_params=vmem_cap,
        )(seed, qf, kf, vf, dof, Af, Bf, Cf, L, D)
        return (cq[:, :t], ck[:, :s].astype(q.dtype),
                cv[:, :s].astype(q.dtype), cdo[:, :t])

    cq, cdo, stats = pl.pallas_call(
        functools.partial(_sov_row_kernel, scale=scale, rate=rate,
                          n_k_blocks=s_pad // bq, hd=hd, g_sz=g_sz),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, dim), q.dtype),
            jax.ShapeDtypeStruct((b, t_pad, dim), q.dtype),
            jax.ShapeDtypeStruct((b * ng, 2 * g_sz, t_pad, 1), jnp.float32),
        ),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_specs(),            # q
            col_full(s_pad),        # k
            col_full(s_pad),        # v
            row_specs(),            # do
            row_specs(),            # A
            col_full(s_pad),        # Bc
            col_full(s_pad),        # C
            stat_blk(g_sz),         # L
            stat_blk(g_sz),         # D
        ],
        out_specs=(row_specs(), row_specs(), stat_blk(2 * g_sz)),
    )(seed, qf, kf, vf, dof, Af, Bf, Cf, L, D)

    # pack [D | g_D | s_gp] for the column kernel
    D_ext = jnp.concatenate([D, stats], axis=1)  # (b*ng, 3*g_sz, t_pad, 1)

    # 3D grid: (head-group, k_block, q CHUNK of ch blocks) with jc innermost.
    # The output index maps ignore jc, so the fp32 accumulator tiles stay
    # resident in VMEM across the whole q sweep and flush to HBM once per k
    # block; ch q-blocks per step amortize the accumulate chain (see the
    # kernel docstring). The q side re-pads to a ch*bq multiple — the extra
    # all-padding blocks contribute exact zeros.
    ch = int(os.environ.get("SO_COL_CHUNK", "6"))
    n_q = t_pad // bq
    ch = min(ch, n_q)
    t_pad_c = -(-n_q // ch) * ch * bq
    if t_pad_c != t_pad:
        pad4 = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, t_pad_c - t_pad), (0, 0)))
        qc, doc, Ac = (_pad_t(x, t_pad_c) for x in (qf, dof, Af))
        Lc, Dc = pad4(L), pad4(D_ext)
    else:
        qc, doc, Ac, Lc, Dc = qf, dof, Af, L, D_ext
    q_blk = lambda: pl.BlockSpec(
        (1, ch * bq, lanes), lambda i, jk, jc, ng=ng: (i // ng, jc, i % ng),
        memory_space=pltpu.VMEM)
    k_blk = lambda: pl.BlockSpec(
        (1, bq, lanes), lambda i, jk, jc, ng=ng: (i // ng, jk, i % ng),
        memory_space=pltpu.VMEM)
    stat_q = lambda c: pl.BlockSpec(
        (1, c, ch * bq, 1), lambda i, jk, jc: (i, 0, jc, 0),
        memory_space=pltpu.VMEM)
    out_k = lambda: pl.BlockSpec(
        (1, bq, lanes), lambda i, jk, jc, ng=ng: (i // ng, jk, i % ng),
        memory_space=pltpu.VMEM)
    grid_k = (b * ng, s_pad // bq, t_pad_c // (ch * bq))
    ck, cv = pl.pallas_call(
        functools.partial(_sov_col_kernel, scale=scale, rate=rate,
                          bq=bq, ch=ch, hd=hd, g_sz=g_sz),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_pad, dim), jnp.float32),
            jax.ShapeDtypeStruct((b, s_pad, dim), jnp.float32),
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_blk(),                # q rows for this chunk
            k_blk(),                # k block
            k_blk(),                # v block
            q_blk(),                # do
            q_blk(),                # A
            k_blk(),                # Bc block
            k_blk(),                # C block
            stat_q(g_sz),           # L rows for this chunk
            stat_q(3 * g_sz),       # D_ext rows for this chunk
        ],
        out_specs=(out_k(), out_k()),
    )(seed, qc, kf, vf, doc, Ac, Bf, Cf, Lc, Dc)

    return cq[:, :t], ck[:, :s].astype(q.dtype), cv[:, :s].astype(q.dtype), cdo[:, :t]


def _so_bq(t, s):
    """ONE block size for the whole second-order path (fwd, 1st-order bwd,
    2nd-order kernels): the dropout-mask counter streams are keyed by
    (head, q_block, k_block) TILES, so every pass must tile identically.
    128 keeps the row kernel's fp32 (bq, S) working set inside VMEM."""
    return min(SO_BLOCK_Q, _block_q(max(t, s)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_grads(q, k, v, do, seed, rate, h):
    """The attention backward as a first-class function:
    (q, k, v, dO) -> (dq, dk, dv). Self-contained: recomputes (O, L) with
    the forward kernel so its VJP needs no opaque residuals from callers."""
    bq = _so_bq(q.shape[1], k.shape[1])
    o, L = _fwd_impl(q, k, v, seed, rate, h, bq=bq)
    return _bwd_kernels(q, k, v, do, o, L, seed, rate, h, bq)


def _flash_grads_fwd(q, k, v, do, seed, rate, h):
    out = _flash_grads(q, k, v, do, seed, rate, h)  # recursive re-entry
    return out, (q, k, v, do, seed)


def _flash_grads_bwd(rate, h, res, cts):
    q, k, v, do, seed = res
    A, Bc, C = cts
    b, t, dim = q.shape
    s = k.shape[1]
    hd = dim // h
    g_sz = _group(h, hd)
    ng = h // g_sz
    bq = _so_bq(t, s)
    t_pad = _pad_len(t, bq)
    # recompute L and D at the second-order block size
    o, L = _fwd_impl(q, k, v, seed, rate, h, bq=bq)
    gf = _pad_t(do, t_pad)
    D = _make_D(gf, o, b, t_pad, h, hd, ng, g_sz)
    cq, ck, cv, cdo = _so_vjp_impl(q, k, v, do, A, Bc, C, L, D, seed, rate, h)
    return cq, ck, cv, cdo, None


_flash_grads.defvjp(_flash_grads_fwd, _flash_grads_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flashso(q, k, v, seed, rate, h):
    o, _ = _fwd_impl(q, k, v, seed, rate, h, bq=_so_bq(q.shape[1], k.shape[1]))
    return o[:, : q.shape[1]]


def _flashso_fwd(q, k, v, seed, rate, h):
    out = _flashso(q, k, v, seed, rate, h)  # recursive re-entry
    return out, (q, k, v, seed)


def _flashso_bwd(rate, h, res, g):
    q, k, v, seed = res
    dq, dk, dv = _flash_grads(q, k, v, g, seed, rate, h)
    return dq, dk, dv, None


_flashso.defvjp(_flashso_fwd, _flashso_bwd)


def flash_attention_so_bthd(q, k, v, num_heads, dropout_rate=0.0,
                            dropout_rng=None):
    """Packed-head fused attention with EXPLICIT second-order kernels: the
    backward is itself a custom-vjp function whose VJP runs two Pallas
    kernels implementing the full derivative of the attention backward
    (see the derivation block above). Usable under reverse-over-reverse —
    the meta inner loss — with every pass fused and no (T, S) HBM tensors.
    Third and higher orders are not defined."""
    seed, rate = _seed_rate(dropout_rate, dropout_rng)
    return _flashso(q, k, v, seed, rate, num_heads)
