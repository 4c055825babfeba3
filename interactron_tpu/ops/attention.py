"""Shared multi-head attention primitive.

One attention core serves the DETR encoder/decoder (T<=361) and the fusion
GPT (T=2060). Sequence lengths are small, so the default implementation lets
XLA fuse the (B, H, T, S) einsum chain; an optional Pallas flash-attention
path (ops/flash_attention.py) can be enabled for the fusion-sized problems
where keeping the softmax in VMEM wins.

Softmax is always computed in float32 regardless of the compute dtype.
"""

import jax
import jax.numpy as jnp

import contextlib

# Module-level switches so benchmarks/configs can flip implementations.
_USE_PALLAS = False
_FLASH_SUPPRESSED = False
_USE_CHUNKED = False
_CHUNK_BLOCK = 256
# dispatch thresholds (module-level so tests can lower them to exercise the
# kernel paths on tiny shapes; FLASH_MIN_HD/FLASH_MIN_S env vars override
# for on-chip sweeps, like FLASH_BLOCK_Q in ops/flash_attention.py)
import os as _os

# Defaults re-measured round 5 on v5e with the packed-head + merged-backward
# kernel generation: pulling the DETR ENCODER (t=s=361, hd=32 packed
# 4-per-group) into the kernels now WINS on both legs — predict 108.1 vs
# 107.1 eps/s, train 30.8 vs 28.9 (the round-3 measurement that kept the
# encoder out, 81.1 vs 83.1, predates the merged backward). The t-gate keeps
# the decoder's t=50 queries (61% q-block padding) on the XLA chain.
_FLASH_MIN_HD = int(_os.environ.get("FLASH_MIN_HD", 32))
_FLASH_MIN_S = int(_os.environ.get("FLASH_MIN_S", 256))
_FLASH_MIN_T = int(_os.environ.get("FLASH_MIN_T", 128))
# Separate (laxer) gates for the TWICE-DIFFERENTIATED context: there the
# alternative is the materializing XLA chain replayed across every AD order
# (profiled ~25-30 ms/step of f32 (mb*5, 8, 361, 361) softmax traffic for
# the DETR encoder at inner_batch=4), not the well-fused first-order chain
# the FLASH_MIN_* defaults were tuned against. Defaults pull t=s=361-sized
# problems (DETR/ViT encoder) into the second-order kernels while leaving
# the decoder's t=50 queries (61% q-block padding) materialized.
_FLASH_SO_MIN_HD = int(_os.environ.get("FLASH_SO_MIN_HD", 32))
_FLASH_SO_MIN_S = int(_os.environ.get("FLASH_SO_MIN_S", 256))
_FLASH_SO_MIN_T = int(_os.environ.get("FLASH_SO_MIN_T", 128))


def set_flash_attention(enabled: bool):
    global _USE_PALLAS
    _USE_PALLAS = bool(enabled)


def set_chunked_attention(enabled: bool):
    """Opt-in blockwise-scan fallback for big attention that cannot take the
    Pallas kernel (any-order differentiable, O(block x S) memory). Slightly
    slower than the materializing XLA path when everything fits HBM, so it
    is a memory knob (MODEL.CHUNKED_ATTENTION), not a default."""
    global _USE_CHUNKED
    _USE_CHUNKED = bool(enabled)


@contextlib.contextmanager
def flash_disabled():
    """Trace-time guard: the fused kernel's custom VJP is first-order only,
    so code that gets differentiated TWICE (the meta inner loss — the
    supervisor backprops through its gradient) must trace with the
    XLA attention instead."""
    global _FLASH_SUPPRESSED
    prev = _FLASH_SUPPRESSED
    _FLASH_SUPPRESSED = True
    try:
        yield
    finally:
        _FLASH_SUPPRESSED = prev


def packed_attention(
    q,
    k,
    v,
    num_heads,
    *,
    key_padding_mask=None,
    dropout_rate=0.0,
    deterministic=True,
    dropout_rng=None,
):
    """Multi-head attention over PACKED head layout.

    Args:
      q: (B, T, H*Dh) — the raw q-projection output; no head transposes.
      k, v: (B, S, H*Dh)
      num_heads: H.

    Every path here avoids the (B,H,T,D) layout entirely: the flash kernel
    reads the packed arrays directly (lane-sliced head groups) and the XLA
    paths contract via bthd einsums, which XLA folds into the GEMM layouts
    instead of emitting physical transposes.
    """
    b, t, dim = q.shape
    s = k.shape[1]
    h = num_heads
    hd = dim // h
    in_dtype = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    # Gate: fusion-sized (S=2060, hd=64) AND encoder-sized (S=361, hd=32
    # packed 4 heads/group) problems; only short-query work (the decoder's
    # t=50) stays on the XLA-fused einsum chain. See the FLASH_MIN_*
    # defaults above for the round-5 measurements behind this.
    if _USE_PALLAS and key_padding_mask is None:
        rate = 0.0 if deterministic else float(dropout_rate)
        if (
            not _FLASH_SUPPRESSED
            and hd >= _FLASH_MIN_HD
            and s >= _FLASH_MIN_S
            and t >= _FLASH_MIN_T
        ):
            from interactron_tpu.ops.flash_attention import flash_attention_bthd

            return flash_attention_bthd(
                q, k, v, h, dropout_rate=rate, dropout_rng=dropout_rng
            ).astype(in_dtype)
        if (
            _FLASH_SUPPRESSED
            and hd >= _FLASH_SO_MIN_HD
            and s >= _FLASH_SO_MIN_S
            and t >= _FLASH_SO_MIN_T
        ):
            # Twice-differentiated context (the meta inner loss): explicit
            # second-order kernels — the backward is a custom-vjp function
            # whose own VJP is two Pallas kernels, so forward, first-order
            # backward AND the second-order backward all run fused with no
            # (T, S) HBM tensors. (The differentiable-bwd hybrid and the jnp
            # chunked path remain as fallbacks; the materializing XLA path
            # was the previous default at 898 ms/step.) The gates are laxer
            # than the first-order ones: here the alternative replays the
            # materializing chain at every AD order, so DETR/ViT-encoder
            # sizes (t=s=361, hd=32 packed 4-per-group) win too.
            from interactron_tpu.ops.flash_attention import flash_attention_so_bthd

            return flash_attention_so_bthd(
                q, k, v, h, dropout_rate=rate, dropout_rng=dropout_rng
            ).astype(in_dtype)

    qh = q.reshape(b, t, h, hd)
    kh = k.reshape(b, s, h, hd)
    vh = v.reshape(b, s, h, hd)

    # gate on TOTAL logits elements: catches both the fusion transformer
    # (8*2060^2 per head-batch) and the DETR encoder (5*8*361^2 per episode
    # — the meta step vmaps episodes, so the traced batch here is 5 frames),
    # while leaving small problems (decoder self/cross) materialized
    if _USE_CHUNKED and b * h * t * s >= 4 * 1024 * 1024 and key_padding_mask is None:
        return _chunked_attention_bthd(
            qh, kh, vh, scale,
            dropout_rate=dropout_rate,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
        ).reshape(b, t, dim).astype(in_dtype)

    logits = jnp.einsum(
        "bthd,bshd->bhts", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if key_padding_mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
        logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        # remat'd mask-apply (models/layers.py::dropout_apply): the autodiff
        # residual is the f32 probs (already saved for the softmax backward)
        # plus the key — the mask and the casted copy regenerate in backward
        from interactron_tpu.models.layers import dropout_apply

        probs = dropout_apply(probs, dropout_rng, dropout_rate, in_dtype)
    else:
        probs = probs.astype(in_dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, vh)
    return out.reshape(b, t, dim)


def _chunked_attention_bthd(q, k, v, scale, *, dropout_rate=0.0,
                            deterministic=True, dropout_rng=None, block=None):
    """Blockwise bthd attention: an UNROLLED loop of per-q-block
    jax.checkpoint regions, so the (T, S) probability tensor never
    materializes — at ANY differentiation order. (A lax.scan formulation
    fails the second derivative: the scan transpose stacks the reverse
    body's recomputed probs across steps, resurrecting the full (T, S)
    buffer — measured 3x1.13 GB inside the meta inner loop. jax.checkpoint
    regions compose under repeated differentiation: each level re-derives
    the block from its inputs.) No head transposes: q/k/v and the output
    stay (B, T/S, H, Dh)."""
    block = block if block is not None else _CHUNK_BLOCK
    b, t, h, hd = q.shape
    t_pad = -(-t // block) * block
    qp = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0))) if t_pad != t else q
    n_blocks = t_pad // block
    use_drop = dropout_rate > 0.0 and not deterministic and dropout_rng is not None
    keys = jax.random.split(
        dropout_rng if use_drop else jax.random.PRNGKey(0), n_blocks
    )

    @jax.checkpoint
    def one_block(q_blk, k, v, key):
        logits = jnp.einsum(
            "bthd,bshd->bhts", q_blk, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        if use_drop:
            keep = jax.random.bernoulli(key, 1.0 - dropout_rate, probs.shape)
            probs = probs * keep / (1.0 - dropout_rate)
        return jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v)

    outs = [
        one_block(qp[:, i * block : (i + 1) * block], k, v, keys[i])
        for i in range(n_blocks)
    ]
    o = outs[0] if n_blocks == 1 else jnp.concatenate(outs, axis=1)
    return o[:, :t]


def dot_product_attention(
    q,
    k,
    v,
    *,
    key_padding_mask=None,
    dropout_rate=0.0,
    deterministic=True,
    dropout_rng=None,
):
    """Scaled dot-product attention.

    Args:
      q: (B, H, T, D)
      k, v: (B, H, S, D)
      key_padding_mask: optional (B, S) bool, True = PADDED (masked out),
        matching the torch `key_padding_mask` convention used by the
        reference (detr_models/transformer.py:154).
      dropout_rate: attention-probability dropout (gpt.py:51,
        detr transformer layers).

    Returns:
      (B, H, T, D) in q.dtype.
    """
    in_dtype = q.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))

    # Pallas fused kernel (supports in-kernel prob dropout): only worth it
    # when the attention area is large enough that the HBM logits buffer
    # dominates (the fusion transformer's 2060-token problems). Routing the
    # DETR-sized problems (d=32, S=361) through it was measured SLOWER
    # (66.4 vs 69.6 eps/s predict): the d 32->64 pad doubles MXU work and
    # XLA already fuses the small (361,361) softmax chain well.
    if (
        _USE_PALLAS
        and not _FLASH_SUPPRESSED
        and key_padding_mask is None
        and q.shape[-1] >= 64
        and k.shape[2] >= 1024
    ):
        from interactron_tpu.ops.flash_attention import flash_attention

        rate = 0.0 if deterministic else float(dropout_rate)
        out = flash_attention(q, k, v, dropout_rate=rate, dropout_rng=dropout_rng)
        return out.astype(in_dtype)

    # Large problems that cannot take the Pallas kernel (e.g. the meta inner
    # loss, which is differentiated twice) use a chunked-scan formulation:
    # q blocks stream through a rematerialized scan body, so the (T, S)
    # probability tensor never materializes in HBM and AD works to any order.
    if _USE_CHUNKED and q.shape[2] * k.shape[2] >= 1024 * 1024 and key_padding_mask is None:
        return _chunked_attention(
            q, k, v, scale,
            dropout_rate=dropout_rate,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
        ).astype(in_dtype)

    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_padding_mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
        logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        from interactron_tpu.models.layers import dropout_apply

        probs = dropout_apply(probs, dropout_rng, dropout_rate, in_dtype)
    else:
        probs = probs.astype(in_dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v)


def _chunked_attention(q, k, v, scale, *, dropout_rate=0.0, deterministic=True,
                       dropout_rng=None, block=None):
    """Blockwise attention via lax.scan with a rematerialized body: peak
    memory O(block x S) instead of O(T x S), differentiable to any order
    (unlike the Pallas custom-VJP kernel)."""
    block = block if block is not None else _CHUNK_BLOCK
    b, h, t, d = q.shape
    t_pad = -(-t // block) * block
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))) if t_pad != t else q
    qb = qp.reshape(b, h, t_pad // block, block, d).transpose(2, 0, 1, 3, 4)
    use_drop = dropout_rate > 0.0 and not deterministic and dropout_rng is not None
    keys = jax.random.split(
        dropout_rng if use_drop else jax.random.PRNGKey(0), t_pad // block
    )

    @jax.checkpoint
    def body(carry, xs):
        q_blk, key = xs  # (b, h, block, d)
        logits = jnp.einsum(
            "bhtd,bhsd->bhts", q_blk, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        if use_drop:
            keep = jax.random.bernoulli(key, 1.0 - dropout_rate, probs.shape)
            probs = probs * keep / (1.0 - dropout_rate)
        out = jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v)
        return carry, out

    _, ob = jax.lax.scan(body, None, (qb, keys))
    o = ob.transpose(1, 2, 0, 3, 4).reshape(b, h, t_pad, d)
    return o[:, :, :t]
