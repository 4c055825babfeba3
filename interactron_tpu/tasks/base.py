"""Task-model base: builds the Flax modules from a config and exposes the
pure functions the engine jits.

Uniform contract (the TPU-native analog of the reference's duck-typed
forward/predict/get_next_action surface, SURVEY.md §2.5):

  * init(rng) -> (params, frozen): trainable / non-trainable pytrees.
  * grads_and_metrics(params, frozen, batch, rng) -> (grads, metrics):
    whole-batch gradient accumulation (the reference accumulates grads by
    calling .backward() inside forward; here the sum-over-episodes gradient
    is produced directly).
  * predict(params, frozen, episode) -> output dict for the evaluators.

Batch layout (fixed shapes, episode-major):
  frames  (b, s, H, W, 3) float32, ImageNet-normalized
  actions (b, s) int32
  labels  (b, s, M) int32       boxes (b, s, M, 4) cxcywh normalized
  valid   (b, s, M) bool        episode_uid (b,) int32
"""

import functools
from typing import Any

import jax
import jax.numpy as jnp

from interactron_tpu.models.criterion import set_criterion
from interactron_tpu.models.detr import DETR
from interactron_tpu.models.fusion import build_fusion
from interactron_tpu.utils import constants as C


def _resolve_dtype(config):
    name = None
    if hasattr(config.MODEL, "DTYPE"):
        name = config.MODEL.DTYPE
    return {None: jnp.float32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class TaskModel:
    needs_fusion = False
    # True for the meta tasks whose inner loop adapts per-episode conv
    # kernels (drives the im2col default)
    needs_adaptation = False

    def __init__(self, config):
        self.config = config
        self.dtype = _resolve_dtype(config)
        m = config.MODEL
        self.num_classes = m.NUM_CLASSES
        self.img_size = int(m.get("TEST_RESOLUTION", C.IMG_SIZE))
        self.feat_hw = self.img_size // 16
        self.max_boxes = None  # set after detector build
        self.detector = DETR(
            num_classes=m.NUM_CLASSES,
            num_queries=int(m.get("NUM_QUERIES", C.NUM_QUERIES)),
            d_model=int(m.get("D_MODEL", 256)),
            num_heads=int(m.get("DETR_NUM_HEADS", 8)),
            num_encoder_layers=int(m.get("NUM_ENCODER_LAYERS", 6)),
            num_decoder_layers=int(m.get("NUM_DECODER_LAYERS", 6)),
            ff_dim=int(m.get("DETR_FF_DIM", 2048)),
            backbone=m.get("BACKBONE", "resnet50"),
            # the reference hardcodes 0.1 via build_transformer's default
            # (detr_models/transformer.py:20); exposed for the trainer
            # lockstep differential (dropout must be off on both sides)
            dropout_rate=float(m.get("DETR_DROPOUT", 0.1)),
            dtype=self.dtype,
        )
        self.max_boxes = min(C.MAX_BOXES, self.detector.num_queries)
        self.fusion = build_fusion(config, dtype=self.dtype) if self.needs_fusion else None
        # remat clones share the exact param structure; the train paths use
        # them so per-layer activations are recomputed in the backward pass.
        # TRAINER.REMAT is a MEMORY knob (off by default): with
        # MODEL.CHUNKED_ATTENTION it fits INNER_BATCH=8 on a 16G chip, but
        # the recompute under the twice-differentiated inner loop costs ~2.7x
        # step time (measured 5.7 vs 15.3 eps/s) — INNER_BATCH=4 without
        # remat is the throughput configuration.
        self.use_remat = (
            bool(config.TRAINER.get("REMAT", False)) if hasattr(config, "TRAINER") else False
        )
        self.detector_remat = self.detector.clone(remat=True)
        self.fusion_remat = self.fusion.clone(remat=True) if self.fusion is not None else None
        self.cost_class = float(m.get("SET_COST_CLASS", 1.0))
        self.cost_bbox = float(m.get("SET_COST_BBOX", 5.0))
        self.cost_giou = float(m.get("SET_COST_GIOU", 2.0))
        self.adaptive_lr = float(m.get("ADAPTIVE_LR", 1e-3))
        inner = m.get("INNER_DTYPE", None)
        self.inner_dtype = (
            {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[inner]
            if inner is not None
            else (self.dtype if self.dtype != jnp.float32 else None)
        )
        self.inner_batch = int(config.TRAINER.get("INNER_BATCH", 1)) if hasattr(config, "TRAINER") else 1
        if m.get("CHUNKED_ATTENTION", False):
            from interactron_tpu.ops.attention import set_chunked_attention

            set_chunked_attention(True)
        # Production gate for the Pallas flash/second-order attention kernels
        # (ops/flash_attention.py). Default ON when running on real TPU
        # hardware so train.py/evaluate.py execute the same kernels bench.py
        # measures; OFF elsewhere (the kernels only run in slow interpret
        # mode off-TPU). MODEL.FLASH_ATTENTION overrides either way.
        from interactron_tpu.ops.attention import set_flash_attention

        flash_default = jax.default_backend() == "tpu"
        set_flash_attention(bool(m.get("FLASH_ATTENTION", flash_default)))
        # Dropout-mask PRNG: threefry2x32 (jax's default) computes the
        # stream on the VPU — profiled 21.9 ms/step of `lt`+threefry work
        # just generating the (5,8,361,361) DETR attention masks at
        # inner_batch=4. The TPU hardware RNG ("rbg") generates the same
        # masks ~10x cheaper; dropout needs no cryptographic stream. Still
        # fully deterministic given the seed. MODEL.PRNG_IMPL overrides.
        impl = str(m.get("PRNG_IMPL", "rbg" if flash_default else "threefry2x32"))
        jax.config.update("jax_default_prng_impl", impl)
        # Without TRAINER.REMAT the dropout masks are saved residuals
        # (~16 ms/step of (5,8,361,361) DETR attention-mask traffic at
        # inner_batch=4); REMAT_DROPOUT checkpoints just the mask-apply so
        # the backward regenerates them from the key (cheap under rbg).
        from interactron_tpu.models.layers import set_remat_dropout

        set_remat_dropout(bool(m.get("REMAT_DROPOUT", True)))
        # im2col conv formulation (models/layers.py): measured SLOWER for
        # the full predict step when applied to EVERY trainable conv (38 vs
        # 91 eps/s — the patch HBM traffic dominates), so global use stays
        # opt-in...
        from interactron_tpu.models.layers import set_im2col_conv

        set_im2col_conv(bool(m.get("IM2COL_CONV", False)))
        # ...and scoping it to ONLY the adapted fast-weight passes
        # (per-episode conv kernels, which lower to ~20 TF/s batch-grouped
        # convolutions) also measured slower on v5e: predict 97.1 vs 101.4
        # (frame-0 detect) and train 13.8 vs 24.4 eps/s (supervisor +
        # detector passes) — the 9x patch HBM traffic and its backward
        # transpose cost more than the grouped lowering. The scope hook
        # (layers.im2col_convs(), MODEL.ADAPTED_IM2COL) stays for future
        # hardware where the balance differs.
        self.adapted_im2col = bool(m.get("ADAPTED_IM2COL", False))
        # Shifted-GEMM formulation for the same fast-weight passes
        # (layers.episode_shift_convs): stride-1 3x3 convs become 9 shifted
        # batched GEMMs, eliminating XLA's per-episode weight transpose +
        # grouped-conv lowering (3.2x at the F=1 layer4 shape,
        # tools/bench_econv.py). Default ON; MODEL.SHIFT_CONV=False reverts
        # to the grouped lowering, ADAPTED_IM2COL (if set) takes precedence.
        self.adapted_shift9 = bool(m.get("SHIFT_CONV", True)) and not self.adapted_im2col
        # Experiment knob: also trace the INNER (pre-adaptation) pass with
        # shifted-GEMM convs. The inner pass has shared weights, but its
        # derivative chain is where the remaining batch-grouped convolutions
        # live (per-episode dW outputs bf16[3,3,512,E,512] profiled in the
        # train step) — as GEMMs every AD order stays a batched dot.
        self.inner_shift9 = bool(m.get("INNER_SHIFT_CONV", False))

    def _econv_scope(self):
        """Context manager for the fast-weight detector passes (per-episode
        conv kernels): the measured-best conv formulation on this backend."""
        from interactron_tpu.models.layers import episode_shift_convs, im2col_convs

        if self.adapted_im2col:
            return im2col_convs()
        if self.adapted_shift9:
            return episode_shift_convs()
        import contextlib

        return contextlib.nullcontext()

    def _inner_conv_scope(self):
        """Conv formulation for the inner (pre-adaptation) detector pass —
        shifted GEMMs when MODEL.INNER_SHIFT_CONV is set (see __init__)."""
        from interactron_tpu.models.layers import episode_shift_convs

        if self.inner_shift9:
            return episode_shift_convs()
        import contextlib

        return contextlib.nullcontext()

    # ------------------------------------------------------------------ init

    def init(self, rng):
        kd, kf = jax.random.split(rng)
        dummy = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.float32)
        # jit the module inits: eager Flax init dispatches each param op
        # separately, which through the axon tunnel pays a full RTT per op
        # (profiled ~4 min for the DETR stack); one compiled program runs in
        # milliseconds and lands in the persistent compilation cache
        dvars = jax.jit(
            lambda k, x: self.detector.init({"params": k}, x, deterministic=True)
        )(kd, dummy)
        params = {"detector": dvars["params"]}
        frozen = {"detector": dvars.get("frozen", {})}
        if self.fusion is not None:
            nq = self.detector.num_queries
            fusion_in = {
                "embedded_memory_features": jnp.zeros(
                    (1, C.NUM_FRAMES, self.feat_hw * self.feat_hw, self.detector.d_model),
                    jnp.float32,
                ),
                "box_features": jnp.zeros(
                    (1, C.NUM_FRAMES, nq, self.detector.d_model), jnp.float32
                ),
                "pred_logits": jnp.zeros(
                    (1, C.NUM_FRAMES, nq, self.num_classes + 1), jnp.float32
                ),
                "pred_boxes": jnp.zeros((1, C.NUM_FRAMES, nq, 4), jnp.float32),
            }
            fvars = jax.jit(
                lambda k, fin: self.fusion.init({"params": k}, fin, deterministic=True)
            )(kf, fusion_in)
            params["fusion"] = fvars["params"]
        weights = self.config.MODEL.get("WEIGHTS")
        if weights:
            import os

            if os.path.exists(weights):
                # reference loads pretrained detector weights at model
                # construction (models/interactron.py:23)
                from interactron_tpu.utils.checkpoint import load_pretrained

                params, frozen = load_pretrained(weights, params, frozen)
            else:
                import warnings

                warnings.warn(f"MODEL.WEIGHTS not found, random init: {weights}")
        return params, frozen

    # ------------------------------------------------------------- module fns

    def detr_apply(self, det_params, frozen, images, *, deterministic=True,
                   decoder_deterministic=None, rng=None, stage="all", remat=False):
        variables = {"params": det_params, "frozen": frozen["detector"]}
        rngs = None if deterministic and (decoder_deterministic in (None, True)) else {"dropout": rng}
        module = self.detector_remat if (remat and self.use_remat) else self.detector
        return module.apply(
            variables,
            images,
            deterministic=deterministic,
            decoder_deterministic=decoder_deterministic,
            stage=stage,
            rngs=rngs,
        )

    def frozen_prefix(self, frozen, images):
        """Frozen stem+layer1 features — pure function of the input, shared
        across the meta loop's multiple detector passes."""
        return self.detector.apply(
            {"params": {}, "frozen": frozen["detector"]}, images, stage="frozen_prefix"
        )

    def fusion_apply(self, fus_params, detr_out, *, deterministic=True, rng=None,
                     remat=False):
        """detr_out: per-frame outputs (s, ...) -> fusion with batch dim 1."""
        x = {
            "embedded_memory_features": detr_out["embedded_memory_features"][None],
            "box_features": detr_out["box_features"][None],
            "pred_logits": detr_out["pred_logits"][None],
            "pred_boxes": detr_out["pred_boxes"][None],
        }
        rngs = None if deterministic else {"dropout": rng}
        module = self.fusion_remat if (remat and self.use_remat) else self.fusion
        return module.apply({"params": fus_params}, x, deterministic=deterministic, rngs=rngs)

    def criterion(self, outputs, targets, **kw):
        kw.setdefault("num_classes", self.num_classes)
        kw.setdefault("cost_class", self.cost_class)
        kw.setdefault("cost_bbox", self.cost_bbox)
        kw.setdefault("cost_giou", self.cost_giou)
        return set_criterion(outputs, targets, **kw)

    # -------------------------------------------------------------- utilities

    @staticmethod
    def episode_targets(batch, i=None):
        """Slice targets for one episode (s frames as the criterion batch)."""
        sel = (lambda x: x) if i is None else (lambda x: x[i])
        return {
            "labels": sel(batch["labels"]),
            "boxes": sel(batch["boxes"]),
            "valid": sel(batch["valid"]),
        }

    @staticmethod
    def rename(losses, prefix):
        """k.replace('loss', f'loss_{prefix}') — matching the reference's
        string surgery incl. leaving *_error keys untouched
        (interactron.py:142-147)."""
        return {k.replace("loss", f"loss_{prefix}"): v for k, v in losses.items()}


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_zeros_like(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


# Unrolled-microbatch mode: execution keeps the lax.scan (measured equal or
# ~1% faster than straight-line at num_micro=2 on v5e — the while's 31.8 ms
# of profiled self-time is double-buffered DMA, not recoverable overhead),
# but XLA's cost analysis does NOT multiply while-body flops by the trip
# count, which silently halved every reported train MFU (0.094 reported vs
# 0.187 real at num_micro=2). bench.py flips this flag around its
# cost-analysis lowering so the flop count sees every microbatch.
_FORCE_UNROLL = False


def set_unroll_microbatches(enabled: bool):
    global _FORCE_UNROLL
    _FORCE_UNROLL = bool(enabled)


def scan_microbatches(fn, batch, num_micro, carry_init):
    """Split the episode axis into `num_micro` chunks and scan `fn` over
    them, accumulating (grads, metrics) sums in the carry."""
    b = batch["frames"].shape[0]
    assert b % num_micro == 0, f"batch {b} not divisible by {num_micro} microbatches"
    mb = b // num_micro
    stacked = jax.tree_util.tree_map(
        lambda x: x.reshape(num_micro, mb, *x.shape[1:]), batch
    )

    if _FORCE_UNROLL and num_micro <= 8:
        carry = carry_init
        for i in range(num_micro):
            carry = fn(carry, jax.tree_util.tree_map(lambda x: x[i], stacked))
        return carry

    def body(carry, mb_batch):
        return fn(carry, mb_batch), None

    carry, _ = jax.lax.scan(body, carry_init, stacked)
    return carry
