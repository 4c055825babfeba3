"""Adaptive meta-learning tasks: `interactron_random` and full `interactron`.

Per-episode semantics follow interactron.py:61-151 / interactron_random.py:57-132
exactly, re-expressed functionally (SURVEY.md §3.2):

  supervisor (second-order) path — detector params STOPPED (the reference's
  detach_parameters):
      g     = grad_det ||fusion.loss(detr(sg(det), frames))||2
      fast2 = sg(det) - clip(lr*g, ±0.01)
      L_sup = criterion(detr(fast2, frames), all 5 labels)  [+ policy CE]
      -> d L_sup / d fusion flows through g (create_graph=True analog)

  detector (first-order) path — g STOPPED (detach_gradients):
      fast1 = det - clip(lr*sg(g), ±0.01)
      L_det = criterion(detr(fast1, frame[ridx]), labels[ridx]), ridx ~ U{0..4}

  policy supervision (interactron only, interactron.py:105-123): the frame-0
  ground-truth loss of the adapted detector is the path reward; a
  DEVICE-resident prefix tree (utils/device_path_storage.py — the axon PJRT
  backend cannot run host callbacks) returns best-path labels between
  jax.vjp's forward and backward, so the label lookup sees the current
  episode's reward (the reference's serial ordering, exact at
  inner_batch=1) while the CE gradient enters through the action-logits
  cotangent. The path state threads through the train step as a donated
  buffer and persists in checkpoints.

Gradients accumulate as sums over episodes (the reference backwards per
episode), scanned over microbatches with the episode body rematerialized.
"""

from contextlib import nullcontext as _nullcontext
from functools import partial

import jax
import jax.numpy as jnp

from interactron_tpu.meta import (
    clipped_sgd_step,
    learned_loss_value,
    merge_inner,
    split_inner,
)
from interactron_tpu.tasks.base import (
    TaskModel,
    scan_microbatches,
    tree_add,
    tree_zeros_like,
)
from interactron_tpu.utils import constants as C
from interactron_tpu.utils.device_path_storage import init_path_state, update_and_label

_SUP_KEYS = ["loss_ce", "loss_bbox", "loss_giou", "cardinality_error", "class_error"]


def _weighted(losses):
    """ce + 5*giou + 2*bbox (interactron.py:108/121/133)."""
    return losses["loss_ce"] + 5.0 * losses["loss_giou"] + 2.0 * losses["loss_bbox"]


class InteractronRandomTask(TaskModel):
    needs_fusion = True
    needs_adaptation = True
    with_policy = False

    # default row count for a transient path state when the caller does not
    # thread a persistent one (the Trainer always does)
    default_path_rows = 4096

    def init_path_state(self, num_episodes):
        return init_path_state(num_episodes)

    # --------------------------------------------------------------- episode

    def _episode_fwd(self, params, frozen, ep, key, train):
        det_p = params["detector"]
        fus_p = params["fusion"]
        kr, k1, k2, k3, k4 = jax.random.split(key, 5)
        ridx = jax.random.randint(kr, (), 0, C.NUM_FRAMES)

        # The inner loop adapts only the subset the reference's
        # get_parameters collects: the MHA q/k/v projections stay STATIC and
        # keep their ORIGINAL (non-detached) params in every pass, so outer
        # supervisor gradients flow into them (meta.py::_inner_static).
        adapted_p, static_p = split_inner(det_p)
        cast = (
            (lambda t: t)
            if self.inner_dtype is None
            else (lambda t: jax.tree_util.tree_map(
                lambda p: p.astype(self.inner_dtype), t))
        )
        # differentiate at reduced-precision params: the forward casts
        # weights to the compute dtype anyway, and rooting the grad there
        # makes every cotangent/grad tensor bf16 (halves the dominant HBM
        # traffic of the meta step)
        adapted_base = cast(jax.lax.stop_gradient(adapted_p))
        static_c = cast(static_p)  # NOT stopped — reference leaks outer grads

        # frozen stem+layer1 features are identical across all detector
        # passes in this episode — compute once (pure frozen function)
        prefix = self.frozen_prefix(frozen, ep["frames"])

        def inner(a):
            # this closure is differentiated twice (the supervisor backprops
            # through its gradient) — the first-order-only fused attention
            # kernel must not trace here during training
            from interactron_tpu.ops.attention import flash_disabled

            dp = merge_inner(a, static_c)
            with flash_disabled() if train else _nullcontext():
                with self._inner_conv_scope():
                    out = self.detr_apply(
                        dp, frozen, prefix, deterministic=not train, rng=k1,
                        stage="from_prefix", remat=train,
                    )
                fus = self.fusion_apply(
                    fus_p, out, deterministic=not train, rng=k2, remat=train
                )
            return learned_loss_value(fus), fus

        (_, fus_out), g = jax.value_and_grad(inner, has_aux=True)(adapted_base)

        # ---- supervisor (second-order) path
        fast2 = merge_inner(
            clipped_sgd_step(adapted_base, g, self.adaptive_lr), static_c
        )
        # fast-weight passes: conv kernels are per-episode under the vmap,
        # so the direct conv lowers to a batch-grouped convolution plus a
        # per-episode weight transpose — the scope swaps in the measured-best
        # formulation (shifted GEMMs by default, tasks/base.py::_econv_scope)
        with self._econv_scope():
            post = self.detr_apply(
                fast2, frozen, prefix, deterministic=not train, rng=k3,
                stage="from_prefix", remat=train,
            )
        targets = {"labels": ep["labels"], "boxes": ep["boxes"], "valid": ep["valid"]}
        sup_losses = self.criterion(
            {"pred_logits": post["pred_logits"], "pred_boxes": post["pred_boxes"]},
            targets,
            per_frame=True,
        )
        pf = sup_losses.pop("_per_frame")
        sup_loss = _weighted(sup_losses)

        # frame-0 ground-truth loss of the adapted detector = policy reward
        # (interactron.py:106-110). Reuses the supervisor pass's frame-0
        # criterion pieces — bit-identical to a separate criterion call on
        # post[0:1] (same outputs, same targets, same assignment) without a
        # second Hungarian solve.
        nb0 = jnp.maximum(pf["num_boxes"][0], 1.0)
        reward = jax.lax.stop_gradient(
            pf["ce_num"][0] / pf["ce_den"][0]
            + 5.0 * (pf["giou_sum"][0] / nb0)
            + 2.0 * (pf["bbox_sum"][0] / nb0)
        )

        # ---- detector (first-order) path
        fast1 = merge_inner(
            clipped_sgd_step(
                adapted_p, jax.lax.stop_gradient(g), self.adaptive_lr,
                dtype=self.inner_dtype,
            ),
            static_c,
        )
        fr = jax.lax.dynamic_slice_in_dim(prefix, ridx, 1, axis=0)
        tgt_r = {
            k: jax.lax.dynamic_slice_in_dim(v, ridx, 1, axis=0) for k, v in targets.items()
        }
        with self._econv_scope():
            det_out = self.detr_apply(
                fast1, frozen, fr, deterministic=not train, rng=k4,
                stage="from_prefix", remat=train,
            )
        det_losses = self.criterion(
            {"pred_logits": det_out["pred_logits"], "pred_boxes": det_out["pred_boxes"]}, tgt_r
        )
        det_loss = _weighted(det_losses)

        main = sup_loss + det_loss
        aux = {
            "reward": reward,
            "sup": jax.lax.stop_gradient(sup_losses),
            "det": jax.lax.stop_gradient(det_losses),
        }
        action_logits = fus_out["actions"][0]  # (4, 4)
        return main, action_logits, aux

    # ----------------------------------------------------------------- grads

    def _mb_fwd(self, params, frozen, mb_batch, keys, train):
        def one(frames, labels, boxes, valid, key):
            ep = {"frames": frames, "labels": labels, "boxes": boxes, "valid": valid}
            return self._episode_fwd(params, frozen, ep, key, train)

        mains, logits, aux = jax.vmap(one)(
            mb_batch["frames"], mb_batch["labels"], mb_batch["boxes"], mb_batch["valid"], keys
        )
        return (jnp.sum(mains), logits), aux

    def _policy_piece(self, logits, aux, mb_batch, path_state):
        """Returns (loss_path per-episode, action-logits cotangent, new path
        state). The best-path labels come from the DEVICE-resident prefix
        tree (utils/device_path_storage.py): add_path with this episode's
        frame-0 adaptation loss, then read the best actions — the reference
        ordering (interactron.py:111-118) with zero host traffic. The random
        variant has no policy loss."""
        mb = logits.shape[0]
        if not self.with_policy:
            return jnp.zeros((mb,)), jnp.zeros_like(logits), path_state
        path_state, best = update_and_label(
            path_state,
            mb_batch["episode_uid"],
            mb_batch["actions"][:, : C.NUM_ACTIONS],
            aux["reward"],
        )
        logp = jax.nn.log_softmax(logits, axis=-1)  # (mb, 4, 4)
        onehot = jax.nn.one_hot(best, C.NUM_ACTIONS)
        loss_path = -jnp.sum(onehot * logp, axis=(1, 2)) / C.NUM_ACTIONS
        ce_grad = (jax.nn.softmax(logits, axis=-1) - onehot) / C.NUM_ACTIONS
        return loss_path, ce_grad, path_state

    def _metric_zeros(self):
        z = jnp.zeros(())
        m = {f"sup_{k}": z for k in _SUP_KEYS}
        m.update({f"det_{k}": z for k in _SUP_KEYS})
        m.update({"total_loss": z, "policy_reward": z, "loss_path": z})
        return m

    def _accumulate_metrics(self, m_acc, aux, loss_path, total):
        for k in _SUP_KEYS:
            m_acc[f"sup_{k}"] = m_acc[f"sup_{k}"] + jnp.sum(aux["sup"][k])
            m_acc[f"det_{k}"] = m_acc[f"det_{k}"] + jnp.sum(aux["det"][k])
        m_acc["policy_reward"] = m_acc["policy_reward"] + jnp.sum(aux["reward"])
        m_acc["loss_path"] = m_acc["loss_path"] + jnp.sum(loss_path)
        m_acc["total_loss"] = m_acc["total_loss"] + total
        return m_acc

    def _finalize_metrics(self, m, b):
        out = {}
        for k in _SUP_KEYS:
            out[k.replace("loss", "loss_detector") if "loss" in k else k] = m[f"det_{k}"] / b
        for k in _SUP_KEYS:
            out[k.replace("loss", "loss_supervisor") if "loss" in k else k] = m[f"sup_{k}"] / b
        if self.with_policy:
            out["loss_supervisor_path"] = m["loss_path"] / b
            out["policy_reward"] = m["policy_reward"] / b
        out["total_loss"] = m["total_loss"] / b
        return out

    def grads_and_metrics(self, params, frozen, batch, rng, path_state=None,
                          train=True):
        """`train=False` mirrors the reference's eval-mode forward (dropout
        off, grads still produced — its test epoch runs the same backward
        path with model.train(False))."""
        b = batch["frames"].shape[0]
        mb = max(1, self.inner_batch)
        num_micro = max(1, b // mb)
        if path_state is None and self.with_policy:
            # transient state (fresh tree each step) — the Trainer threads a
            # persistent one; bench/dryrun tolerate first-visit labels
            path_state = init_path_state(self.default_path_rows)
        if path_state is None:
            path_state = {}

        def step(carry, mb_batch):
            g_acc, m_acc, key, pstate = carry
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, mb_batch["frames"].shape[0])
            f = lambda p: self._mb_fwd(p, frozen, mb_batch, keys, train)
            (loss_sum, logits), vjp_fn, aux = jax.vjp(f, params, has_aux=True)
            loss_path, ce_grad, pstate = self._policy_piece(logits, aux, mb_batch, pstate)
            (g,) = vjp_fn((jnp.ones(()), ce_grad))
            total = loss_sum + jnp.sum(loss_path)
            m_acc = self._accumulate_metrics(m_acc, aux, loss_path, total)
            return (tree_add(g_acc, g), m_acc, key, pstate)

        g, m, _, path_state = scan_microbatches(
            step, batch, num_micro,
            (tree_zeros_like(params), self._metric_zeros(), rng, path_state),
        )
        return g, self._finalize_metrics(m, b), path_state

    def eval_metrics(self, params, frozen, batch, rng, path_state=None):
        """Test-epoch losses (dropout off, path storage still updated —
        interactron_trainer.py:140-141 runs the same forward)."""
        b = batch["frames"].shape[0]
        mb = max(1, self.inner_batch)
        num_micro = max(1, b // mb)
        if path_state is None and self.with_policy:
            path_state = init_path_state(self.default_path_rows)
        if path_state is None:
            path_state = {}

        def step(carry, mb_batch):
            _, m_acc, key, pstate = carry
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, mb_batch["frames"].shape[0])
            (loss_sum, logits), aux = self._mb_fwd(params, frozen, mb_batch, keys, False)
            loss_path, _, pstate = self._policy_piece(logits, aux, mb_batch, pstate)
            total = loss_sum + jnp.sum(loss_path)
            m_acc = self._accumulate_metrics(m_acc, aux, loss_path, total)
            return (carry[0], m_acc, key, pstate)

        _, m, _, path_state = scan_microbatches(
            step, batch, num_micro, (jnp.zeros(()), self._metric_zeros(), rng, path_state)
        )
        return self._finalize_metrics(m, b), path_state

    # ------------------------------------------------------------ prediction

    def predict(self, params, frozen, episode):
        """One adaptive step on the episode, then detect on frame 0
        (interactron.py:31-59)."""
        frames = episode["frames"][0]
        det_p = params["detector"]
        prefix = self.frozen_prefix(frozen, frames)
        adapted_p, static_p = split_inner(det_p)
        cast = (
            (lambda t: t)
            if self.inner_dtype is None
            else (lambda t: jax.tree_util.tree_map(
                lambda p: p.astype(self.inner_dtype), t))
        )
        adapted_base = cast(adapted_p)
        static_c = cast(static_p)

        def inner(a):
            dp = merge_inner(a, static_c)
            with self._inner_conv_scope():
                out = self.detr_apply(
                    dp, frozen, prefix, deterministic=True, stage="from_prefix"
                )
            fus = self.fusion_apply(params["fusion"], out, deterministic=True)
            return learned_loss_value(fus)

        g = jax.grad(inner)(jax.lax.stop_gradient(adapted_base))
        fast = merge_inner(
            clipped_sgd_step(adapted_p, g, self.adaptive_lr, dtype=self.inner_dtype),
            static_c,
        )
        # fast-weight frame-0 detect: shifted-GEMM conv scope (im2col here
        # measured SLOWER, 97.1 vs 101.4 — patch HBM traffic — but shift9
        # measured 3.2x faster than the grouped conv at this F=1 shape)
        with self._econv_scope():
            out0 = self.detr_apply(
                fast, frozen, prefix[0:1], deterministic=True, stage="from_prefix"
            )
        return {
            "pred_logits": out0["pred_logits"][None],
            "pred_boxes": out0["pred_boxes"][None],
        }


class InteractronTask(InteractronRandomTask):
    """Full interactron: learned policy + learned loss (models/interactron.py)."""

    with_policy = True

    def next_action(self, params, frozen, episode):
        """Policy rollout step: fusion action logits at token s-1
        (interactron.py:174-197)."""
        frames = episode["frames"][0]  # (s, H, W, 3), s in 1..4
        s = frames.shape[0]
        out = self.detr_apply(params["detector"], frozen, frames, deterministic=True)
        fus = self.fusion_apply(params["fusion"], out, deterministic=True)
        return jnp.argmax(fus["actions"][0, s - 1], axis=-1)
