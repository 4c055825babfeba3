"""Multi-frame baseline: DETR + fusion refinement, direct supervision, no
adaptation (models/detr_multiframe.py).

Per episode: detector on 5 frames, fusion refines logits/boxes for all 5
frames, criterion on the fusion outputs, loss = ce + 5*giou + 2*bbox summed
over episodes (the reference backwards per episode —
detr_multiframe.py:74-95). Dropout: detector runs in eval mode except its
decoder (detr_multiframe.py:114-119); fusion in train mode.
"""

import jax
import jax.numpy as jnp

from interactron_tpu.tasks.base import TaskModel, scan_microbatches, tree_add, tree_zeros_like


class MultiFrameTask(TaskModel):
    needs_fusion = True

    def _episode_loss(self, params, frozen, ep, rng, train):
        k1, k2 = jax.random.split(rng)
        out = self.detr_apply(
            params["detector"],
            frozen,
            ep["frames"],
            deterministic=True,
            decoder_deterministic=not train,
            rng=k1,
        )
        fus = self.fusion_apply(
            params["fusion"], out, deterministic=not train, rng=k2
        )
        fusion_out = {
            "pred_logits": fus["pred_logits"][0],
            "pred_boxes": fus["pred_boxes"][0],
        }
        targets = {"labels": ep["labels"], "boxes": ep["boxes"], "valid": ep["valid"]}
        losses = self.criterion(fusion_out, targets)
        total = losses["loss_ce"] + 5.0 * losses["loss_giou"] + 2.0 * losses["loss_bbox"]
        return total, losses

    def _microbatch_loss(self, params, frozen, mb_batch, rng, train):
        mb = mb_batch["frames"].shape[0]
        keys = jax.random.split(rng, mb)

        def one(ep_frames, ep_labels, ep_boxes, ep_valid, key):
            ep = {"frames": ep_frames, "labels": ep_labels, "boxes": ep_boxes, "valid": ep_valid}
            return self._episode_loss(params, frozen, ep, key, train)

        totals, losses = jax.vmap(one)(
            mb_batch["frames"], mb_batch["labels"], mb_batch["boxes"], mb_batch["valid"], keys
        )
        return jnp.sum(totals), jax.tree_util.tree_map(jnp.sum, losses)

    def grads_and_metrics(self, params, frozen, batch, rng, path_state=None):
        b = batch["frames"].shape[0]
        num_micro = max(1, b // max(1, self.inner_batch))

        def step(carry, mb_batch):
            g_acc, m_acc, key = carry
            key, sub = jax.random.split(key)
            (total, losses), g = jax.value_and_grad(
                self._microbatch_loss, has_aux=True
            )(params, frozen, mb_batch, sub, True)
            m = dict(losses)
            m["total_loss"] = total
            return (tree_add(g_acc, g), tree_add(m_acc, m), key)

        zeros_m = {k: jnp.zeros(()) for k in
                   ["loss_ce", "loss_bbox", "loss_giou", "cardinality_error", "class_error", "total_loss"]}
        g, m, _ = scan_microbatches(
            step, batch, num_micro, (tree_zeros_like(params), zeros_m, rng)
        )
        metrics = self.rename({k: v / b for k, v in m.items() if k != "total_loss"}, "detector")
        metrics["total_loss"] = m["total_loss"] / b
        return g, metrics, path_state if path_state is not None else {}

    def eval_metrics(self, params, frozen, batch, rng, path_state=None):
        total, losses = self._microbatch_loss(params, frozen, batch, rng, False)
        b = batch["frames"].shape[0]
        metrics = self.rename({k: v / b for k, v in losses.items()}, "detector")
        metrics["total_loss"] = total / b
        return metrics, path_state if path_state is not None else {}

    def init_path_state(self, num_episodes):
        return {}

    def predict(self, params, frozen, episode):
        frames = episode["frames"][0]
        out = self.detr_apply(params["detector"], frozen, frames, deterministic=True)
        fus = self.fusion_apply(params["fusion"], out, deterministic=True)
        return {"pred_logits": fus["pred_logits"], "pred_boxes": fus["pred_boxes"]}
