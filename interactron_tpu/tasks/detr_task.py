"""Single-frame DETR baseline task (models/detr.py in the reference).

forward: all b*s frames through the detector as one batch, one criterion
call over the whole batch (global num_boxes), loss = ce + 5*bbox + 2*giou —
note this baseline weights bbox 5 / giou 2 (models/detr.py:58), unlike the
interactron family which uses ce + 5*giou + 2*bbox.
"""

import jax
import jax.numpy as jnp

from interactron_tpu.tasks.base import TaskModel


class DETRTask(TaskModel):
    needs_fusion = False

    def loss(self, params, frozen, batch, rng, train=True):
        b, s = batch["frames"].shape[:2]
        frames = batch["frames"].reshape(b * s, *batch["frames"].shape[2:])
        out = self.detr_apply(
            params["detector"], frozen, frames, deterministic=not train, rng=rng
        )
        targets = {
            "labels": batch["labels"].reshape(b * s, -1),
            "boxes": batch["boxes"].reshape(b * s, -1, 4),
            "valid": batch["valid"].reshape(b * s, -1),
        }
        losses = self.criterion(out, targets)
        total = losses["loss_ce"] + 5.0 * losses["loss_bbox"] + 2.0 * losses["loss_giou"]
        return total, self.rename(losses, "detector")

    def grads_and_metrics(self, params, frozen, batch, rng, path_state=None):
        (total, metrics), grads = jax.value_and_grad(self.loss, has_aux=True)(
            params, frozen, batch, rng, train=True
        )
        metrics = dict(metrics)
        metrics["total_loss"] = total
        return grads, metrics, path_state if path_state is not None else {}

    def eval_metrics(self, params, frozen, batch, rng, path_state=None):
        total, metrics = self.loss(params, frozen, batch, rng, train=False)
        metrics = dict(metrics)
        metrics["total_loss"] = total
        return metrics, path_state if path_state is not None else {}

    def init_path_state(self, num_episodes):
        return {}

    def predict(self, params, frozen, episode):
        """episode: batch with b=1. Returns reference-shaped dict
        (1, s, 50, ...) (models/detr.py:20-40)."""
        frames = episode["frames"][0]
        out = self.detr_apply(params["detector"], frozen, frames, deterministic=True)
        return {
            "pred_logits": out["pred_logits"][None],
            "pred_boxes": out["pred_boxes"][None],
        }

    def trainable_partition(self, params):
        """Single optimizer over everything (direct supervision trainer)."""
        return {"all": params}
