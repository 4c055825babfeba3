"""On-device non-maximum suppression for fixed-size (padded) box sets.

Replaces torchvision.ops.nms host kernels used by the evaluators
(random_policy_evaluator.py:75, interactive_evaluator.py:82). N is tiny
(<= 50 queries) so an exact O(N^2) masked sweep is both faithful and fast:
the pairwise IoU matrix is one (N, N) op and the greedy suppression is a
fori_loop over score rank.
"""

from functools import partial

import jax
import jax.numpy as jnp

from interactron_tpu.ops.box_ops import box_iou


@partial(jax.jit, static_argnames=())
def nms_mask(boxes, scores, iou_threshold, valid=None):
    """Exact greedy NMS.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,).
      iou_threshold: scalar; boxes overlapping a kept higher-scoring box of
        the same set with IoU > threshold are suppressed (strict >, matching
        torchvision semantics).
      valid: optional (N,) bool; invalid entries are never kept.

    Returns:
      keep: (N,) bool in the ORIGINAL index order.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), jnp.bool_)
    eff_scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-eff_scores)
    boxes_s = boxes[order]
    valid_s = valid[order]
    iou, _ = box_iou(boxes_s, boxes_s)

    def body(i, keep):
        suppress = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & keep[i]
        return keep & ~suppress

    keep_s = jax.lax.fori_loop(0, n, body, valid_s)
    # scatter back to original order
    keep = jnp.zeros((n,), jnp.bool_).at[order].set(keep_s)
    return keep


def nms_indices(boxes, scores, iou_threshold, valid=None):
    """Host helper: kept indices sorted by decreasing score (torchvision
    return convention)."""
    import numpy as np

    keep = np.asarray(nms_mask(boxes, scores, iou_threshold, valid=valid))
    scores = np.asarray(scores)
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-scores[idx], kind="stable")]
