"""Bounding-box ops as pure jnp functions (vectorized, jit/vmap friendly).

Semantics match the reference box utilities (detr_models/util/box_ops.py:8-58)
but are written for fixed-size padded tensors: no asserts on degenerate boxes
(callers mask invalid entries instead), and everything broadcasts over leading
batch dims.
"""

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b):
    """Area of xyxy boxes, shape (..., 4) -> (...)."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1, boxes2, eps=0.0):
    """Pairwise IoU of xyxy boxes.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> iou, union: (..., N, M).
    Matches detr_models/util/box_ops.py:23-36 (plain division; callers
    guarantee non-degenerate inputs or mask the result).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / (union + eps), union


def generalized_box_iou(boxes1, boxes2, eps=0.0):
    """Pairwise GIoU of xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Same math as detr_models/util/box_ops.py:39-58; the degenerate-box assert
    is dropped (masked padded boxes are expected) — use `eps` to keep padded
    all-zero boxes finite.
    """
    iou, union = box_iou(boxes1, boxes2, eps=eps)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / (area + eps)
