"""Golden-value test: our padded on-device criterion must reproduce the
reference SetCriterion numerics (re-expressed here in torch+scipy exactly as
in detr_models/detr.py:86-265 and matcher.py:32-77) on random ragged data."""

import numpy as np
import jax.numpy as jnp
import pytest

from interactron_tpu.models.criterion import set_criterion

torch = pytest.importorskip("torch")
from scipy.optimize import linear_sum_assignment  # noqa: E402

NUM_CLASSES = 9
Q = 12
M = 8  # padded targets


def _torch_reference(logits, boxes, tgt_labels, tgt_boxes, nvalid, background_c=0.1):
    import torch.nn.functional as F

    def cxcywh_to_xyxy(x):
        cx, cy, w, h = x.unbind(-1)
        return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

    def giou_matrix(a, b):
        area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = torch.max(a[:, None, :2], b[:, :2])
        rb = torch.min(a[:, None, 2:], b[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        union = area1[:, None] + area2 - inter
        iou = inter / union
        lt2 = torch.min(a[:, None, :2], b[:, :2])
        rb2 = torch.max(a[:, None, 2:], b[:, 2:])
        wh2 = (rb2 - lt2).clamp(min=0)
        area = wh2[..., 0] * wh2[..., 1]
        return iou - (area - union) / area

    logits = torch.tensor(logits)
    boxes = torch.tensor(boxes)
    b = logits.shape[0]
    targets = [
        {"labels": torch.tensor(tgt_labels[i, : nvalid[i]]).long(), "boxes": torch.tensor(tgt_boxes[i, : nvalid[i]])}
        for i in range(b)
    ]

    # --- matcher (matcher.py:50-77)
    out_prob = logits.flatten(0, 1).softmax(-1)
    out_bbox = boxes.flatten(0, 1)
    tgt_ids = torch.cat([v["labels"] for v in targets])
    tgt_bbox = torch.cat([v["boxes"] for v in targets])
    cost_class = -out_prob[:, tgt_ids]
    cost_bbox = torch.cdist(out_bbox, tgt_bbox, p=1)
    cost_giou = -giou_matrix(cxcywh_to_xyxy(out_bbox), cxcywh_to_xyxy(tgt_bbox))
    C = 5 * cost_bbox + 1 * cost_class + 2 * cost_giou
    C = C.view(b, Q, -1)
    sizes = [len(v["boxes"]) for v in targets]
    indices = [
        linear_sum_assignment(c[i].numpy()) for i, c in enumerate(C.split(sizes, -1))
    ]
    indices = [
        (torch.as_tensor(i, dtype=torch.int64), torch.as_tensor(j, dtype=torch.int64))
        for i, j in indices
    ]

    # --- loss_labels (detr.py:111-127)
    idx_batch = torch.cat([torch.full_like(src, i) for i, (src, _) in enumerate(indices)])
    idx_src = torch.cat([src for (src, _) in indices])
    target_classes_o = torch.cat([t["labels"][J] for t, (_, J) in zip(targets, indices)])
    target_classes = torch.full((b, Q), NUM_CLASSES, dtype=torch.int64)
    target_classes[(idx_batch, idx_src)] = target_classes_o
    weight = torch.ones(NUM_CLASSES + 1)
    weight[-1] *= background_c
    loss_ce = F.cross_entropy(logits.transpose(1, 2), target_classes, weight)

    # --- loss_boxes (detr.py:148-167)
    num_boxes = max(sum(sizes), 1)
    src_boxes = boxes[(idx_batch, idx_src)]
    tgt_boxes_cat = torch.cat([t["boxes"][i] for t, (_, i) in zip(targets, indices)], dim=0)
    loss_bbox = F.l1_loss(src_boxes, tgt_boxes_cat, reduction="none").sum() / num_boxes
    loss_giou = (
        1 - torch.diag(giou_matrix(cxcywh_to_xyxy(src_boxes), cxcywh_to_xyxy(tgt_boxes_cat)))
    ).sum() / num_boxes

    card_pred = (logits.argmax(-1) != NUM_CLASSES).sum(1)
    card_err = F.l1_loss(card_pred.float(), torch.tensor(nvalid).float())
    return dict(
        loss_ce=loss_ce.item(),
        loss_bbox=loss_bbox.item(),
        loss_giou=loss_giou.item(),
        cardinality_error=card_err.item(),
    )


def _random_case(seed, nvalid):
    rng = np.random.RandomState(seed)
    b = len(nvalid)
    logits = rng.randn(b, Q, NUM_CLASSES + 1).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(0.3, 0.7, (b, Q)),
            rng.uniform(0.3, 0.7, (b, Q)),
            rng.uniform(0.05, 0.3, (b, Q)),
            rng.uniform(0.05, 0.3, (b, Q)),
        ],
        axis=-1,
    ).astype(np.float32)
    tgt_labels = rng.randint(0, NUM_CLASSES, (b, M)).astype(np.int32)
    tgt_boxes = np.stack(
        [
            rng.uniform(0.3, 0.7, (b, M)),
            rng.uniform(0.3, 0.7, (b, M)),
            rng.uniform(0.05, 0.3, (b, M)),
            rng.uniform(0.05, 0.3, (b, M)),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = (np.arange(M)[None] < np.array(nvalid)[:, None])
    # zero out padded entries like the data pipeline does
    tgt_boxes = tgt_boxes * valid[..., None]
    tgt_labels = tgt_labels * valid
    return logits, boxes, tgt_labels, tgt_boxes, valid


@pytest.mark.parametrize("nvalid", [[3, 5], [1, 8], [0, 4]])
def test_criterion_matches_reference(nvalid):
    logits, boxes, tgt_labels, tgt_boxes, valid = _random_case(sum(nvalid), nvalid)
    ours = set_criterion(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        {"labels": jnp.asarray(tgt_labels), "boxes": jnp.asarray(tgt_boxes), "valid": jnp.asarray(valid)},
        num_classes=NUM_CLASSES,
    )
    theirs = _torch_reference(logits, boxes, tgt_labels, tgt_boxes, nvalid)
    for k in ["loss_ce", "loss_bbox", "loss_giou", "cardinality_error"]:
        np.testing.assert_allclose(float(ours[k]), theirs[k], rtol=2e-4, atol=2e-5, err_msg=k)


def test_criterion_zero_boxes_everywhere():
    logits, boxes, tgt_labels, tgt_boxes, valid = _random_case(0, [0, 0])
    out = set_criterion(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        {"labels": jnp.asarray(tgt_labels), "boxes": jnp.asarray(tgt_boxes), "valid": jnp.asarray(valid)},
        num_classes=NUM_CLASSES,
    )
    assert float(out["loss_bbox"]) == 0.0
    assert float(out["loss_giou"]) == 0.0
    assert np.isfinite(float(out["loss_ce"]))
