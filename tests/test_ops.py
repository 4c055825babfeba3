"""Golden-value tests for box ops, Hungarian assignment, and NMS against
scipy/torch reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from interactron_tpu.ops import box_ops
from interactron_tpu.ops.hungarian import batched_solve_padded, solve_padded, solve_square
from interactron_tpu.ops.nms import nms_indices


def _rand_cxcywh(rng, n):
    cx, cy = rng.uniform(0.2, 0.8, (2, n))
    w, h = rng.uniform(0.05, 0.3, (2, n))
    return np.stack([cx, cy, w, h], axis=-1).astype(np.float32)


def test_box_conversions_roundtrip():
    rng = np.random.RandomState(0)
    b = _rand_cxcywh(rng, 17)
    xyxy = box_ops.box_cxcywh_to_xyxy(jnp.asarray(b))
    back = box_ops.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-6, atol=1e-6)


def test_giou_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    b1 = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_cxcywh(rng, 8))))
    b2 = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_cxcywh(rng, 5))))

    def torch_giou(a, b):
        a, b = torch.tensor(a), torch.tensor(b)
        area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = torch.max(a[:, None, :2], b[:, :2])
        rb = torch.min(a[:, None, 2:], b[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        union = area1[:, None] + area2 - inter
        iou = inter / union
        lt2 = torch.min(a[:, None, :2], b[:, :2])
        rb2 = torch.max(a[:, None, 2:], b[:, 2:])
        wh2 = (rb2 - lt2).clamp(min=0)
        area = wh2[:, :, 0] * wh2[:, :, 1]
        return iou - (area - union) / area

    ours = np.asarray(box_ops.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    theirs = torch_giou(b1, b2).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [3, 8, 20])
def test_hungarian_square_matches_scipy(n):
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(n)
    for _ in range(5):
        c = rng.randn(n, n).astype(np.float32) * 3
        col_to_row = np.asarray(solve_square(jnp.asarray(c)))
        rows, cols = linear_sum_assignment(c)
        ours = c[col_to_row, np.arange(n)].sum()
        theirs = c[rows, cols].sum()
        assert set(col_to_row) == set(range(n))  # a permutation
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_hungarian_padded_matches_scipy_rectangular():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(7)
    n = 50
    for m in [0, 1, 4, 13, 50]:
        c = rng.randn(n, n).astype(np.float32) * 2
        valid = np.zeros(n, bool)
        valid[:m] = True
        col_to_row = np.asarray(solve_padded(jnp.asarray(c), jnp.asarray(valid)))
        if m == 0:
            continue
        rows, cols = linear_sum_assignment(c[:, :m])
        ours = c[col_to_row[:m], np.arange(m)].sum()
        theirs = c[rows, cols].sum()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)
        assert len(set(col_to_row[:m])) == m  # injective


def test_hungarian_batched():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(3)
    b, n, m = 6, 50, 9
    c = rng.randn(b, n, n).astype(np.float32)
    valid = np.zeros((b, n), bool)
    valid[:, :m] = True
    out = np.asarray(batched_solve_padded(jnp.asarray(c), jnp.asarray(valid)))
    for i in range(b):
        rows, cols = linear_sum_assignment(c[i, :, :m])
        np.testing.assert_allclose(
            c[i, out[i, :m], np.arange(m)].sum(), c[i, rows, cols].sum(), rtol=1e-5
        )


def test_nms_matches_torchvision():
    tv = pytest.importorskip("torchvision")
    import torch

    rng = np.random.RandomState(5)
    n = 40
    cxcywh = _rand_cxcywh(rng, n)
    boxes = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(cxcywh)))
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ours = nms_indices(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    theirs = tv.ops.nms(torch.tensor(boxes), torch.tensor(scores), 0.5).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_nms_respects_valid_mask():
    boxes = jnp.asarray(
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3]], dtype=jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.1])
    valid = jnp.asarray([False, True, True])
    idx = nms_indices(boxes, scores, 0.5, valid=valid)
    assert list(idx) == [1, 2]

