"""AP numerics: our vectorized compute_ap vs a literal re-expression of the
reference's destructive-list algorithm (random_policy_evaluator.py:277-329),
plus greedy matcher behavior checks (detection_utils.py:401-421)."""

import numpy as np

from interactron_tpu.engine.ap import compute_ap, match_predictions_to_detections


def reference_compute_ap(detections, nsamples=100, iou_thresholds=(0.5,), min_area=0.0, max_area=1.0):
    """Literal port of the reference loop semantics (destructive filtering)."""
    aps = []
    detections = [d for d in detections if min_area < d["area"] < max_area]
    for iou_thresh in iou_thresholds:
        tps = [d for d in detections if d["type"] == "tp"]
        fps = [d for d in detections if d["type"] == "fp"]
        fns = [d for d in detections if d["type"] == "fn"]
        p, r = [], []
        i = 0
        while i < len(tps):
            if tps[i]["iou"] < iou_thresh:
                fps.append(tps.pop(i))
            else:
                i += 1
        for conf in np.arange(0.0, 1.0, 1.0 / nsamples):
            i = 0
            while i < len(tps):
                if tps[i]["pred_score"] < conf:
                    tps.pop(i)
                else:
                    i += 1
            i = 0
            while i < len(fps):
                if fps[i]["pred_score"] < conf:
                    fps.pop(i)
                else:
                    i += 1
            p.append(0 if len(tps) == 0 else len(tps) / (len(tps) + len(fps)))
            r.append(0 if len(tps) == 0 else len(tps) / (len(tps) + len(fns)))
        p = [0.0] + p
        r = [r[0] + 0.000001] + r
        samples = []
        r_idx = 0
        for r_cutoff in np.arange(1.0, -0.0001, -0.01):
            while r_idx < len(r) - 1 and r[r_idx] > r_cutoff:
                r_idx += 1
            samples.append(max(p[: r_idx + 1]))
        aps.append(np.mean(samples))
    return float(np.mean(aps))


def _random_detections(seed, n=200):
    rng = np.random.RandomState(seed)
    dets = []
    for _ in range(n):
        typ = rng.choice(["tp", "fp", "fn"], p=[0.45, 0.35, 0.2])
        dets.append(
            {
                "iou": float(rng.uniform(0.2, 1.0)) if typ == "tp" else 0.0,
                "type": typ,
                "pred_score": float(rng.uniform(0, 1)) if typ != "fn" else 0.0,
                "area": float(rng.uniform(0.001, 0.8)),
                "pred_cat": int(rng.randint(0, 5)),
            }
        )
    return dets


def test_compute_ap_matches_reference_algorithm():
    for seed in range(3):
        dets = _random_detections(seed)
        for thresholds in ([0.5], [0.75], list(np.arange(0.5, 1.0, 0.05))):
            ours = compute_ap(dets, iou_thresholds=thresholds)
            ref = reference_compute_ap(dets, iou_thresholds=thresholds)
            np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_compute_ap_area_filter_matches():
    dets = _random_detections(7)
    ours = compute_ap(dets, iou_thresholds=[0.5], min_area=0.01, max_area=0.1)
    ref = reference_compute_ap(dets, iou_thresholds=[0.5], min_area=0.01, max_area=0.1)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_greedy_matcher_basic():
    # two preds, two gts, clear diagonal assignment
    ious = np.asarray([[0.9, 0.1], [0.2, 0.8]])
    best_ious, best_idx = match_predictions_to_detections(ious)
    assert list(best_idx) == [0, 1]
    np.testing.assert_allclose(best_ious, [0.9, 0.8])
    # conflicting preference: one pred best for both gts
    ious = np.asarray([[0.9, 0.85], [0.1, 0.3]])
    best_ious, best_idx = match_predictions_to_detections(ious)
    assert list(best_idx) == [0, 1]
    np.testing.assert_allclose(best_ious, [0.9, 0.3])
    # zero-iou columns stay unmatched
    ious = np.zeros((2, 2))
    best_ious, best_idx = match_predictions_to_detections(ious)
    assert list(best_idx) == [-1, -1]
