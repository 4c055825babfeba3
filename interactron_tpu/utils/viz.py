"""Visualization helpers (utils/viz_utils.py parity): PR curves, IoU
histograms, and box overlays for qualitative dumps."""

import numpy as np


def plot_pr_curve(p, r, path=None, title="PR curve"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(r, p)
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_title(title)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_iou_histogram(detections, path=None, bins=20):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ious = [d["iou"] for d in detections if d["type"] == "tp"]
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.hist(ious, bins=bins, range=(0, 1))
    ax.set_xlabel("IoU")
    ax.set_ylabel("count")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def compute_pr(detections, nsamples=100, iou_thresh=0.5, min_area=0.0, max_area=1.0):
    """PR points over confidence sweep (random_policy_evaluator.py:331-361)."""
    dets = [d for d in detections if min_area < d["area"] < max_area]
    tps = [d for d in dets if d["type"] == "tp" and d["iou"] >= iou_thresh]
    fps = [d for d in dets if d["type"] == "fp"] + [
        d for d in dets if d["type"] == "tp" and d["iou"] < iou_thresh
    ]
    n_fn = len([d for d in dets if d["type"] == "fn"])
    tp_scores = np.sort(np.asarray([d["pred_score"] for d in tps]))[::-1]
    fp_scores = np.sort(np.asarray([d["pred_score"] for d in fps]))[::-1]
    p, r = [], []
    for conf in np.arange(0.0, 1.0, 1.0 / nsamples):
        ntp = int(np.sum(tp_scores >= conf))
        nfp = int(np.sum(fp_scores >= conf))
        p.append(0 if ntp == 0 else ntp / (ntp + nfp))
        r.append(0 if ntp == 0 else ntp / (ntp + n_fn))
    return p, r
