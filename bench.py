"""Headline benchmark: adaptive 5-frame episodes/sec/chip.

Measures the full Interactron test-time path per episode on one chip —
DETR-ResNet50-DC5 forward over 5 frames, fusion transformer over 2060
tokens, learned-loss gradient through the detector, clipped SGD adaptation,
adapted detection on frame 0 — i.e. the `predict` step the AP evaluation
runs (interactron.py:31-59), batched across episodes.

Baseline anchor: the reference publishes no episodes/sec number; its only
wall-clock anchors are ~5 days RTX-3090 training (README.md:55-56) for 2000
epochs x 1000 episodes (~4.6 episodes/s for the heavier train step) and a
"several minutes" CPU eval. We take 5.0 episodes/s as the RTX-3090 predict
estimate; the north-star target is >20x that => 100 episodes/s/chip
(BASELINE.md). vs_baseline = value / 100.
"""

import json
import time

import jax
import numpy as np

REF_3090_EPISODES_PER_SEC = 5.0
TARGET_MULTIPLE = 20.0


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    except Exception:
        pass
    from interactron_tpu.tasks import InteractronTask
    from interactron_tpu.utils.config import get_config
    from __graft_entry__ import _episode_batch

    cfg = get_config("configs/interactron.yaml")
    task = InteractronTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))

    bench_batch = 8  # episodes per predict call
    rng = np.random.RandomState(0)

    def batched_predict(params, frozen, batch):
        def one(frames, labels, boxes, valid):
            ep = {
                "frames": frames[None],
                "labels": labels[None],
                "boxes": boxes[None],
                "valid": valid[None],
            }
            return task.predict(params, frozen, ep)

        return jax.vmap(one)(
            batch["frames"], batch["labels"], batch["boxes"], batch["valid"]
        )

    fn = jax.jit(batched_predict)
    batch = _episode_batch(
        rng, bench_batch, 5, task.img_size, task.max_boxes, task.num_classes
    )
    batch = {k: jax.device_put(v) for k, v in batch.items() if k != "actions" and k != "episode_uid"}

    # warmup / compile
    out = fn(params, frozen, batch)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, frozen, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    eps_per_sec = bench_batch * iters / dt

    target = REF_3090_EPISODES_PER_SEC * TARGET_MULTIPLE
    print(
        json.dumps(
            {
                "metric": "adaptive_5frame_episodes_per_sec_per_chip",
                "value": round(eps_per_sec, 3),
                "unit": "episodes/s",
                "vs_baseline": round(eps_per_sec / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
