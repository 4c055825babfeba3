"""Headline benchmark: adaptive 5-frame episodes/sec/chip.

Measures the full Interactron test-time path per episode on one chip —
DETR-ResNet50-DC5 forward over 5 frames, fusion transformer over 2060
tokens, learned-loss gradient through the detector, clipped SGD adaptation,
adapted detection on frame 0 — i.e. the `predict` step the AP evaluation
runs (interactron.py:31-59), batched across episodes.

Methodology: through the axon tunnel `block_until_ready` can acknowledge
before device completion once the pipeline is warm, so each timed iteration
feeds a scalar derived from the previous output back into the next input
(a device-side dependency chain) and the loop ends with a single scalar
host fetch. This bounds the true per-call device latency from above by
(total - one fetch)/iters. The iterations run inside one device-side
lax.scan and ITERS defaults to 96 because the closing scalar fetch costs a
full tunnel round-trip (~60 ms — 2.5 ms/iter at 24 iters, profiled): in
production the per-batch result fetches overlap compute via async dispatch,
so amortizing the RTT measures sustained device throughput, which is the
metric.

Baseline anchor: the reference publishes no episodes/sec number; its only
wall-clock anchors are ~5 days RTX-3090 training for 2000 epochs x 1000
episodes (~4.6 episodes/s of the heavier train step, README.md:55-56). We
take 5.0 episodes/s as the RTX-3090 predict estimate; the north-star target
is >20x that => 100 episodes/s/chip (BASELINE.md). vs_baseline = value/100.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os

REF_3090_EPISODES_PER_SEC = 5.0
TARGET_MULTIPLE = 20.0
BATCH = int(os.environ.get("BENCH_BATCH", 4))
CONFIG = os.environ.get("BENCH_CONFIG", "configs/interactron.yaml")
ITERS = int(os.environ.get("BENCH_ITERS", 96))
# BENCH_HOST_LOOP=1: issue ITERS separate jit calls from the host instead of
# one device-side lax.scan. The scan is the default because each host call
# crosses the axon tunnel (serialize + RPC), an overhead a real serving loop
# amortizes with async dispatch but which the tunnel serializes; the scan
# keeps the identical per-iteration dependency chain while paying dispatch
# once. Both paths measure the same step function.
HOST_LOOP = bool(os.environ.get("BENCH_HOST_LOOP"))


def build(flash):
    from interactron_tpu.tasks import InteractronTask
    from interactron_tpu.utils.config import get_config
    from __graft_entry__ import _episode_batch

    # The bench config IS the production config: the flash toggle goes
    # through the same MODEL.FLASH_ATTENTION knob tasks/base.py consumes for
    # train.py/evaluate.py (default ON when backend==tpu), so the measured
    # path is exactly what a real run executes.
    cfg = get_config(CONFIG)
    setattr(cfg.MODEL, "FLASH_ATTENTION", flash)
    if os.environ.get("BENCH_INNER_SHIFT"):
        setattr(cfg.MODEL, "INNER_SHIFT_CONV", True)
    task = InteractronTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))

    def step(params, frozen, batch, chain):
        # device-side dependency: mix the previous output into the input
        batch = dict(batch)
        batch["frames"] = batch["frames"] + chain * 1e-9

        def one(frames, labels, boxes, valid):
            ep = {
                "frames": frames[None],
                "labels": labels[None],
                "boxes": boxes[None],
                "valid": valid[None],
            }
            return task.predict(params, frozen, ep)

        out = jax.vmap(one)(
            batch["frames"], batch["labels"], batch["boxes"], batch["valid"]
        )
        new_chain = jnp.sum(out["pred_boxes"]) * 0.0 + jnp.max(out["pred_logits"]) * 1e-6
        return out, new_chain

    def step_scan(params, frozen, batch, chain):
        # identical per-iteration work and dependency chain, looped on device
        def body(c, _):
            out, c2 = step(params, frozen, batch, c)
            return c2, ()

        chain, _ = jax.lax.scan(body, chain, None, length=ITERS)
        return chain

    fn = jax.jit(step) if HOST_LOOP else jax.jit(step_scan)
    batch = _episode_batch(
        np.random.RandomState(0), BATCH, 5, task.img_size, task.max_boxes, task.num_classes
    )
    batch = {
        k: jax.device_put(v)
        for k, v in batch.items()
        if k not in ("actions", "episode_uid")
    }
    return fn, params, frozen, batch


def measure(fn, params, frozen, batch):
    chain = jnp.zeros(())
    if HOST_LOOP:
        out, chain = fn(params, frozen, batch, chain)
        _ = float(chain)  # warm + compile
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out, chain = fn(params, frozen, batch, chain)
        _ = float(chain)  # single scalar fetch syncs the whole chain
        dt = time.perf_counter() - t0
        return BATCH * ITERS / dt
    chain = fn(params, frozen, batch, chain)
    _ = float(chain)  # warm + compile
    t0 = time.perf_counter()
    chain = fn(params, frozen, batch, chain)
    _ = float(chain)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def main():
    try:
        # TPU-only: the remote-compile helper stores AOT blobs for its own
        # CPU microarch; sharing the cache with local CPU runs risks SIGILL
        if jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    except Exception:
        pass
    results = {}
    # BENCH_FLASH_ONLY=1: skip the XLA-attention leg (local sweeps; the
    # driver's default invocation still measures both)
    legs = (True,) if os.environ.get("BENCH_FLASH_ONLY") else (False, True)
    for flash in legs:
        fn, params, frozen, batch = build(flash)
        results[flash] = measure(fn, params, frozen, batch)
    eps = max(results.values())
    target = REF_3090_EPISODES_PER_SEC * TARGET_MULTIPLE
    print(
        json.dumps(
            {
                "metric": "adaptive_5frame_episodes_per_sec_per_chip",
                "value": round(eps, 3),
                "unit": "episodes/s",
                "vs_baseline": round(eps / target, 4),
                "detail": {
                    "xla_attention": round(results.get(False, 0.0), 2),
                    "pallas_flash_attention": round(results[True], 2),
                    "batch": BATCH,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
