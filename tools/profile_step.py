"""Op-level XLA profile of the production predict/train step on the TPU.

Captures a jax.profiler trace around the exact bench.py / bench_train.py
step (scan-chained so the tunnel RTT amortizes) and parses the xplane with
xprof's framework_op_stats converter, printing the top ops by self-time.
This replaces eyeballing TensorBoard: numbers land directly in the
terminal so optimization decisions stay measurement-driven.

Usage (on TPU):
    python tools/profile_step.py predict    [--batch 4] [--top 40]
    python tools/profile_step.py train      [--batch 8] [--top 40]
    python tools/profile_step.py train_scan [--batch 8] [--top 40]

train_scan profiles bench.measure_train's EXACT scan-chained program (the
one the recorded eps/s comes from) instead of a host-looped single step —
the two differ by the outer scan's carry handling.
"""

import argparse
import glob
import io
import json
import os
import shutil
import sys

sys.path.insert(0, ".")


def capture(mode, batch, iters):
    os.environ["BENCH_BATCH"] = str(batch)
    os.environ["BENCH_ITERS"] = str(iters)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if mode == "predict":
        import bench

        fn, params, frozen, data = bench.build(flash=True, host_loop=False)
        args = (params, frozen, data, jnp.zeros(()))

        def run():
            out = fn(*args)
            _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    elif mode == "train_scan":
        # the bench's exact scan-chained train program (BENCH_TRAIN_ITERS
        # steps per call; the caller divides by 2x that — warm + timed)
        os.environ["BENCH_TRAIN_BATCH"] = str(batch)
        import bench

        def run():
            bench.measure_train()
    else:
        import numpy as np
        import optax

        from interactron_tpu.tasks import InteractronTask
        from interactron_tpu.utils.config import get_config
        from __graft_entry__ import _episode_batch

        cfg = get_config("configs/interactron.yaml")
        setattr(cfg.MODEL, "FLASH_ATTENTION", True)
        cfg.TRAINER.INNER_BATCH = 4
        task = InteractronTask(cfg)
        task.inner_batch = 4
        params, frozen = task.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        data = _episode_batch(
            np.random.RandomState(0), batch, 5, task.img_size, task.max_boxes, task.num_classes
        )
        data = {k: jax.device_put(v) for k, v in data.items()}
        path_state = task.init_path_state(64)

        @jax.jit
        def fn(params, opt_state, data, rng, chain, path_state):
            b = dict(data)
            b["frames"] = b["frames"] + chain * 1e-9
            grads, metrics, path_state = task.grads_and_metrics(
                params, frozen, b, rng, path_state
            )
            upd, opt_state = opt.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
            return params, opt_state, metrics["total_loss"] * 1e-9, path_state

        state = {}

        def run():
            p, o, c, ps = fn(
                state.get("p", params), state.get("o", opt_state), data,
                jax.random.PRNGKey(1), state.get("c", jnp.zeros(())),
                state.get("ps", path_state),
            )
            state.update(p=p, o=o, c=c, ps=ps)
            _ = float(c)

    run()  # compile+warm
    logdir = "/tmp/interactron_profile"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(iters if mode == "train" else 1):
            run()
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {logdir}"
    return paths[-1]


def report(xplane, top, iters):
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {"tqx": "out:json;"})
    if isinstance(data, bytes):
        data = data.decode()
    tables = json.loads(data)
    if isinstance(tables, dict):
        tables = [tables]
    # the converter emits the combined table plus a per-device copy; using
    # both double-counts every op — keep only the first
    tables = tables[:1]
    recs = []
    idle = 0.0
    for table in tables:
        ids = [c["id"] for c in table["cols"]]

        def get(row, key):
            v = row["c"][ids.index(key)]
            return v.get("v") if isinstance(v, dict) else None

        for row in table.get("rows", []):
            if get(row, "host_or_device") != "Device":
                continue
            t = float(get(row, "total_self_time") or 0.0)
            if get(row, "type") == "IDLE":
                idle += t
                continue
            recs.append(
                dict(
                    t=t,
                    type=get(row, "type"),
                    op=get(row, "operation"),
                    n=get(row, "occurrences"),
                    tf=float(get(row, "measured_flop_rate") or 0.0) / 1e12,
                    bw=float(get(row, "measured_memory_bw") or 0.0),
                    bound=get(row, "bound_by"),
                )
            )
    recs.sort(key=lambda r: -r["t"])
    total = sum(r["t"] for r in recs)
    print(f"device busy: {total/1e3/iters:.3f} ms/iter  (idle {idle/1e3/iters:.3f} ms/iter)")
    print(f"{'ms/iter':>8s} {'%':>5s} {'n':>5s} {'TF/s':>6s} {'GB/s':>6s} {'bound':>7s}  op")
    for r in recs[:top]:
        print(
            f"{r['t']/1e3/iters:8.3f} {100*r['t']/total:5.1f} {int(r['n'] or 0):5d} "
            f"{r['tf']:6.1f} {r['bw']:6.0f} {str(r['bound'])[:7]:>7s}  {str(r['op'])[:160]}"
        )
    cats = {}
    for r in recs:
        c = cats.setdefault(r["type"], [0.0, 0.0])
        c[0] += r["t"]
        c[1] += r["tf"] * r["t"]  # time-weighted flop rate
    print("\nby category (ms/iter):")
    for k, (v, ft) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        print(f"  {str(k):30s} {v/1e3/iters:8.3f}  {100*v/total:4.1f}%  avg {ft/max(v,1e-9):5.1f} TF/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["predict", "train", "train_scan"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--xplane", default=None,
                    help="re-report an existing capture instead of re-running")
    a = ap.parse_args()
    batch = a.batch or (4 if a.mode == "predict" else 8)
    if a.mode == "train_scan":
        # the traced region holds warm + timed calls = 2 x BENCH_TRAIN_ITERS
        # scan steps; report per scan step
        a.iters = 2 * int(os.environ.get("BENCH_TRAIN_ITERS", 12))
    xplane = a.xplane or capture(a.mode, batch, a.iters)
    print(f"xplane: {xplane}")
    report(xplane, a.top, a.iters)


if __name__ == "__main__":
    main()
