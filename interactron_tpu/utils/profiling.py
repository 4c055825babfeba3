"""Profiling/timing harness — the TPU-native replacement for the reference's
wall-clock Timer (utils/time_utils.py): device-synchronized section timing
plus jax.profiler trace capture for TensorBoard's profile viewer."""

import contextlib
import time

import jax


class Timer:
    """Section timer with explicit device sync (block_until_ready on a probe
    value keeps async dispatch from lying)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.laps = []

    def tick(self, msg, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        now = time.perf_counter()
        self.laps.append((msg, now - self.t0))
        self.t0 = now
        return self.laps[-1][1]

    def report(self):
        return "\n".join(f"{m}: {dt*1000:.2f} ms" for m, dt in self.laps)


@contextlib.contextmanager
def trace(log_dir="/tmp/interactron_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters=5, warmup=1, **kwargs):
    """Call a jitted fn repeatedly, return (result, seconds_per_call)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / iters
