"""Microbenchmark: ResNet stem formulations on TPU.

The profiled predict step spends ~1.8 ms/iter in the stem (conv1 7x7/s2 at
~10 TF/s — the 3-channel contraction starves the MXU — plus reduce_window
maxpool at ~99 GB/s). This tool times alternatives at the production shape
(20 frames x 300x300x3):

  direct   — lax conv + nn.max_pool reduce_window (current production)
  im2col   — patch extraction (7 row-slices + 7 col-slices, stride 2) then
             one (N*150*150, 147) @ (147, 64) GEMM; pool decomposed
  poolonly — direct conv + decomposed strided-max pool

Same chained-scan methodology as bench_econv.py (axon tunnel RTT amortized
over ITERS device-side iterations).

Usage: python tools/bench_stem.py [N] [ITERS]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
DT = jnp.bfloat16


def chain_time(fn, *args):
    @jax.jit
    def run(*args):
        def body(c, _):
            out = fn(args[0] + c * 1e-12, *args[1:])
            s = jnp.sum(out.astype(jnp.float32)) * 1e-20
            return s.astype(args[0].dtype), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype), None, length=ITERS)
        return c

    _ = float(run(*args))
    t0 = time.perf_counter()
    _ = float(run(*args))
    return (time.perf_counter() - t0) / ITERS


def conv_direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def pool_rw(y):
    # nn.max_pool equivalent: reduce_window 3x3 stride 2 pad 1
    return jax.lax.reduce_window(
        y, -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def pool_decomposed(y):
    """3x3/s2/p1 maxpool as strided slice maxes: 2 shifted maxes per axis."""
    n, h, w, c = y.shape
    neg = jnp.finfo(y.dtype).min
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    ho, wo = (h + 1) // 2, (w + 1) // 2
    r = None
    for dy in range(3):
        m = yp[:, dy : dy + h : 2]
        r = m if r is None else jnp.maximum(r, m)
    out = None
    for dx in range(3):
        m = r[:, :, dx : dx + w : 2]
        out = m if out is None else jnp.maximum(out, m)
    assert out.shape == (n, ho, wo, c)
    return out


def conv_im2col(x, w):
    """7x7/s2/p3 conv as patch-slices + one GEMM (K=147)."""
    n, h, wdt, c = x.shape  # 300, 300, 3
    ho = wo = h // 2
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    # rows: 7 shifted stride-2 row-slices -> (n, 150, 306, 3) each
    rows = [xp[:, dy : dy + h : 2] for dy in range(7)]
    rcat = jnp.concatenate(rows, axis=-1)  # (n, 150, 306, 21)
    cols = [rcat[:, :, dx : dx + wdt : 2] for dx in range(7)]
    patches = jnp.concatenate(cols, axis=-1)  # (n, 150, 150, 147) [dy-major? no]
    # layout: last dim = dx-major of (dy, c) groups => (dx, dy, c)
    wk = w.transpose(1, 0, 2, 3).reshape(147, -1)  # (dx, dy, c) -> rows
    return jnp.dot(patches, wk.astype(patches.dtype))


def bn_relu(y, scale, bias):
    return jnp.maximum(y * scale + bias, 0.0)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, 300, 300, 3), DT)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, DT)
    scale = jnp.asarray(rng.rand(64) + 0.5, DT)
    bias = jnp.asarray(rng.randn(64) * 0.1, DT)

    def stem_direct(x, w):
        return pool_rw(bn_relu(conv_direct(x, w), scale, bias))

    def stem_pool(x, w):
        return pool_decomposed(bn_relu(conv_direct(x, w), scale, bias))

    def stem_im2col(x, w):
        return pool_decomposed(bn_relu(conv_im2col(x, w), scale, bias))

    a = stem_direct(x, w).astype(jnp.float32)
    for name, f in (("pool_decomp", stem_pool), ("im2col", stem_im2col)):
        b = f(x, w).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"max|err| {name} vs direct: {err:.4f}")

    print(f"backend={jax.default_backend()} N={N} iters={ITERS}")
    for name, f in (
        ("direct+rw", stem_direct),
        ("direct+decomp", stem_pool),
        ("im2col+decomp", stem_im2col),
    ):
        t = chain_time(f, x, w)
        print(f"{name:16s} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
