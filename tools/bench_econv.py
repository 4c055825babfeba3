"""Microbenchmark: per-episode (fast-weight) conv formulations on TPU.

The meta step vmaps episodes, so the adapted detector passes give every
episode its OWN conv kernels; XLA lowers those to batch-grouped
convolutions. This tool times the candidate formulations at the exact
adapted-layer shapes so kernel work (ops/episode_conv.py) is driven by
measured numbers, not guesses.

Methodology: same as bench.py — through the axon tunnel block_until_ready
can acknowledge early, so every timed variant runs ITERS chained iterations
inside one device-side lax.scan (output mixed back into the input) and the
loop closes with a single scalar fetch.

Usage: python tools/bench_econv.py [E] [F]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

E = int(sys.argv[1]) if len(sys.argv) > 1 else 4
F = int(sys.argv[2]) if len(sys.argv) > 2 else 5
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 400
DT = jnp.bfloat16

# (name, H, W, Cin, Cout, stride, dilation)
SHAPES = [
    ("l2.3x3", 38, 38, 128, 128, 1, 1),
    ("l2.0dn", 75, 75, 128, 128, 2, 1),
    ("l3.3x3", 19, 19, 256, 256, 1, 1),
    ("l3.0dn", 38, 38, 256, 256, 2, 1),
    ("l4.3x3", 19, 19, 512, 512, 1, 2),
]


def chain_time(fn, x, w):
    """fn(x, w) -> array. Returns seconds/iter via a scanned dependency chain."""

    @jax.jit
    def run(x, w):
        def body(c, _):
            # perturb BOTH operands: the adapted passes compute fresh
            # per-episode kernels every step, so weight-layout transforms
            # (e.g. XLA's grouped-conv weight transpose) are on the critical
            # path in production and must not be hoisted out of the chain
            out = fn(x + c * 1e-12, w + c.astype(w.dtype) * 1e-12)
            s = jnp.sum(out.astype(jnp.float32)) * 1e-20
            return s.astype(x.dtype), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=ITERS)
        return c

    _ = float(run(x, w))  # compile + warm
    t0 = time.perf_counter()
    _ = float(run(x, w))
    return (time.perf_counter() - t0) / ITERS


def conv(x, w, stride, dil):
    pad = dil
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        rhs_dilation=(dil, dil), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def shift9(x, w, stride, dil):
    """Per-episode 3x3 conv as 9 shifted batched GEMMs: no weight transpose
    (w[:, dy, dx] slices are contiguous in (Ci, Co)), no patch tensor.
    x: (E, F, H, W, Ci), w: (E, 3, 3, Ci, Co)."""
    e, f, hh, ww, ci = x.shape
    pad = dil
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho = (hh - 1) // stride + 1
    wo = (ww - 1) // stride + 1
    out = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, :, dy * dil : dy * dil + hh : stride,
                    dx * dil : dx * dil + ww : stride, :]
            t = jnp.einsum("efhwi,eio->efhwo", xs, w[:, dy, dx],
                           preferred_element_type=jnp.float32)
            out = t if out is None else out + t
    assert out.shape[2] == ho and out.shape[3] == wo, (out.shape, ho, wo)
    return out.astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} E={E} F={F} dtype={DT.__name__} iters={ITERS}")
    print(f"{'shape':8s} {'dense_fwd':>10s} {'group_fwd':>10s} {'shift9':>10s} "
          f"{'group_dw':>10s} {'shift9_dw':>10s} {'dense_f+b':>10s} {'TF/s grp/s9':>12s}")
    for name, H, W, ci, co, s, d in SHAPES:
        Ho, Wo = (H - 1) // s + 1, (W - 1) // s + 1  # pad == dil keeps size/stride
        x = jnp.asarray(rng.randn(E, F, H, W, ci), DT)
        w_ep = jnp.asarray(rng.randn(E, 3, 3, ci, co) * 0.05, DT)
        w_sh = w_ep[0]
        dy = jnp.asarray(rng.randn(E, F, Ho, Wo, co), DT)

        vconv = jax.vmap(partial(conv, stride=s, dil=d))
        s9 = partial(shift9, stride=s, dil=d)

        def gdw9(x, w):
            f = lambda w_: jnp.vdot(s9(x, w_).astype(jnp.float32), dy.astype(jnp.float32))
            return jax.grad(f)(w)

        def dense(x, w):
            return conv(x.reshape(E * F, H, W, ci), w, s, d)

        # per-episode dW: grad wrt w of the vmapped conv against a fixed dy
        def gdw(x, w):
            f = lambda w_: jnp.vdot(vconv(x, w_).astype(jnp.float32), dy.astype(jnp.float32))
            return jax.grad(f)(w)

        # per-episode dx with per-episode kernels
        def gdx(x, w):
            f = lambda x_: jnp.vdot(vconv(x_, w).astype(jnp.float32), dy.astype(jnp.float32))
            return jax.grad(f)(x)

        def dfb(x, w):
            f = lambda xw: jnp.sum(dense(xw[0], xw[1]).astype(jnp.float32) ** 2)
            gx, gw = jax.grad(f)((x, w))
            return gx

        # correctness of shift9 vs the grouped conv before timing it
        ref = vconv(x, w_ep)
        got = s9(x, w_ep)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        td = chain_time(dense, x, w_sh)
        tg = chain_time(vconv, x, w_ep)
        t9 = chain_time(s9, x, w_ep)
        tdw = chain_time(gdw, x, w_ep)
        tdw9 = chain_time(gdw9, x, w_ep)
        tdfb = chain_time(dfb, x, w_sh)
        flops = 2 * E * F * Ho * Wo * 9 * ci * co
        print(
            f"{name:8s} {td*1e3:9.3f}ms {tg*1e3:9.3f}ms {t9*1e3:9.3f}ms "
            f"{tdw*1e3:9.3f}ms {tdw9*1e3:9.3f}ms {tdfb*1e3:9.3f}ms "
            f"{flops/tg/1e12:6.1f}/{flops/t9/1e12:5.1f}  err={err:.4f}"
        )


if __name__ == "__main__":
    main()
