"""On-TPU equivalence check: merged vs split second-order kernels.

The merged kernel (_sov_merged_kernel) must produce BIT-COMPATIBLE results
with the row+column pair for all four cotangents, INCLUDING with dropout
active (the counter-based mask streams are keyed per (head, q_block,
k_block) tile and must line up between the row sweep and the column sweep's
per-tile regeneration). Interpret mode cannot run pltpu.prng_random_bits, so
this runs on the real chip.

    python tools/check_so_merged.py
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from interactron_tpu.ops import flash_attention as fa


def run(rate):
    rng = np.random.RandomState(3)
    b, t, s, h, d = 2, 300, 300, 4, 64
    mk = lambda *sh: jnp.asarray(rng.randn(*sh).astype(np.float32) * 0.3,
                                 jnp.bfloat16)
    q, do, A = mk(b, t, h * d), mk(b, t, h * d), mk(b, t, h * d)
    k, v, Bc, C = mk(b, s, h * d), mk(b, s, h * d), mk(b, s, h * d), mk(b, s, h * d)
    seed = jnp.zeros((1, 1), jnp.int32) + 7

    bq = fa._so_bq(t, s)
    t_pad = fa._pad_len(t, bq)
    g_sz = fa._group(h, d)
    ng = h // g_sz

    def cots(merged):
        os.environ["SO_MERGED"] = "1" if merged else "0"

        @jax.jit
        def f(q, k, v, do, A, Bc, C):
            o, L = fa._fwd_impl(q, k, v, seed, rate, h, bq=bq)
            gf = fa._pad_t(do, t_pad)
            D = fa._make_D(gf, o, b, t_pad, h, d, ng, g_sz)
            return fa._so_vjp_impl(q, k, v, do, A, Bc, C, L, D, seed, rate, h)

        return jax.device_get(f(q, k, v, do, A, Bc, C))

    a = cots(False)
    m = cots(True)
    names = ["c_q", "c_k", "c_v", "c_dO"]
    ok = True
    for n, x, y in zip(names, a, m):
        diff = float(np.max(np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32))))
        ref = float(np.max(np.abs(np.asarray(x, np.float32)))) + 1e-9
        print(f"rate={rate} {n}: max|split-merged|={diff:.3e} (max|split|={ref:.3e})")
        # split accumulates c_k/c_v per 6-block chunk, merged per q-block —
        # fp32 summation order differs, so allow tiny accumulation noise
        ok &= diff <= 2e-3 * ref + 1e-6
    return ok


if __name__ == "__main__":
    good = run(0.0) & run(0.1)
    print("OK" if good else "MISMATCH")
    sys.exit(0 if good else 1)
