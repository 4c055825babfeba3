"""Training-step benchmark: full second-order interactron train step
(grads+clip+two Adams) episodes/sec on one chip.

    python tools/bench_train.py [--batch 8] [--inner 1]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--inner", type=int, default=1)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument(
        "--flash",
        default=True,
        action=argparse.BooleanOptionalAction,
        help="--no-flash routes attention through the materializing XLA path "
        "(the MODEL.FLASH_ATTENTION production knob)",
    )
    ap.add_argument("--chunked", action="store_true")
    ap.add_argument("--scan", action="store_true",
                    help="chain the steps in one device-side lax.scan "
                    "(amortizes the axon tunnel's per-call dispatch)")
    ap.add_argument("--prng", default=None,
                    help="override MODEL.PRNG_IMPL (rbg|threefry2x32)")
    ap.add_argument("--inner-shift", action="store_true",
                    help="MODEL.INNER_SHIFT_CONV=True (shifted-GEMM convs in "
                    "the twice-differentiated inner pass)")
    ap.add_argument("--remat-dropout", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="MODEL.REMAT_DROPOUT (regenerate dropout masks in "
                    "the backward instead of saving them as residuals)")
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--config", default="configs/interactron.yaml")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from interactron_tpu.ops import attention as attn_mod
    from interactron_tpu.ops.attention import set_chunked_attention, set_flash_attention

    set_chunked_attention(args.chunked)
    if args.block:
        attn_mod._CHUNK_BLOCK = args.block
    from interactron_tpu.tasks import InteractronTask
    from interactron_tpu.utils.config import get_config
    from __graft_entry__ import _episode_batch
    import optax

    set_flash_attention(args.flash)
    cfg = get_config(args.config)
    # go through the production knob: task build re-derives the kernel gate
    # from MODEL.FLASH_ATTENTION (tasks/base.py), so --no-flash must say so
    setattr(cfg.MODEL, "FLASH_ATTENTION", bool(args.flash))
    if args.prng:
        setattr(cfg.MODEL, "PRNG_IMPL", args.prng)
    if args.inner_shift:
        setattr(cfg.MODEL, "INNER_SHIFT_CONV", True)
    setattr(cfg.MODEL, "REMAT_DROPOUT", bool(args.remat_dropout))
    cfg.TRAINER.INNER_BATCH = args.inner
    task = InteractronTask(cfg)
    task.inner_batch = args.inner
    params, frozen = task.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    batch = _episode_batch(
        np.random.RandomState(0), args.batch, 5, task.img_size, task.max_boxes, task.num_classes
    )
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    path_state = task.init_path_state(64)

    def step(params, opt_state, batch, rng, chain, path_state):
        b = dict(batch)
        b["frames"] = b["frames"] + chain * 1e-9
        grads, metrics, path_state = task.grads_and_metrics(params, frozen, b, rng, path_state)
        upd, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        return params, opt_state, metrics["total_loss"] * 1e-9, path_state

    if args.scan:
        # device-side step chain (same methodology as bench.py): the axon
        # tunnel serializes per-call dispatch (~46 ms/step measured between
        # 275 ms device-busy and 321 ms host-loop wall); a real training
        # loop overlaps dispatch with compute, so sustained device
        # throughput is the metric. Identical per-step work and carry
        # (params, opt state, path state) as the host loop.
        def run_scan(params, opt_state, batch, rng, chain, path_state, length):
            def body(carry, i):
                params, opt_state, chain, path_state = carry
                params, opt_state, chain, path_state = step(
                    params, opt_state, batch, jax.random.fold_in(rng, i),
                    chain, path_state,
                )
                return (params, opt_state, chain, path_state), ()

            carry, _ = jax.lax.scan(
                body, (params, opt_state, chain, path_state),
                jnp.arange(length), length=length,
            )
            return carry

        fn = jax.jit(run_scan, static_argnums=(6,))
        t0 = time.perf_counter()
        # warm with the SAME length (length is static: a different value
        # would recompile inside the timed region)
        carry = fn(params, opt_state, batch, jax.random.PRNGKey(1), jnp.zeros(()), path_state, args.iters)
        _ = float(carry[2])
        print(f"compile+first chain: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        carry = fn(params, opt_state, batch, jax.random.PRNGKey(2), jnp.zeros(()), path_state, args.iters)
        _ = float(carry[2])
        dt = time.perf_counter() - t0
        print(
            f"train step (scan): {dt/args.iters*1000:.1f} ms/step, "
            f"{args.batch*args.iters/dt:.2f} episodes/s (batch={args.batch}, inner={args.inner})",
            flush=True,
        )
        return

    fn = jax.jit(step)
    chain = jnp.zeros(())
    t0 = time.perf_counter()
    params, opt_state, chain, path_state = fn(params, opt_state, batch, jax.random.PRNGKey(1), chain, path_state)
    _ = float(chain)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(args.iters):
        params, opt_state, chain, path_state = fn(params, opt_state, batch, jax.random.PRNGKey(2 + i), chain, path_state)
    _ = float(chain)
    dt = time.perf_counter() - t0
    print(
        f"train step: {dt/args.iters*1000:.1f} ms/step, "
        f"{args.batch*args.iters/dt:.2f} episodes/s (batch={args.batch}, inner={args.inner})",
        flush=True,
    )


if __name__ == "__main__":
    main()
