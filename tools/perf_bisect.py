"""Perf bisection on the real chip: time the pieces of the predict and
train steps separately to locate bottlenecks. Run on TPU:

    python tools/perf_bisect.py [--flash]

Prints per-stage ms for batch=8 episodes.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    # chain-free simple timing: ok for relative comparisons
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    # force one host fetch to defeat async-ack oddities
    leaf = jax.tree_util.tree_leaves(o)[0]
    _ = np.asarray(leaf).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from interactron_tpu.ops.attention import set_flash_attention
    from interactron_tpu.tasks import InteractronTask
    from interactron_tpu.utils.config import get_config
    from interactron_tpu.meta import clipped_sgd_step, learned_loss_value
    from __graft_entry__ import _episode_batch

    set_flash_attention(args.flash)
    cfg = get_config("configs/interactron.yaml")
    task = InteractronTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    B = args.batch
    batch = _episode_batch(np.random.RandomState(0), B, 5, task.img_size, task.max_boxes, task.num_classes)
    frames = jax.device_put(batch["frames"])  # (B,5,H,W,3)

    det = jax.jit(lambda p, x: task.detr_apply(p, frozen, x.reshape(-1, *x.shape[2:])))
    print("detr fwd (B*5 frames): %.1f ms" % timed(det, params["detector"], frames))

    prefix_fn = jax.jit(lambda x: task.frozen_prefix(frozen, x.reshape(-1, *x.shape[2:])))
    print("frozen prefix (stem+layer1): %.1f ms" % timed(prefix_fn, frames))
    prefix = prefix_fn(frames)

    from_prefix = jax.jit(
        lambda p, pr: task.detr_apply(p, frozen, pr, stage="from_prefix")
    )
    print("detr from_prefix fwd: %.1f ms" % timed(from_prefix, params["detector"], prefix))

    det_out = from_prefix(params["detector"], prefix)
    fus_in = {k: det_out[k].reshape(B, 5, *det_out[k].shape[1:])
              for k in ("embedded_memory_features", "box_features", "pred_logits", "pred_boxes")}
    fus_only = jax.jit(lambda p, o: jax.vmap(lambda oo: task.fusion_apply(p, oo))(o))
    print("fusion fwd alone: %.1f ms" % timed(fus_only, params["fusion"], fus_in))

    # the REAL predict inner: bf16-rooted grad at the staged prefix
    from interactron_tpu.meta import clipped_sgd_step, merge_inner, split_inner

    def staged_inner_grad(p, x):
        def one(fr):
            pr = task.frozen_prefix(frozen, fr)
            adapted, static = split_inner(p["detector"])
            cast = lambda t: jax.tree_util.tree_map(
                lambda q: q.astype(task.inner_dtype) if task.inner_dtype else q, t)
            a_b, s_c = cast(adapted), cast(static)
            def il(a):
                o = task.detr_apply(merge_inner(a, s_c), frozen, pr, stage="from_prefix")
                f = task.fusion_apply(p["fusion"], o)
                return learned_loss_value(f)
            return jax.grad(il)(a_b)
        return jax.vmap(one)(x)

    print("staged inner grad (bf16 root): %.1f ms" % timed(jax.jit(staged_inner_grad), params, frames))

    g = jax.jit(staged_inner_grad)(params, frames)

    def update_and_detect(p, gg, x):
        def one(gi, fr):
            pr = task.frozen_prefix(frozen, fr[0:1])
            adapted, static = split_inner(p["detector"])
            fast = merge_inner(
                clipped_sgd_step(adapted, gi, task.adaptive_lr, dtype=task.inner_dtype),
                static,
            )
            return task.detr_apply(fast, frozen, pr, stage="from_prefix")["pred_logits"]
        return jax.vmap(one)(gg, x)

    print("clip+update+frame0 detect: %.1f ms" % timed(jax.jit(update_and_detect), params, g, frames))

    def fuse(p, x):
        out = task.detr_apply(p["detector"], frozen, x.reshape(-1, *x.shape[2:]))
        out = {k: v.reshape(B, 5, *v.shape[1:]) for k, v in out.items()}
        def one(o):
            return task.fusion_apply(p["fusion"], o)
        return jax.vmap(one)(out)

    print("detr+fusion fwd: %.1f ms" % timed(jax.jit(fuse), params, frames))

    def inner_grad(p, x):
        def one(fr):
            def il(dp):
                o = task.detr_apply(dp, frozen, fr)
                f = task.fusion_apply(p["fusion"], o)
                return learned_loss_value(f)
            return jax.grad(il)(p["detector"])
        return jax.vmap(one)(x)

    print("inner grad (vmap B): %.1f ms" % timed(jax.jit(inner_grad), params, frames))

    pred = jax.jit(lambda p, x: jax.vmap(
        lambda fr: task.predict(p, frozen, {"frames": fr[None]})
    )(x))
    print("full predict: %.1f ms" % timed(pred, params, frames))


if __name__ == "__main__":
    main()
