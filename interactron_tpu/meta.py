"""Meta-learning core: the clipped-SGD inner loop as pure pytree functions.

The reference's parameter machinery (utils/meta_utils.py — recursive module
walks, clone/detach/set_parameters) collapses into `jax.grad` over the
detector's trainable param pytree:

  * the frozen subset (stem+layer1, FrozenBN stats) lives in a separate
    variable collection and simply never appears here, reproducing the
    requires_grad partition (meta_utils.py:5-24);
  * `sgd_step(params, grads, lr, clip=0.01)` = p - clip(lr*g, ±0.01)
    elementwise (meta_utils.py:135-142) — the clip's VJP passes gradient
    only in the unsaturated region, same as torch;
  * second-order supervisor gradients come from differentiating through
    `adapt` (the reference's create_graph=True at interactron.py:99-100);
  * the detector's first-order step stops the gradient through g
    (detach_gradients at interactron.py:126).
"""

import jax
import jax.numpy as jnp
from flax import traverse_util


def _inner_static(path):
    """Reference quirk (meta_utils.py:5-24): get_parameters recurses into
    model.children() and collects _parameters of LEAF modules only, so the
    direct parameters of torch.nn.MultiheadAttention (in_proj_weight/bias —
    MHA has an out_proj child, making it a non-leaf) are silently excluded
    from the inner-loop adaptation. They still participate in every forward
    as the ORIGINAL module params, so outer gradients from the supervisor
    losses flow into them. In our layout that subset is the q/k/v projection
    kernels+biases of every DETR self_attn/cross_attn."""
    return any(p in ("self_attn", "cross_attn") for p in path) and any(
        p in ("q_proj", "k_proj", "v_proj") for p in path
    )


def split_inner(det_params):
    """Partition detector params into (adapted, static) flat dicts for the
    inner loop: `adapted` is what the reference's get_parameters returns,
    `static` the in_proj subset it skips (see _inner_static)."""
    flat = traverse_util.flatten_dict(det_params)
    adapted = {k: v for k, v in flat.items() if not _inner_static(k)}
    static = {k: v for k, v in flat.items() if _inner_static(k)}
    return adapted, static


def merge_inner(adapted, static):
    """Inverse of split_inner: rebuild the detector param tree."""
    return traverse_util.unflatten_dict({**adapted, **static})


def clipped_sgd_step(params, grads, lr, clip=0.01, dtype=None):
    """One inner-loop update: p - clip(lr * g, -clip, +clip) per leaf.

    `dtype` (e.g. bfloat16) computes and stores the fast weights in reduced
    precision: the adapted forward casts weights to the compute dtype anyway,
    so this only moves the rounding earlier while halving the HBM traffic of
    the per-episode grad/fast-weight trees — the dominant cost of the meta
    step on TPU (see tools/perf_bisect.py findings)."""

    def upd(p, g):
        if dtype is not None:
            p = p.astype(dtype)
            g = g.astype(dtype)
        return p - jnp.clip(lr * g, -clip, clip).astype(p.dtype)

    return jax.tree_util.tree_map(upd, params, grads)


def learned_loss_value(fusion_out):
    """torch.norm of the per-prediction loss tokens (interactron.py:98):
    the Frobenius norm over the whole (b, s, 50, 1) tensor."""
    x = fusion_out["loss"].astype(jnp.float32)
    return jnp.sqrt(jnp.sum(jnp.square(x)))


def adapt(det_params, lr, inner_loss_fn, clip=0.01):
    """Run one learned-loss adaptation step.

    Args:
      det_params: detector trainable params (pytree). Differentiation through
        the returned fast weights gives second-order terms; wrap det_params
        in stop_gradient at the call site to reproduce the reference's
        detached supervisor path.
      inner_loss_fn: det_params -> scalar learned loss (closes over fusion
        params and the episode).

    Returns:
      (fast_params, grads): adapted weights and the raw inner grads.
    """
    grads = jax.grad(inner_loss_fn)(det_params)
    return clipped_sgd_step(det_params, grads, lr, clip), grads
