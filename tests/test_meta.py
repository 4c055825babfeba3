"""Meta-core semantics: clipped SGD step, second-order gradient through the
inner loop (finite-difference checked), PathStorage behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from interactron_tpu.meta import adapt, clipped_sgd_step
from interactron_tpu.utils.path_storage import PathStorage, PathStorageBank


def test_clipped_sgd_matches_reference_semantics():
    p = {"a": jnp.asarray([1.0, 2.0, 3.0])}
    g = {"a": jnp.asarray([0.5, 100.0, -100.0])}
    out = clipped_sgd_step(p, g, lr=0.1, clip=0.01)
    # lr*g = [0.05, 10, -10] -> clip to [0.01, 0.01, -0.01]
    np.testing.assert_allclose(np.asarray(out["a"]), [0.99, 1.99, 3.01], atol=1e-7)


def test_second_order_gradient_finite_difference():
    """d/dw of L_outer(p - clip(lr * dL_inner(p, w)/dp)) must match FD."""
    lr, clip = 0.1, 0.05

    def inner_loss(p, w):
        return jnp.sum(jnp.sin(p * w)) + jnp.sum(p**2) * w[0]

    def outer(w, p0):
        fast, _ = adapt(p0, lr, lambda p: inner_loss(p, w), clip=clip)
        return jnp.sum(jnp.cos(fast) * fast**2)

    p0 = jnp.asarray([0.3, -0.2, 0.11])
    w = jnp.asarray([0.7, 1.3, -0.4])
    g = jax.grad(outer)(w, p0)
    eps = 1e-4
    for i in range(3):
        dw = jnp.zeros(3).at[i].set(eps)
        fd = (outer(w + dw, p0) - outer(w - dw, p0)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-3, atol=1e-5)


def test_clip_blocks_gradient_in_saturated_region():
    def outer(w):
        p0 = jnp.asarray([1.0])
        fast, _ = adapt(p0, 1.0, lambda p: jnp.sum(p * w * 100.0), clip=0.01)
        return jnp.sum(fast)

    # inner grad = 100*w -> clipped for |w| >> 0 -> d outer/d w == 0
    g = jax.grad(outer)(jnp.asarray([5.0]))
    np.testing.assert_allclose(np.asarray(g), [0.0], atol=1e-7)
    # unsaturated region passes gradient: lr*g = w, |w| < clip
    g2 = jax.grad(outer)(jnp.asarray([0.00005]))
    assert abs(float(g2[0]) + 100.0) < 1e-4  # d(p - w*100)/dw = -100


def test_path_storage_reference_behavior():
    """Mirrors storage_utils.py:25-50: node label = first action of the best
    path through that node."""
    s = PathStorage()
    s.add_path([0, 1, 2, 3], 5.0)
    assert s.get_label([0, 1, 2, 3]) == [0, 1, 2, 3]
    # better path through a different branch updates the root label
    s.add_path([2, 2, 0, 1], 1.0)
    assert s.get_label([2, 2, 0, 1]) == [2, 2, 0, 1]
    assert s.get_label([0, 1, 2, 3]) == [2, 1, 2, 3]  # root prefers 2 now
    # worse path changes nothing
    s.add_path([3, 0, 0, 0], 9.0)
    assert s.get_label([3, 0, 0, 0]) == [2, 0, 0, 0]


def test_path_bank_batch_ordering():
    bank = PathStorageBank()
    rewards = np.asarray([3.0, 1.0], np.float32)
    actions = np.asarray([[0, 1, 2, 3], [1, 1, 1, 1]], np.int32)
    uids = np.asarray([7, 7], np.int32)
    out = bank.update_and_label(rewards, actions, uids)
    # first episode sees only itself; second sees the first already stored
    assert list(out[0]) == [0, 1, 2, 3]
    assert list(out[1]) == [1, 1, 1, 1]
    out2 = bank.update_and_label(
        np.asarray([9.0], np.float32), np.asarray([[0, 1, 2, 3]], np.int32), np.asarray([7], np.int32)
    )
    assert list(out2[0]) == [1, 1, 2, 3]  # root label now from the rew=1 path


def test_split_inner_excludes_mha_in_proj():
    """The inner loop must skip exactly the MHA q/k/v projections — the
    reference's get_parameters collects leaf-module params only, so
    nn.MultiheadAttention's direct in_proj params are never adapted
    (meta_utils.py:5-24; verified live in test_reference_differential)."""
    import jax.numpy as jnp

    from interactron_tpu.meta import merge_inner, split_inner

    tree = {
        "backbone": {"layer2_block0": {"conv1": {"kernel": jnp.ones((1, 1, 2, 2))}}},
        "encoder_layer0": {
            "self_attn": {
                "q_proj": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
                "k_proj": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
                "v_proj": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
                "out_proj": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
            },
            "norm1": {"scale": jnp.ones(2), "bias": jnp.zeros(2)},
        },
        "decoder": {
            "layer0": {
                "cross_attn": {
                    "q_proj": {"kernel": jnp.ones((2, 2))},
                    "out_proj": {"kernel": jnp.ones((2, 2))},
                }
            }
        },
        "class_embed": {"kernel": jnp.ones((2, 3))},
    }
    adapted, static = split_inner(tree)
    static_keys = set(static)
    assert ("encoder_layer0", "self_attn", "q_proj", "kernel") in static_keys
    assert ("encoder_layer0", "self_attn", "k_proj", "bias") in static_keys
    assert ("decoder", "layer0", "cross_attn", "q_proj", "kernel") in static_keys
    # out_proj IS a leaf Linear child in torch -> adapted; so is everything else
    assert ("encoder_layer0", "self_attn", "out_proj", "kernel") in set(adapted)
    assert ("class_embed", "kernel") in set(adapted)
    assert ("backbone", "layer2_block0", "conv1", "kernel") in set(adapted)
    assert len(static_keys) == 7

    rebuilt = merge_inner(adapted, static)
    assert jax.tree_util.tree_structure(rebuilt) == jax.tree_util.tree_structure(tree)
