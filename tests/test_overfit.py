"""Learning-dynamics sanity: the detr task overfits a fixed tiny batch (loss
must drop substantially), and the interactron meta step moves both optimizer
groups."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from tests.tiny_config import tiny_batch, tiny_config
from interactron_tpu import tasks


def test_detr_overfits_fixed_batch():
    cfg = tiny_config("detr")
    task = tasks.DETRTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    batch = tiny_batch(np.random.RandomState(0), b=2)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        grads, metrics, _ = task.grads_and_metrics(params, frozen, batch, rng)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, metrics["total_loss"]

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(70):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, f"no overfit: {losses[0]:.3f} -> {losses[-1]:.3f}"


def test_interactron_step_updates_both_groups():
    cfg = tiny_config("interactron")
    task = tasks.InteractronTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    batch = tiny_batch(np.random.RandomState(1), b=2)
    grads, _, _ = jax.jit(task.grads_and_metrics)(params, frozen, batch, jax.random.PRNGKey(2))
    gdet = jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(grads["detector"])))
    gfus = jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(grads["fusion"])))
    assert float(gdet) > 0 and float(gfus) > 0
    assert np.isfinite(float(gdet)) and np.isfinite(float(gfus))
