"""Task-model smoke + semantics tests on the tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.tiny_config import tiny_batch, tiny_config
from interactron_tpu import tasks


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def _flat_norms(tree):
    return {
        "/".join(str(p) for p in path): float(jnp.linalg.norm(leaf))
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def test_detr_task_grads(rng):
    cfg = tiny_config("detr")
    task = tasks.DETRTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    grads, metrics, _ = jax.jit(task.grads_and_metrics)(
        params, frozen, batch, jax.random.PRNGKey(1)
    )
    assert jax.tree_util.tree_structure(grads) == jax.tree_util.tree_structure(params)
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(float(metrics["loss_detector_ce"]))
    # frozen collection exists and carries the tiny backbone nothing (tiny
    # backbone is trainable) — for detr the params must include the backbone
    assert "backbone" in params["detector"]


def test_multiframe_task(rng):
    cfg = tiny_config("detr_multiframe")
    task = tasks.MultiFrameTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    grads, metrics, _ = jax.jit(task.grads_and_metrics)(
        params, frozen, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["total_loss"]))
    pred = jax.jit(task.predict)(params, frozen, jax.tree_util.tree_map(lambda x: x[:1], batch))
    assert pred["pred_logits"].shape[:3] == (1, 5, 6)


def test_interactron_random_task(rng):
    cfg = tiny_config("interactron_random")
    task = tasks.InteractronRandomTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    grads, metrics, _ = jax.jit(task.grads_and_metrics)(
        params, frozen, batch, jax.random.PRNGKey(1)
    )
    for k in ["loss_detector_ce", "loss_supervisor_ce", "total_loss"]:
        assert np.isfinite(float(metrics[k])), k
    # the supervisor path must push gradient into the fusion loss_decoder —
    # that ONLY happens through the second-order term (d fast / d fusion).
    norms = _flat_norms(grads["fusion"])
    loss_dec = [v for k, v in norms.items() if "loss_decoder" in k]
    assert loss_dec and max(loss_dec) > 0, "no second-order gradient reached the loss decoder"


def test_interactron_task_with_policy(rng):
    cfg = tiny_config("interactron")
    task = tasks.InteractronTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    pstate = task.init_path_state(8)
    grads, metrics, pstate = jax.jit(task.grads_and_metrics)(
        params, frozen, batch, jax.random.PRNGKey(1), pstate
    )
    assert np.isfinite(float(metrics["loss_supervisor_path"]))
    assert np.isfinite(float(metrics["policy_reward"]))
    # device path storage rows for both episodes were populated
    assert float(jnp.min(pstate["cost"][:2, 0])) < 1e29
    # action decoder receives policy gradient
    norms = _flat_norms(grads["fusion"])
    act = [v for k, v in norms.items() if "action_decoder" in k]
    assert act and max(act) > 0

    # predict + next_action surfaces
    ep = jax.tree_util.tree_map(lambda x: x[:1], batch)
    pred = jax.jit(task.predict)(params, frozen, ep)
    assert pred["pred_logits"].shape == (1, 1, 6, 8)
    na = jax.jit(task.next_action)
    for s in (1, 3):
        ep_s = dict(ep)
        ep_s["frames"] = ep["frames"][:, :s]
        a = na(params, frozen, ep_s)
        assert 0 <= int(a) < 4


def test_eval_metrics_deterministic(rng):
    cfg = tiny_config("interactron_random")
    task = tasks.InteractronRandomTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    em = jax.jit(task.eval_metrics)
    m1, _ = em(params, frozen, batch, jax.random.PRNGKey(5))
    m2, _ = em(params, frozen, batch, jax.random.PRNGKey(5))
    assert float(m1["total_loss"]) == float(m2["total_loss"])


def test_flash_attention_config_gate():
    """MODEL.FLASH_ATTENTION engages the kernel gate at task build, so the
    production train.py/evaluate.py path hits the same kernels bench.py
    measures (default follows the backend: on for TPU, off elsewhere)."""
    from interactron_tpu.ops import attention as attn

    prev = attn._USE_PALLAS
    try:
        cfg = tiny_config("interactron")
        tasks.InteractronTask(cfg)
        assert attn._USE_PALLAS == (jax.default_backend() == "tpu")
        setattr(cfg.MODEL, "FLASH_ATTENTION", True)
        tasks.InteractronTask(cfg)
        assert attn._USE_PALLAS is True
        setattr(cfg.MODEL, "FLASH_ATTENTION", False)
        tasks.InteractronTask(cfg)
        assert attn._USE_PALLAS is False
    finally:
        attn.set_flash_attention(prev)


def test_remat_dropout_grads_identical(rng):
    """MODEL.REMAT_DROPOUT only changes WHERE the dropout masks are computed
    (regenerated in the backward vs saved as residuals) — the second-order
    gradients must agree to fp32 rounding either side of the switch (XLA may
    reassociate the fused chains differently, so bit-equality only holds per
    compile; observed drift is ~1e-8 on near-zero leaves)."""
    from interactron_tpu.models.layers import set_remat_dropout

    cfg = tiny_config("interactron")
    task = tasks.InteractronTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    key = jax.random.PRNGKey(3)
    ps = task.init_path_state(8)
    out = {}
    try:
        for flag in (True, False):
            set_remat_dropout(flag)
            g, m, _ = jax.jit(
                lambda p, f, b, r, s: task.grads_and_metrics(p, f, b, r, s)
            )(params, frozen, batch, key, ps)
            out[flag] = (g, m)
    finally:
        set_remat_dropout(True)
    for a, b in zip(
        jax.tree_util.tree_leaves(out[True][0]), jax.tree_util.tree_leaves(out[False][0])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(
        float(out[True][1]["total_loss"]), float(out[False][1]["total_loss"]), rtol=1e-6
    )
