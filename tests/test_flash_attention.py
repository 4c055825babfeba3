"""Pallas fused attention vs the jnp reference path (interpret mode on CPU):
forward, custom-VJP backward, and cross-attention lengths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactron_tpu.ops.attention import dot_product_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype("float32") * 0.3)


@pytest.mark.parametrize("t,s,d", [(200, 200, 64), (50, 361, 64), (361, 361, 32)])
def test_flash_attention_matches_reference_interpret(t, s, d):
    from jax.experimental.pallas import tpu as pltpu

    from interactron_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(0)
    b, h = 1, 2
    q, k, v = _rand(rng, b, h, t, d), _rand(rng, b, h, s, d), _rand(rng, b, h, s, d)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("t,s,d", [(150, 150, 64), (60, 200, 32)])
def test_flash_attention_backward_matches(t, s, d):
    from jax.experimental.pallas import tpu as pltpu

    from interactron_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(1)
    b, h = 1, 2
    q, k, v = _rand(rng, b, h, t, d), _rand(rng, b, h, s, d), _rand(rng, b, h, s, d)
    w = _rand(rng, b, h, t, d)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) * w)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v) * w)

    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=5e-5)
