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


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_random_bits returns zeros in interpret mode")
def test_flash_attention_dropout_semantics():
    """In-kernel dropout: deterministic per seed, unbiased scaling, and the
    custom VJP matches finite differences through the same fixed mask.
    Hardware-only: the interpreter's PRNG is a stub."""
    from jax.experimental.pallas import tpu as pltpu

    from interactron_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(3)
    b, h, t, d = 1, 1, 64, 64
    q, k, v = _rand(rng, b, h, t, d), _rand(rng, b, h, t, d), jnp.ones((b, h, t, d))
    seed = jnp.asarray([123], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        o1 = fa._flash(q, k, v, seed, 0.3)
        o2 = fa._flash(q, k, v, seed, 0.3)
        o_ref = fa._flash(q, k, v, seed, 0.0)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))  # same seed -> same mask
    # with v == ones, output rows are sum of kept probs / (1-rate):
    # expectation equals 1; check the batch mean is in a sane band
    mean = float(jnp.mean(o1))
    assert 0.85 < mean < 1.15, mean

    # gradient check through the fixed mask
    w = _rand(rng, b, h, t, d)
    vv = _rand(rng, b, h, t, d)

    def loss(q):
        return jnp.sum(fa._flash(q, k, vv, seed, 0.3) * w)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(q)
        eps = 1e-3
        for idx in [(0, 0, 3, 5), (0, 0, 40, 60)]:
            dq = jnp.zeros_like(q).at[idx].set(eps)
            fd = (loss(q + dq) - loss(q - dq)) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), float(fd), rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("t,s", [(200, 200), (130, 260)])
def test_flash2_second_order_matches_reference(t, s):
    """The hybrid (Pallas fwd + blockwise differentiable bwd) must agree
    with plain attention at first AND second order — it serves the
    twice-differentiated meta inner loss (interactron.py:99-123)."""
    from jax.experimental.pallas import tpu as pltpu

    from interactron_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(5)
    b, h, d = 1, 2, 64
    q = _rand(rng, b, t, h * d)
    k = _rand(rng, b, s, h * d)
    v = _rand(rng, b, s, h * d)
    w = _rand(rng, b, t, h * d)

    def plain(q, k, v):
        qh = q.reshape(b, t, h, d)
        kh = k.reshape(b, s, h, d)
        vh = v.reshape(b, s, h, d)
        logits = jnp.einsum("bthd,bshd->bhts", qh, kh) / np.sqrt(d)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhts,bshd->bthd", p, vh).reshape(b, t, h * d)

    def outer(fn):
        def f(k):
            g = jax.grad(lambda q: jnp.sum(fn(q, k, v) * w))(q)
            return jnp.sum(g * (w + 0.3))
        return f

    with pltpu.force_tpu_interpret_mode():
        o1 = fa.flash_attention_2nd_bthd(q, k, v, h)
        g1 = jax.grad(lambda q: jnp.sum(fa.flash_attention_2nd_bthd(q, k, v, h) * w))(q)
        gg1 = jax.grad(outer(lambda q, k, v: fa.flash_attention_2nd_bthd(q, k, v, h)))(k)
    o2 = plain(q, k, v)
    g2 = jax.grad(lambda q: jnp.sum(plain(q, k, v) * w))(q)
    gg2 = jax.grad(outer(plain))(k)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=3e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gg1), np.asarray(gg2), atol=3e-3, rtol=1e-2)
