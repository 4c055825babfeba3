"""Chunked-scan attention (the any-order-differentiable big-attention
fallback) vs the plain path: forward and second-order grads."""

import numpy as np
import jax
import jax.numpy as jnp

from interactron_tpu.ops.attention import _chunked_attention, dot_product_attention


def _plain(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(jnp.float32(d))
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p.astype(q.dtype), v)


def test_chunked_matches_plain_and_double_grad():
    rng = np.random.RandomState(0)
    b, h, t, s, d = 1, 2, 300, 200, 16  # t not a block multiple
    q = jnp.asarray(rng.randn(b, h, t, d).astype("float32") * 0.3)
    k = jnp.asarray(rng.randn(b, h, s, d).astype("float32") * 0.3)
    v = jnp.asarray(rng.randn(b, h, s, d).astype("float32"))
    scale = 1.0 / (d ** 0.5)
    out = _chunked_attention(q, k, v, scale, block=128)
    ref = _plain(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # grad-of-grad (the meta pattern): differentiate through an inner grad
    w = jnp.asarray(rng.randn(b, h, t, d).astype("float32"))

    def outer(k, impl):
        def inner(q):
            o = impl(q, k, v, scale, block=128) if impl is _chunked_attention else _plain(q, k, v)
            return jnp.sum(jnp.tanh(o) * w)

        g = jax.grad(inner)(q)
        return jnp.sum(g ** 2)

    g1 = jax.grad(lambda k: outer(k, _chunked_attention))(k)
    g2 = jax.grad(lambda k: outer(k, _plain))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-4, rtol=1e-3)
