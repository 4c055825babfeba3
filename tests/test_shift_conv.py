"""Shifted-GEMM conv formulation (models/layers.py::episode_shift_convs).

The fast-weight detector passes trace stride-1 3x3 convs as 9 shifted
batched GEMMs (no per-episode weight transpose). These tests pin the
formulation to the direct convolution: forward values, per-episode weight
gradients under vmap, and a second-order (meta-style grad-through-grad)
quantity — the inner pass is differentiated twice in training.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interactron_tpu.models.layers as L


def _conv(dil):
    return L.Conv2d(16, (3, 3), (1, 1), padding=dil, dilation=(dil, dil),
                    dtype=jnp.float32)


@pytest.mark.parametrize("dil", [1, 2])
def test_shift_conv_matches_direct_fwd_and_dw(dil):
    m = _conv(dil)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 9, 9, 8), jnp.float32)  # (E, F, H, W, C)
    w = m.init(jax.random.PRNGKey(0), x[0])["params"]["kernel"]
    we = jnp.stack([w, w * 1.7])  # distinct per-episode kernels

    def fwd(xe, we):
        return jax.vmap(lambda xi, wi: m.apply({"params": {"kernel": wi}}, xi))(xe, we)

    ref = fwd(x, we)
    with L.episode_shift_convs():
        got = fwd(x, we)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)

    g_ref = jax.grad(lambda w_: jnp.sum(fwd(x, w_) ** 2))(we)
    with L.episode_shift_convs():
        g_got = jax.grad(lambda w_: jnp.sum(fwd(x, w_) ** 2))(we)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_got), rtol=1e-4, atol=1e-3)


def test_shift_conv_second_order_matches_direct():
    m = _conv(2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 9, 9, 8), jnp.float32)
    w0 = m.init(jax.random.PRNGKey(0), x)["params"]["kernel"]
    tgt = jnp.asarray(rng.randn(5, 9, 9, 16), jnp.float32)

    def outer(w, scope):
        def apply(w_):
            ctx = L.episode_shift_convs() if scope else contextlib.nullcontext()
            with ctx:
                return m.apply({"params": {"kernel": w_}}, x)

        g = jax.grad(lambda w_: jnp.sum(apply(w_) ** 2))(w)
        w_fast = w - 0.01 * jnp.clip(g, -0.01, 0.01)
        return jnp.sum((apply(w_fast) - tgt) ** 2)

    g_ref = jax.grad(lambda w: outer(w, False))(w0)
    g_s9 = jax.grad(lambda w: outer(w, True))(w0)
    rel = float(jnp.max(jnp.abs(g_ref - g_s9)) / (jnp.max(jnp.abs(g_ref)) + 1e-9))
    assert rel < 1e-5


def test_shift_conv_skips_strided_and_frozen():
    """Strided 3x3 and frozen convs must keep the direct lowering (the
    shifted form measured slower for strided; frozen kernels are never
    per-episode)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 9, 8), jnp.float32)
    for kwargs in (dict(strides=(2, 2), padding=1), dict(padding=1, frozen=True)):
        m = L.Conv2d(16, (3, 3), dtype=jnp.float32, **kwargs)
        v = m.init(jax.random.PRNGKey(0), x)
        with L.episode_shift_convs():
            jpr = str(jax.make_jaxpr(lambda xi: m.apply(v, xi))(x))
        assert "conv_general_dilated" in jpr, kwargs
    # and the eligible case really does engage
    m = L.Conv2d(16, (3, 3), padding=1, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    with L.episode_shift_convs():
        jpr = str(jax.make_jaxpr(lambda xi: m.apply(v, xi))(x))
    assert "conv_general_dilated" not in jpr and jpr.count("dot_general") == 9
