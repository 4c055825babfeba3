"""Lockstep dispatcher (parallel/lockstep.py): compile → barrier → run.

The multi-process pieces (coordination-service barrier across real
processes) are exercised end-to-end by tests/test_distributed.py::
test_two_process_trainer_epoch; here the AOT path runs single-process with
the process count and barrier stubbed, checking signature caching, barrier
sequencing, and numeric agreement with plain jit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from interactron_tpu.parallel import lockstep
from interactron_tpu.parallel.lockstep import LockstepFn


def test_single_process_passthrough():
    f = LockstepFn(lambda x: x * 2.0, "t")
    out = f(jnp.arange(4.0))
    np.testing.assert_allclose(np.asarray(out), [0.0, 2.0, 4.0, 6.0])
    assert not f._compiled  # plain jit path, no AOT cache entries


def test_aot_path_caches_per_signature(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    barriers = []
    monkeypatch.setattr(lockstep, "_barrier", barriers.append)

    f = LockstepFn(lambda x, s: x * s, "step")
    a4 = jnp.arange(4.0)
    a8 = jnp.arange(8.0)

    out = f(a4, 3.0)
    np.testing.assert_allclose(np.asarray(out), np.arange(4.0) * 3.0)
    assert barriers == ["lockstep:step:1"]

    # same signature, different scalar VALUE: cache hit, no new barrier
    out = f(a4, 5.0)
    np.testing.assert_allclose(np.asarray(out), np.arange(4.0) * 5.0)
    assert len(barriers) == 1 and len(f._compiled) == 1

    # new shape: one more compile + barrier
    out = f(a8, 2.0)
    np.testing.assert_allclose(np.asarray(out), np.arange(8.0) * 2.0)
    assert barriers == ["lockstep:step:1", "lockstep:step:2"]
    assert len(f._compiled) == 2


def test_aot_path_honors_donation(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(lockstep, "_barrier", lambda name: None)

    f = LockstepFn(lambda x: x + 1.0, "don", donate_argnums=(0,))
    x = jnp.ones((8,))
    y = f(x)
    np.testing.assert_allclose(np.asarray(y), 2.0)
    assert x.is_deleted()  # the donated buffer was consumed
