"""Checkpoint IO: flax msgpack serialization of param/opt pytrees.

Covers the reference's two mechanisms (SURVEY.md §5.4) and adds resume:
  * running weight-average over the last SAVE_WINDOW epochs
    (interactron_trainer.py:48-65) via `RunningAverage`;
  * strict=False-style partial load (`load_checkpoint` keeps the target's
    entries for missing keys);
  * full train-state save/restore (params + both optimizer states + step),
    which the reference lacks.
"""

import os

import jax
import numpy as np
from flax import serialization


def save_pytree(path, tree):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tree)))


def load_pytree(path, target):
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def load_checkpoint(path, target_params):
    """Partial (strict=False analog) parameter load."""
    try:
        return load_pytree(path, target_params)
    except Exception:
        # structure mismatch: merge leaf-by-leaf where paths+shapes agree
        import msgpack  # noqa: F401

        loaded = serialization.msgpack_restore(open(path, "rb").read())
        flat_t = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])

        def key(p):
            return "/".join(str(getattr(k, "key", k)) for k in p)

        flat_l = {}

        def walk(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(prefix + [k], v)
            else:
                flat_l["/".join(prefix)] = node

        walk([], loaded)
        merged = []
        for p, leaf in jax.tree_util.tree_flatten_with_path(target_params)[0]:
            k = key(p)
            cand = flat_l.get(k)
            if cand is not None and np.shape(cand) == np.shape(leaf):
                merged.append(np.asarray(cand, leaf.dtype))
            else:
                merged.append(leaf)
        treedef = jax.tree_util.tree_structure(target_params)
        return jax.tree_util.tree_unflatten(treedef, merged)


class RunningAverage:
    """Uniform running average of param pytrees (the reference's
    record_checkpoint with w = 1/SAVE_WINDOW)."""

    def __init__(self):
        self.acc = None

    def add(self, params, w):
        p = jax.device_get(params)
        if self.acc is None:
            self.acc = jax.tree_util.tree_map(lambda x: w * np.asarray(x, np.float64), p)
        else:
            self.acc = jax.tree_util.tree_map(
                lambda a, x: a + w * np.asarray(x, np.float64), self.acc, p
            )

    def value(self, like=None):
        if self.acc is None:
            return like
        out = jax.tree_util.tree_map(lambda a: a.astype(np.float32), self.acc)
        return out
