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


def merge_by_path(target, loaded):
    """strict=False analog: merge `loaded` (a nested dict of arrays) into
    `target` leaf-by-leaf wherever path and shape agree; keep the target's
    entries otherwise (reference load_state_dict(strict=False),
    random_policy_evaluator.py:22-24)."""

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
    for p, leaf in jax.tree_util.tree_flatten_with_path(target)[0]:
        k = key(p)
        cand = flat_l.get(k)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            merged.append(np.asarray(cand, getattr(leaf, "dtype", None)))
        else:
            merged.append(leaf)
    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(treedef, merged)


def load_checkpoint(path, target_params, target_frozen=None):
    """Partial (strict=False analog) parameter load.

    Handles both checkpoint layouts: a bare params tree, and the
    {"params": ..., "frozen": ...} layout written by the trainer (the frozen
    collection — stem+layer1 conv kernels and all BN stats — must round-trip
    or a fresh process cannot reproduce a trained model). Returns params, or
    (params, frozen) when target_frozen is given.
    """
    loaded = serialization.msgpack_restore(open(path, "rb").read())
    if isinstance(loaded, dict) and "params" in loaded:
        params_blob = loaded["params"]
        frozen_blob = loaded.get("frozen")
    else:
        params_blob, frozen_blob = loaded, None
    params = merge_by_path(target_params, params_blob)
    if target_frozen is None:
        return params
    frozen = (
        merge_by_path(target_frozen, frozen_blob)
        if frozen_blob is not None
        else target_frozen
    )
    return params, frozen


def load_pretrained(path, params, frozen):
    """Consume MODEL.WEIGHTS at model construction (reference behavior:
    models/interactron.py:23 loads detr-dc5-backbone.pth into the detector).

    Accepts either a torch checkpoint (.pth/.pt — converted on the fly via
    interactron_tpu.utils.convert_weights) or an already-converted msgpack
    tree ({"params": ..., "frozen": ...}). Merge is partial by path+shape,
    so a detector-only file leaves the fusion params at their random init.
    """
    if path.endswith((".pth", ".pt")):
        import torch

        from interactron_tpu.utils.convert_weights import (
            convert_detector,
            convert_fusion_gpt,
        )

        blob = torch.load(path, map_location="cpu", weights_only=False)
        sd = blob.get("model", blob) if isinstance(blob, dict) else blob
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        from interactron_tpu.utils.convert_weights import _looks_like_vit

        if _looks_like_vit(sd):
            # standard ViT-B/16 backbone checkpoint (interactron_scaled);
            # the target position-grid size comes from the model's init tree
            from interactron_tpu.utils.convert_weights import convert_vit_b16

            n_pos = params["detector"]["backbone"]["pos_embed"].shape[0]
            grid = int(round(float(n_pos ** 0.5)))
            loaded = {
                "params": {
                    "detector": {"backbone": convert_vit_b16(sd, grid=grid)}
                },
                "frozen": None,
            }
        else:
            det_params, det_frozen = convert_detector(sd)
            loaded_params = {"detector": det_params}
            if any(k.startswith("fusion.") for k in sd):
                loaded_params["fusion"] = convert_fusion_gpt(sd)
            loaded = {"params": loaded_params, "frozen": det_frozen}
    else:
        loaded = serialization.msgpack_restore(open(path, "rb").read())
    if not (isinstance(loaded, dict) and "params" in loaded):
        loaded = {"params": loaded}
    params = merge_by_path(params, loaded["params"])
    if loaded.get("frozen") is not None:
        frozen = merge_by_path(frozen, loaded["frozen"])
    return params, frozen


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
