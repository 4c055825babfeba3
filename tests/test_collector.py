"""Collector semantics against a scripted fake controller (no ai2thor):
tree expansion with pose dedup, depth validation, schema compatibility with
the episode datasets."""

import os
import random

import numpy as np
import pytest

from interactron_tpu.collect.thor_collector import (
    ThorCollector,
    find_shortest_terminal_path,
    pos_to_id,
)
from interactron_tpu.data.episode_dataset import EpisodeDataset
from interactron_tpu.utils.constants import ACTIONS


class _Event:
    def __init__(self, pos, rot):
        self.metadata = {
            "agent": {"position": pos, "rotation": rot},
            "actionReturn": [
                {"x": float(i), "y": 0.9, "z": 0.0} for i in range(4)
            ],
        }
        self.frame = np.full((300, 300, 3), 128, np.uint8)
        # three valid THOR objects with simple masks
        self.instance_detections2D = {
            f"Mug|{pos['x']:.1f}|{i}": (10 * i, 20, 10 * i + 30, 60) for i in range(3)
        }
        m = np.zeros((300, 300), bool)
        m[20:60, 0:40] = True
        self.instance_masks = {k: m for k in self.instance_detections2D}


class FakeController:
    """Deterministic grid world: MoveAhead/Back step x by +/-0.25, rotations
    step yaw by +/-30."""

    def __init__(self):
        self.pos = {"x": 0.0, "y": 0.9, "z": 0.0}
        self.rot = {"x": 0.0, "y": 0.0, "z": 0.0}

    def reset(self, scene=None):
        self.pos = {"x": 0.0, "y": 0.9, "z": 0.0}
        self.rot = {"x": 0.0, "y": 0.0, "z": 0.0}
        return _Event(self.pos, self.rot)

    def step(self, action=None, **kw):
        if action == "TeleportFull":
            self.pos = dict(kw["position"])
            self.rot = dict(kw["rotation"])
        elif action == "MoveAhead":
            self.pos = {**self.pos, "x": round(self.pos["x"] + 0.25, 2)}
        elif action == "MoveBack":
            self.pos = {**self.pos, "x": round(self.pos["x"] - 0.25, 2)}
        elif action == "RotateLeft":
            self.rot = {**self.rot, "y": (self.rot["y"] - 30) % 360}
        elif action == "RotateRight":
            self.rot = {**self.rot, "y": (self.rot["y"] + 30) % 360}
        return _Event(self.pos, self.rot)


def test_collect_anchor_tree_valid():
    c = ThorCollector(controller=FakeController())
    rng = random.Random(0)
    root_id, table = c.collect_anchor("FloorPlan1", rng=rng)
    assert root_id in table
    # every non-terminal state has all 4 actions; terminal depth >= 4
    assert find_shortest_terminal_path(root_id, table) >= 4
    for name, st in table.items():
        assert pos_to_id(st) == name
        if st["actions"]:
            assert set(st["actions"]) == set(ACTIONS)
        assert len(st["detections"]) == 3


def test_collect_dataset_schema_roundtrip(tmp_path):
    c = ThorCollector(controller=FakeController())
    img_root = str(tmp_path / "imgs")
    ann = str(tmp_path / "ann.json")
    c.collect_dataset("test", img_root, ann, num_anchors=1)
    # the produced dataset loads through the episode replay pipeline
    ds = EpisodeDataset(img_root, ann, "test", resolution=32, max_boxes=8)
    s = ds.get_item(0)
    assert s["frames"].shape == (5, 32, 32, 3)
    assert s["valid"].any()
