"""Class vocabulary and action space.

The category names are pure data tables (1203 LVIS + 32 THOR-extra classes)
shared with the reference (utils/constants.py:4-173); they are stored as a
JSON asset and loaded here. `THOR_CLASS_IDS` is the subset of vocabulary ids
whose names are THOR object types — used by the evaluators to decide which
ground-truth-free predicted categories count as false positives
(random_policy_evaluator.py:82).
"""

import functools
import json
import os

_VOCAB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "vocabulary.json")


@functools.lru_cache(maxsize=1)
def _vocab():
    with open(_VOCAB_PATH) as f:
        return json.load(f)


def _load():
    v = _vocab()
    return v["actions"], v["tlvis_classes"], v["thor_classes"]


ACTIONS, tlvis_classes, thor_classes = _load()

NUM_CLASSES = len(tlvis_classes)  # 1235; background/no-object id == NUM_CLASSES
BACKGROUND_CLASS = NUM_CLASSES

_thor_set = frozenset(thor_classes)
THOR_CLASS_IDS = [i for i, name in enumerate(tlvis_classes) if name in _thor_set]

# Episode geometry shared across the whole framework.
NUM_FRAMES = 5          # frames per episode (4 actions)
NUM_ACTIONS = len(ACTIONS)  # 4
NUM_QUERIES = 50        # DETR object queries (detr_models/detr.py:331)
IMG_SIZE = 300          # TEST_RESOLUTION (configs/interactron.yaml:9)
FEAT_HW = 19            # ResNet-50-DC5 feature map at 300x300 (stride 16)
MAX_BOXES = 50          # padded ground-truth boxes per frame (ragged -> fixed)
