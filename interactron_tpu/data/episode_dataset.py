"""Episode replay datasets over the precollected iTHOR trees.

Reads the reference's `interactron_v1_{train,test}.json` schema
(sequence_dataset.py:34-95, collect_ithor_tree_data.py:115-137):

  {"data": [{"scene_name", "root", "state_table":
      {state: {"detections": {obj: {"category_id", "bbox"[x,y,w,h]}},
               "actions": {action_name: next_state}}}],
   "metadata": {"actions": [...]}}

Produces fixed-shape numpy samples (frames NHWC float32, padded targets) —
the ragged lists + NestedTensor path of the reference is replaced by masks.
Category ids are offset by +1 at load (sequence_dataset.py:62); test mode
walks the fixed 5-action path (sequence_dataset.py:37-38).
"""

import json
import os
import queue
import threading

import numpy as np
from PIL import Image

from interactron_tpu.data.transforms import EvalTransform, TrainTransform
from interactron_tpu.utils import constants as C

FIXED_TEST_PATH = ["RotateLeft", "MoveAhead", "RotateLeft", "MoveBack", "RotateRight"]


class EpisodeDataset:
    def __init__(self, img_root, annotations_path, mode="train", train_aug=False,
                 max_boxes=C.MAX_BOXES, resolution=C.IMG_SIZE, seed=0, uid_offset=0):
        assert mode in ("train", "test")
        self.uid_offset = uid_offset
        self.mode = mode
        with open(annotations_path) as f:
            self.annotations = json.load(f)
        self.img_dir = img_root.rstrip("/")
        self.transform = (
            TrainTransform(resolution) if train_aug else EvalTransform(resolution)
        )
        self.max_boxes = max_boxes
        self.resolution = resolution
        self.rng = np.random.RandomState(seed)
        # native decode fast path: only valid for the deterministic eval
        # transform on images already at target resolution
        self._native = None
        if not train_aug:
            from interactron_tpu.native import get_fastloader

            self._native = get_fastloader()

    def __len__(self):
        return len(self.annotations["data"])

    def _state_targets(self, scene, state_name):
        state = scene["state_table"][state_name]
        boxes, labels = [], []
        for _, v in state["detections"].items():
            labels.append(v["category_id"] + 1)
            x, y, w, h = v["bbox"]
            boxes.append([x, y, x + w, y + h])
        return np.asarray(boxes, np.float32).reshape(-1, 4), np.asarray(labels, np.int64)

    def _load_state(self, scene, state_name, rng):
        img_path = os.path.join(self.img_dir, scene["scene_name"], state_name + ".jpg")
        frame = Image.open(img_path)
        state = scene["state_table"][state_name]
        boxes, labels = [], []
        for _, v in state["detections"].items():
            labels.append(v["category_id"] + 1)
            x, y, w, h = v["bbox"]
            boxes.append([x, y, x + w, y + h])
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int64)
        img, boxes_n, labels = self.transform(frame, boxes, labels, rng)
        return img, boxes_n, labels

    def _pad_targets(self, boxes, labels):
        m = self.max_boxes
        n = min(len(labels), m)
        pb = np.zeros((m, 4), np.float32)
        pl = np.zeros((m,), np.int32)
        pv = np.zeros((m,), bool)
        pb[:n] = boxes[:n]
        pl[:n] = labels[:n]
        pv[:n] = True
        return pb, pl, pv

    def get_item(self, idx, actions=None, rng=None):
        # thread-safe: callers (the multi-threaded loader) pass a per-item
        # rng; the shared default is only used in single-threaded access
        rng = rng if rng is not None else self.rng
        scene = self.annotations["data"][idx]
        if self.mode == "test" and actions is None:
            actions = FIXED_TEST_PATH
        if actions is None:
            actions = [
                rng.choice(self.annotations["metadata"]["actions"])
                for _ in range(C.NUM_FRAMES)
            ]
        state_name = scene["root"]
        frames, b_list, l_list, v_list = [], [], [], []
        initial_image_path = os.path.join(
            self.img_dir, scene["scene_name"], scene["root"] + ".jpg"
        )
        # native fast path: decode+normalize the whole episode in one call
        state_names = [state_name]
        for i in range(C.NUM_FRAMES - 1):
            state_names.append(
                scene["state_table"][state_names[-1]]["actions"][actions[i]]
            )
        if self._native is not None:
            paths = [
                os.path.join(self.img_dir, scene["scene_name"], s + ".jpg")
                for s in state_names
            ]
            try:
                imgs = self._native.load_images(paths, self.resolution)
            except ValueError:
                imgs = None
            if imgs is not None:
                for s in state_names:
                    boxes, labels = self._state_targets(scene, s)
                    from interactron_tpu.data.transforms import boxes_to_cxcywh_norm

                    bn = boxes_to_cxcywh_norm(boxes, self.resolution, self.resolution)
                    pb, pl, pv = self._pad_targets(bn, labels)
                    b_list.append(pb)
                    l_list.append(pl)
                    v_list.append(pv)
                return {
                    "frames": imgs,
                    "actions": np.asarray(
                        [C.ACTIONS.index(a) for a in actions], np.int32
                    ),
                    "labels": np.stack(l_list),
                    "boxes": np.stack(b_list),
                    "valid": np.stack(v_list),
                    "episode_uid": np.int32(idx + self.uid_offset),
                    "initial_image_path": initial_image_path,
                }
        for i in range(C.NUM_FRAMES):
            img, boxes, labels = self._load_state(scene, state_name, rng)
            pb, pl, pv = self._pad_targets(boxes, labels)
            frames.append(img)
            b_list.append(pb)
            l_list.append(pl)
            v_list.append(pv)
            if i < C.NUM_FRAMES - 1:
                state_name = scene["state_table"][state_name]["actions"][actions[i]]
        return {
            "frames": np.stack(frames).astype(np.float32),
            "actions": np.asarray([C.ACTIONS.index(a) for a in actions], np.int32),
            "labels": np.stack(l_list),
            "boxes": np.stack(b_list),
            "valid": np.stack(v_list),
            "episode_uid": np.int32(idx + self.uid_offset),
            "initial_image_path": initial_image_path,
        }

    __getitem__ = get_item


def collate(samples):
    batch = {
        k: np.stack([s[k] for s in samples])
        for k in ("frames", "actions", "labels", "boxes", "valid", "episode_uid")
    }
    batch["initial_image_path"] = [s["initial_image_path"] for s in samples]
    return batch


class EpisodeLoader:
    """Background-threaded batch loader with prefetch (replaces the torch
    DataLoader + worker processes; decode/augment overlaps device compute)."""

    def __init__(self, dataset, batch_size, shuffle=False, num_workers=2, prefetch=2,
                 drop_last=True, seed=0, process_index=0, process_count=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.rng_seed = seed
        self.rng = np.random.RandomState(seed)
        # multi-host: batch_size is the GLOBAL batch; each process loads the
        # contiguous slice of every index batch that lands on its devices
        # (mesh device order is process-major), and loads non-divisible tail
        # batches in full (they are replicated, parallel/mesh.py:shard_batch).
        # The shuffle permutation is seed-deterministic, so all processes
        # agree on the global order without communicating.
        self.process_index = int(process_index)
        self.process_count = max(1, int(process_count))

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for i in range(nb):
            yield idx[i * self.batch_size : (i + 1) * self.batch_size]

    def _local_slice(self, ib):
        """Process-local view of a global index batch (+ its global size)."""
        g = len(ib)
        if self.process_count > 1 and g % self.process_count == 0:
            lb = g // self.process_count
            ib = ib[self.process_index * lb : (self.process_index + 1) * lb]
        return ib, g

    def __iter__(self):
        def load(i):
            rng = np.random.RandomState((self.rng_seed * 1000003 + int(i)) % (2**31 - 1))
            return self.dataset.get_item(int(i), rng=rng)

        def emit(ib):
            local, g = self._local_slice(ib)
            batch = collate([load(i) for i in local])
            if self.process_count > 1:
                batch["_global_rows"] = g
            return batch

        if self.num_workers == 0:
            for ib in self._index_batches():
                yield emit(ib)
            return

        # N loader threads fill an ordered slot table; consumption stays in
        # batch order (JPEG decode releases the GIL in both the native and
        # PIL paths, so threads overlap device compute)
        import concurrent.futures as cf

        batches = list(self._index_batches())
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = []
            for ib in batches:
                futures.append(pool.submit(lambda ib=ib: emit(ib)))
                # keep at most prefetch+num_workers batches in flight
                while len(futures) > self.prefetch + self.num_workers:
                    yield futures.pop(0).result()
            for f in futures:
                yield f.result()


class InteractiveEpisodeDataset(EpisodeDataset):
    """Gym-style closed-loop replay (datasets/interactive_dataset.py:30-154):
    reset() advances to the next episode and returns a 1-frame sample;
    step(action) replays the prefix and returns the (len+1)-frame sample."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.idx = -1
        self.actions = []

    def partial_sample(self, idx, actions):
        """Stateless prefix replay: the (len(actions)+1)-frame sample of
        episode `idx` after taking `actions` (action-name strings). Used by
        reset/step and by the lockstep batched evaluator."""
        scene = self.annotations["data"][idx]
        state_name = scene["root"]
        frames, b_list, l_list, v_list = [], [], [], []
        initial_image_path = os.path.join(
            self.img_dir, scene["scene_name"], scene["root"] + ".jpg"
        )
        for i in range(len(actions) + 1):
            img, boxes, labels = self._load_state(scene, state_name, self.rng)
            pb, pl, pv = self._pad_targets(boxes, labels)
            frames.append(img)
            b_list.append(pb)
            l_list.append(pl)
            v_list.append(pv)
            if i < len(actions):
                state_name = scene["state_table"][state_name]["actions"][actions[i]]
        return {
            "frames": np.stack(frames).astype(np.float32)[None],
            "actions": np.asarray(
                [C.ACTIONS.index(a) for a in actions], np.int32
            )[None],
            "labels": np.stack(l_list)[None],
            "boxes": np.stack(b_list)[None],
            "valid": np.stack(v_list)[None],
            "episode_uid": np.asarray([idx], np.int32),
            "initial_image_path": [initial_image_path],
        }

    def _partial_sample(self):
        return self.partial_sample(self.idx, self.actions)

    def reset(self):
        self.idx += 1
        if self.idx >= len(self.annotations["data"]):
            self.idx = 0
        self.actions = []
        return self._partial_sample()

    def step(self, action):
        self.actions.append(C.ACTIONS[int(action)])
        return self._partial_sample()
