"""Metric logging: epoch-buffered scalars, JSONL always + TensorBoard when
available (the reference's TBLogger semantics — logging_utils.py:6-41:
values buffer per epoch and the epoch MEAN is written at log_values())."""

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._buffer = {}
        self._step = 0
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_value(self, name, value):
        self._buffer.setdefault(name, []).append(float(value))

    def add_image(self, name, image_hwc):
        """Write an image immediately (TBLogger.add_image parity); image is
        (H, W, 3) uint8/float. No-op without TensorBoard."""
        if self._tb is not None:
            import numpy as np

            img = np.asarray(image_hwc)
            if img.dtype != "uint8":
                img = (np.clip(img, 0, 1) * 255).astype("uint8")
            self._tb.add_image(name, img, self._step, dataformats="HWC")

    def log_values(self):
        means = {k: sum(v) / len(v) for k, v in self._buffer.items() if v}
        rec = {"step": self._step, "time": time.time(), **means}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in means.items():
                self._tb.add_scalar(k, v, self._step)
        self._buffer = {}
        self._step += 1
        return means
