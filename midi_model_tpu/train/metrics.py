"""Training metrics: TensorBoard-compatible writer + JSONL mirror.

Metric names match the reference's Lightning logs (``train/loss``,
``train/lr``, ``val/loss``, ``val/acc`` — /root/reference/train.py:186-205) so
existing dashboards keep working; a JSONL mirror makes headless runs greppable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, jsonl: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a") if jsonl else None

    def log(self, step: int, metrics: Dict[str, float]):
        if self._tb is not None:
            for name, value in metrics.items():
                self._tb.add_scalar(name, value, step)
        if self._jsonl is not None:
            rec = {"step": step, "time": time.time(), **metrics}
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
