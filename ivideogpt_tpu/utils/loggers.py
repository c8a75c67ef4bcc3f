"""Trainer-side metric logging: JSON-lines console + optional TensorBoard.

Replaces the reference's accelerate tracker integration
(reference train_tokenizer.py:815-858 accelerator.log -> TB/W&B).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class TrainLogger:
    def __init__(self, output_dir: str, use_tensorboard: bool = True):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._sw = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._sw = SummaryWriter(os.path.join(output_dir, "tb"))
            except ImportError:
                pass

    def log(self, metrics: Dict, step: int, echo: bool = True):
        payload = {"step": step}
        for k, v in metrics.items():
            try:
                payload[k] = round(float(v), 6)
            except (TypeError, ValueError):
                payload[k] = v
        self._jsonl.write(json.dumps(payload) + "\n")
        self._jsonl.flush()
        if self._sw is not None:
            for k, v in payload.items():
                if k != "step" and isinstance(v, float):
                    self._sw.add_scalar(k, v, step)
        if echo:
            print(json.dumps(payload))

    def close(self):
        self._jsonl.close()
        if self._sw is not None:
            self._sw.close()
