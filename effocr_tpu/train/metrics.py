"""Structured metrics logging.

Same metric names as the reference's wandb stream (train/loss,
val/accuracy, test/accuracy — train_effocr_recognizer.py:149,99,120), but
written as JSONL to the run directory; a wandb sink attaches automatically
when wandb is importable and WANDB_MODE is configured.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, run_dir: str, use_wandb: bool = False,
                 project: str = "effocr_tpu", name: Optional[str] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._step = 0
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, name=name)
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        if step is None:
            step = self._step
            self._step += 1
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
