"""Metrics logging: JSONL always, TensorBoard when available.

Counterpart of the reference's SummaryWriter usage (train.py:48-49,85-87) with
the SURVEY.md §5 additions: rays/s, step time, per-loss breakdown, and
host-0-only writes for multi-host runs.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, log_dir: str, enable_tensorboard: bool = True):
        self.log_dir = log_dir
        self.primary = jax.process_index() == 0
        self._jsonl = None
        self._tb = None
        if not self.primary:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(log_dir, "tb"), flush_secs=10)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]):
        if not self.primary:
            return
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), global_step=step)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class Timer:
    """Wall-clock timer for steps/s and rays/s counters."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt
