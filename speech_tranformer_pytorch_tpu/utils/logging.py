"""Metrics/observability (reference: per-k-batch ``print``/logging of loss
and LR — SURVEY.md §2.1 "Trainer/solver" / §5 "Metrics").

Structured JSONL metrics (loss, grad-norm, LR, audio-s/s, tokens/s, CER)
written by process 0 only, plus console lines. TensorBoard is optional —
if tensorboardX/tf summary writers exist they are used, else JSONL only."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional

import jax


def is_primary() -> bool:
    return jax.process_index() == 0


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, *, name: str = "train",
                 console_every: int = 1):
        self.log_dir = log_dir
        self.console_every = console_every
        self._file = None
        self._tb = None
        self._n = 0
        if log_dir and is_primary():
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, f"{name}_metrics.jsonl"),
                              "a", buffering=1)
            try:
                from tensorflow.summary import create_file_writer  # type: ignore
                self._tb = create_file_writer(os.path.join(log_dir, "tb", name))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any], *,
            prefix: str = "") -> None:
        if not is_primary():
            return
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                record[prefix + k] = float(v)
            except (TypeError, ValueError):
                record[prefix + k] = v
        if self._file:
            self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in record.items():
                    if isinstance(v, float) and k not in ("time",):
                        tf.summary.scalar(k, v, step=step)
        self._n += 1
        if self._n % self.console_every == 0:
            msg = " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                           for k, v in record.items() if k != "time")
            print(f"[{prefix or 'train'}] {msg}", file=sys.stderr)

    def close(self) -> None:
        if self._file:
            self._file.close()
