"""Tracing/profiling (reference: none — wall-clock prints only; SURVEY.md §5
"Tracing / profiling"). jax.profiler traces for XProf/TensorBoard +
named_scope annotation helpers + a step timer that syncs correctly over
the axon tunnel (block_until_ready does not — see bench.py)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotation scope that shows up on the XProf timeline."""
    return jax.named_scope(name)


def sync(x) -> float:
    """Force full device sync by pulling a scalar to host; returns it."""
    return float(np.asarray(jax.device_get(x)).ravel()[0])


class StepTimer:
    """Throughput accounting (audio-s/s, tokens/s) with correct syncing."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._audio = 0.0
        self._tokens = 0.0
        self._steps = 0

    def record(self, *, audio_seconds: float = 0.0, tokens: float = 0.0):
        self._audio += audio_seconds
        self._tokens += tokens
        self._steps += 1

    def rates(self, sync_on=None) -> Dict[str, float]:
        if sync_on is not None:
            sync(sync_on)
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {
            "steps_per_s": self._steps / dt,
            "audio_sps": self._audio / dt,
            "tokens_per_s": self._tokens / dt,
            "wall_s": dt,
        }
