"""Host-side prefetch for batch iterators (reference: DataLoader worker
prefetching — SURVEY.md §3.5 "CPU workers ↔ trainer" boundary).

Wraps any batch iterator with a bounded background thread so wav reading /
padding overlaps device execution. For heavier parallel IO use the grain
pipeline (``data/grain_pipeline.py``); this wrapper is the zero-dependency
path used by ``BucketedBatcher``.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], *, buffer_size: int = 2) -> Iterator[T]:
    """Yield from ``iterable`` with a background producer thread."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    err: list = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
