"""Shared request-window scheduler skeleton.

The common core of ``llm/serving.GenerationServer`` (the remote-chip
counterpart of vLLM continuous batching, vllm_offline.py) and
``retrieval/engine.RetrievalWindow`` (cross-question fan-out coalescing).
Both collect concurrent requests for a few milliseconds and serve them as
shared device batches; keeping one skeleton prevents the two copies from
diverging on drain caps, close semantics, or error policy (it happened:
max_rows enforcement and group-failure isolation each landed in one
scheduler and not the other before this was factored out).

Subclasses implement:
  - ``_serve(batch)``: process one drained batch and resolve EVERY
    request's future (success or per-request error);
  - ``_on_serve_error(batch, exc)``: resolve futures when ``_serve``
    itself raised (the scheduler thread survives either way);
  - ``_units(item)``: the drain-cap weight of one queued item (defaults
    to 1 — request-count capping).
"""

from __future__ import annotations

import threading
import time
from typing import Any, List

from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class RequestWindow:
    def __init__(self, window_s: float, max_units: int, name: str):
        self.window_s = window_s
        self.max_units = max_units
        self._win_lock = threading.Condition()
        self._queue: List[Any] = []
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True, name=name)
        self._thread.start()

    # -------------------------------------------------------- subclass API
    def _units(self, item: Any) -> int:
        return 1

    def _serve(self, batch: List[Any]) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def _on_serve_error(self, batch: List[Any], exc: Exception) -> None:  # pragma: no cover
        raise NotImplementedError

    # ------------------------------------------------------------ plumbing
    def _enqueue(self, item: Any) -> None:
        with self._win_lock:
            if self._closed:
                raise RuntimeError(f"{type(self).__name__} is closed")
            self._queue.append(item)
            self._win_lock.notify()

    def _drain(self) -> List[Any]:
        """Block until work exists, collect until the window closes or the
        unit cap fills, then slice at ITEM boundaries (an oversized single
        item still goes alone; leftovers serve on the next loop)."""
        with self._win_lock:
            while not self._queue and not self._closed:
                self._win_lock.wait()
            if not self._queue:
                return []
            deadline = time.monotonic() + self.window_s
            while (
                sum(self._units(i) for i in self._queue) < self.max_units
                and not self._closed
            ):
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._win_lock.wait(timeout=remaining)
            batch: List[Any] = []
            units = 0
            while self._queue:
                n = self._units(self._queue[0])
                if batch and units + n > self.max_units:
                    break
                batch.append(self._queue.pop(0))
                units += n
            return batch

    def _run(self) -> None:
        while True:
            batch = self._drain()
            if not batch:
                if self._closed:
                    return
                continue
            try:
                self._serve(batch)
            except Exception as e:  # noqa: BLE001 — the scheduler thread must survive
                logger.warning("%s window failed: %s", type(self).__name__, e)
                self._on_serve_error(batch, e)

    def close(self) -> None:
        with self._win_lock:
            self._closed = True
            self._win_lock.notify()
        self._thread.join(timeout=30)
        if self._thread.is_alive():
            # a cold Mosaic compile / tunnel stall can exceed 30 s; callers
            # treating close() as a barrier must know it wasn't one
            logger.warning(
                "%s.close(): scheduler still serving after 30 s — in-flight "
                "requests will resolve when it finishes", type(self).__name__,
            )

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()
