"""Request-window batching server for the offline generation engine.

The reference's engine gets request batching from vLLM's continuous
batching scheduler (llm/vllm_offline.py wraps ``LLM.generate``, which
joins new requests into the running batch at step granularity). That
design assumes the scheduler sits next to the device; on a
remote-attached TPU every host->device interaction costs ~30 ms, so
step-level joining would pay a round-trip per token. The TPU-appropriate
scheduler is REQUEST-WINDOW batching:

  - callers submit independently (``submit`` returns a Future;
    ``infer``/``batch_infer`` are sync wrappers with the BaseLLM API);
  - a scheduler thread collects arrivals for a short window (or until a
    full batch), groups them by guided-JSON template, and runs each group
    as ONE device program (prefill + while_loop decode, prefix-cache
    aware) through JaxOfflineLLM;
  - concurrent callers (the meta loop runs <=16 question threads,
    ComoRAG.py:436-437) therefore share device programs instead of
    queueing 16 single-row generations.

Window batching trades a bounded added latency (<= window) for full-batch
device utilization — decode throughput scales ~4x from batch 1 to 32
(PERF.md decode table), so the trade wins whenever two requests overlap.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Sequence, Tuple

from comorag_tpu.llm.base import BaseLLM, LLMResponse, Messages
from comorag_tpu.llm.jax_offline import JaxOfflineLLM
from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class GenerationServer(BaseLLM):
    """Thread-safe batching front over a JaxOfflineLLM engine."""

    def __init__(
        self,
        engine: JaxOfflineLLM,
        window_ms: float = 8.0,
        max_batch: int = 32,
    ):
        self.engine = engine
        # OpenIE keys guided decoding off this attribute (ie/openie.py
        # _stage_kwargs) — the server forwards gen_kwargs verbatim, so it
        # supports exactly what its engine supports.
        self.supports_guided_json = getattr(engine, "supports_guided_json", False)
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch
        self._lock = threading.Condition()
        self._queue: List[Tuple[Messages, Dict[str, Any], Future]] = []
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True, name="gen-server")
        self._thread.start()

    # ------------------------------------------------------------ interface
    def submit(self, messages: Messages, **gen_kwargs) -> "Future[LLMResponse]":
        fut: "Future[LLMResponse]" = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("GenerationServer is closed")
            self._queue.append((messages, gen_kwargs, fut))
            self._lock.notify()
        return fut

    def infer(self, messages: Messages, **gen_kwargs) -> LLMResponse:
        return self.submit(messages, **gen_kwargs).result()

    def batch_infer(self, batch: Sequence[Messages], **gen_kwargs) -> List[LLMResponse]:
        futures = [self.submit(m, **gen_kwargs) for m in batch]
        return [f.result() for f in futures]

    def close(self) -> None:
        with self._lock:
            self._closed = True
            self._lock.notify()
        self._thread.join(timeout=30)
        if self._thread.is_alive():
            # a cold Mosaic compile / tunnel stall can exceed 30 s; callers
            # treating close() as a barrier must know it wasn't one
            logger.warning(
                "GenerationServer.close(): scheduler still serving after "
                "30 s — in-flight requests will resolve when it finishes"
            )

    def __enter__(self) -> "GenerationServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------ scheduler
    def _drain_window(self) -> List[Tuple[Messages, Dict[str, Any], Future]]:
        """Block until work exists, then keep collecting until the window
        closes or the batch is full."""
        with self._lock:
            while not self._queue and not self._closed:
                self._lock.wait()
            if not self._queue:
                return []
            deadline = time.monotonic() + self.window_s
            while len(self._queue) < self.max_batch and not self._closed:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._lock.wait(timeout=remaining)
            batch, self._queue = self._queue[: self.max_batch], self._queue[self.max_batch :]
            return batch

    def _run(self) -> None:
        while True:
            batch = self._drain_window()
            if not batch:
                if self._closed:
                    return
                continue
            try:
                self._serve(batch)
            except Exception as e:  # noqa: BLE001 — the scheduler thread must survive
                logger.warning("generation window failed: %s", e)
                for _, _, fut in batch:
                    # one response object PER requester: they are mutable
                    # (the success path mutates metadata) and two threads
                    # sharing one would cross-contaminate
                    _resolve(fut, LLMResponse(
                        text="", metadata={"error": str(e), "finish_reason": "error"}
                    ))

    def _serve(self, batch: List[Tuple[Messages, Dict[str, Any], Future]]) -> None:
        # group by generation options: one device program per distinct
        # (template, max_tokens, temperature) — mixed options can't
        # share a while_loop program
        groups: Dict[Tuple, List[int]] = {}
        for i, (_, kw, _f) in enumerate(batch):
            # `is None` (not falsy-or): an explicit max_tokens=0 must stay
            # a minimal cap, not balloon to the engine default (ADVICE r2).
            # max_completion_tokens is the OpenAI-client spelling (rerank/
            # summarize pass it) — honor it like openai_client.py does.
            mt = kw.get("max_tokens")
            if mt is None:
                mt = kw.get("max_completion_tokens")
            key = (
                kw.get("json_template"),
                int(self.engine.max_new_tokens if mt is None else mt),
                kw.get("temperature"),
            )
            groups.setdefault(key, []).append(i)
        for key, idxs in groups.items():
            template, max_tokens, temperature = key
            msgs = [batch[i][0] for i in idxs]
            try:
                results = self.engine.batch_infer(
                    msgs,
                    max_tokens=max_tokens,
                    json_template=template,
                    temperature=temperature,
                )
            except Exception as e:  # noqa: BLE001 — fail the futures, not the thread
                logger.warning("generation group failed: %s", e)
                results = [
                    LLMResponse(text="", metadata={"error": str(e), "finish_reason": "error"})
                    for _ in idxs
                ]
            for i, r in zip(idxs, results):
                r.metadata["batched_with"] = len(batch) - 1
                _resolve(batch[i][2], r)


def _resolve(fut: Future, result: LLMResponse) -> None:
    """set_result that tolerates callers who cancelled their future."""
    if not fut.done():
        try:
            fut.set_result(result)
        except Exception:  # pragma: no cover — lost cancel race
            pass
