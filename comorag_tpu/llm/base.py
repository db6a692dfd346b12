"""LLM interface (reference counterpart: llm/base.py:113-194).

Messages are OpenAI-style ``[{"role": ..., "content": ...}]`` lists.
``batch_infer`` is the throughput path: the meta loop and the OpenIE
indexer issue whole batches at once and the client fans them out over a
bounded worker pool (replacing the reference's unbounded ThreadPools,
openie_openai.py:219,245).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

Messages = List[Dict[str, str]]


@dataclass
class LLMResponse:
    text: str
    metadata: Dict[str, Any] = field(default_factory=dict)
    cache_hit: bool = False


class BaseLLM(ABC):
    max_workers: int = 16

    @abstractmethod
    def infer(self, messages: Messages, **gen_kwargs) -> LLMResponse:
        ...

    def batch_infer(self, batch: Sequence[Messages], **gen_kwargs) -> List[LLMResponse]:
        if not batch:
            return []
        if len(batch) == 1:
            return [self.infer(batch[0], **gen_kwargs)]
        with ThreadPoolExecutor(max_workers=min(self.max_workers, len(batch))) as pool:
            futures = [pool.submit(self.infer, m, **gen_kwargs) for m in batch]
            return [f.result() for f in futures]
