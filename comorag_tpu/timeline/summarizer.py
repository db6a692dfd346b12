"""Episodic timeline layer: order-preserving sliding-window summaries.

Capability parity with the reference's TimelineSummarizer
(utils/timeline_utils.py:14-515): adaptive window size by corpus scale
(:42-58), one summary level persisted under the ``level_0`` namespace
(:337-343), load-or-regenerate validation (:392-491). Windows are
summarized in one batched LLM call (replacing the 8-thread pool, :312).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional

from comorag_tpu.llm.summarize import Summarizer
from comorag_tpu.store.embedding_store import EmbeddingStore
from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def adaptive_window_size(total_chunks: int) -> int:
    """Window size heuristic (timeline_utils.py:42-58 semantics)."""
    if total_chunks <= 5:
        return 2
    if total_chunks <= 20:
        return 3
    if total_chunks <= 50:
        return 5
    if total_chunks <= 100:
        return 8
    if total_chunks <= 200:
        return 10
    return min(20, max(10, int(math.log2(total_chunks) * 2)))


_WINDOW_PROMPT = (
    "Summarize the following narrative excerpts as one coherent timeline "
    "segment. Keep chronological order, highlight key events and turning "
    "points, and preserve important names and details:\n\n{text}"
)


class TimelineSummarizer:
    def __init__(
        self,
        chunk_store: EmbeddingStore,
        summarizer: Summarizer,
        encoder,
        directory: str,
        batch_size: int = 32,
        window_size: Optional[int] = None,
    ):
        self.chunk_store = chunk_store
        self.summarizer = summarizer
        self.encoder = encoder
        self.directory = directory
        self.batch_size = batch_size
        total = len(chunk_store)
        self.window_size = window_size or adaptive_window_size(total)
        logger.info("Timeline: %d chunks, window size %d", total, self.window_size)

    # ----------------------------------------------------------- level store
    def level_store(self, level: int = 0) -> EmbeddingStore:
        return EmbeddingStore(
            self.encoder, self.directory, self.batch_size, namespace=f"level_{level}"
        )

    # ------------------------------------------------------------ generation
    def generate(self) -> List[str]:
        texts = self.chunk_store.get_all_texts()
        windows: List[List[str]] = [
            texts[i : i + self.window_size] for i in range(0, len(texts), self.window_size)
        ]
        # Single-text windows pass through unsummarized (timeline_utils.py:255-258).
        to_summarize = [(i, w) for i, w in enumerate(windows) if len(w) > 1]
        summaries: List[str] = ["" for _ in windows]
        for i, w in enumerate(windows):
            if len(w) == 1:
                summaries[i] = w[0]
        if to_summarize:
            contexts = [_WINDOW_PROMPT.format(text="\n\n".join(w)) for _, w in to_summarize]
            results = self.summarizer.batch_summarize(contexts)
            for (i, _), s in zip(to_summarize, results):
                summaries[i] = s
        summaries = [s for s in summaries if s]
        store = self.level_store(0)
        store.clear()  # regeneration replaces any stale windows wholesale
        store.insert_strings(summaries)
        return summaries

    def expected_summaries(self, total_chunks: int) -> int:
        return (total_chunks + self.window_size - 1) // self.window_size

    def validate(self) -> bool:
        """A reusable timeline must cover the CURRENT corpus: the stored
        summary count has to match the expected window count (a grown
        corpus otherwise silently reuses a stale timeline —
        timeline_utils.py:392-491 validate-or-regenerate semantics)."""
        store = self.level_store(0)
        if len(store) == 0:
            return False
        expected = self.expected_summaries(len(self.chunk_store))
        if len(store) != expected:
            logger.info(
                "Timeline stale: %d summaries on disk, %d expected — regenerating",
                len(store),
                expected,
            )
            return False
        return True

    def load_or_generate(self) -> EmbeddingStore:
        os.makedirs(self.directory, exist_ok=True)
        if self.validate():
            logger.info("Loaded existing timeline summaries")
        else:
            logger.info("Generating timeline summaries")
            self.generate()
        return self.level_store(0)
