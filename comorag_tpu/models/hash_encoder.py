"""Hermetic deterministic encoder for tests and offline development.

Maps text -> unit vector via a seeded hash, with a *soft bag-of-words* mixing
so that lexically similar texts have higher cosine similarity than unrelated
ones — enough structure for retrieval ranking tests without any model
weights. This is the framework's answer to the reference having no test
story at all (SURVEY.md §4): every pipeline stage can run hermetically.
"""

from __future__ import annotations

import hashlib
from typing import List, Union

import numpy as np

from comorag_tpu.models.base import BaseEncoder


class HashEncoder(BaseEncoder):
    def __init__(self, dim: int = 512, seed: int = 0):
        self.dim = dim
        self.seed = seed

    def _word_vec(self, word: str) -> np.ndarray:
        digest = hashlib.sha256(f"{self.seed}:{word}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        return rng.standard_normal(self.dim).astype(np.float32)

    def encode(
        self,
        texts: Union[str, List[str]],
        instruction: str = "",
        norm: bool = True,
    ) -> np.ndarray:
        texts = self._as_list(texts)
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            words = text.lower().split()
            if not words:
                words = ["<empty>"]
            vec = np.zeros(self.dim, dtype=np.float32)
            for w in words:
                vec += self._word_vec(w)
            # tiny instruction-dependent rotation so query/passage spaces differ
            if instruction:
                vec += 0.01 * self._word_vec(f"<instr>{instruction}")
            out[i] = vec
        if norm:
            out = self._l2_normalize(out)
        return out
