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

# Downweighted function words: a linear bag-of-words lets "the"-counts
# dominate cosine similarity on long chunks (15 x "the" vs 1 x the
# discriminative token), which no trained encoder does. Sublinear counts
# + a stopword damp keep the hermetic instrument's rankings
# content-driven, like the real encoders it stands in for.
_STOPWORDS = frozenset(
    "the a an and or but of in on at to was were is are be been by with for as "
    "while after before that this it its from into over under not no so than "
    "then there here when where who whom which what".split()
)


class HashEncoder(BaseEncoder):
    # v2: sublinear counts + stopword damping changed every vector
    encoder_version = 2

    def __init__(self, dim: int = 512, seed: int = 0):
        self.dim = dim
        self.seed = seed
        # a different seed is a different projection space — store
        # validation must not accept cross-seed vectors
        self.fingerprint_extra = f"s{seed}"

    def _word_vec(self, word: str) -> np.ndarray:
        digest = hashlib.sha256(f"{self.seed}:{word}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        return rng.standard_normal(self.dim).astype(np.float32)

    def encode(
        self,
        texts: Union[str, List[str]],
        instruction: str = "",
        norm=None,
    ) -> np.ndarray:
        norm = self.resolve_norm(norm)
        texts = self._as_list(texts)
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            words = text.lower().split()
            if not words:
                words = ["<empty>"]
            counts: dict = {}
            for w in words:
                counts[w] = counts.get(w, 0) + 1
            vec = np.zeros(self.dim, dtype=np.float32)
            for w, c in counts.items():
                weight = (0.1 if w in _STOPWORDS else 1.0) * float(np.sqrt(c))
                vec += weight * self._word_vec(w)
            # tiny instruction-dependent rotation so query/passage spaces differ
            if instruction:
                vec += 0.01 * self._word_vec(f"<instr>{instruction}")
            out[i] = vec
        if norm:
            out = self._l2_normalize(out)
        return out
