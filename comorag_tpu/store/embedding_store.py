"""Content-addressed vector store.

Capability parity with the reference's ``EmbeddingStore``
(embedding_store.py:13-167): dedup-on-insert keyed by MD5 content hash,
parquet persistence, insertion-order preserved. The TPU-first difference:
embeddings live in ONE contiguous ``np.ndarray [N, dim]`` (not a Python list
of row arrays), so the retrieval engine can ship the whole matrix to device
memory / shard it over the mesh with zero repacking.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from comorag_tpu.utils.hashing import content_hash
from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class EmbeddingStore:
    def __init__(self, encoder, directory: str, batch_size: int, namespace: str):
        self.encoder = encoder
        self.batch_size = batch_size
        self.namespace = namespace
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"vdb_{namespace}.parquet")

        self.hash_ids: List[str] = []
        self.texts: List[str] = []
        self._matrix: Optional[np.ndarray] = None  # [N, dim] float32
        self._index: Dict[str, int] = {}
        self._load()

    # ------------------------------------------------------------ persistence
    def _load(self) -> None:
        if not os.path.exists(self.path):
            return
        import pyarrow.parquet as pq

        table = pq.read_table(self.path)
        self.hash_ids = table.column("hash_id").to_pylist()
        self.texts = table.column("content").to_pylist()
        stored_fp = (table.schema.metadata or {}).get(b"encoder_fingerprint", b"").decode()
        want_fp = getattr(self.encoder, "fingerprint", "")
        if want_fp and stored_fp != want_fp and self.texts:
            # vectors were produced by a different (or older) embedding
            # function; scoring new queries against them silently degrades
            # every ranking. The TEXTS may be expensive LLM artifacts
            # (summaries, timeline windows) — keep them, re-encode only.
            logger.warning(
                "%s: stored vectors have encoder fingerprint %r but the "
                "active encoder is %r — re-encoding %d texts",
                self.path, stored_fp or "<none>", want_fp, len(self.texts),
            )
            embs = []
            for i in range(0, len(self.texts), self.batch_size):
                embs.append(self.encoder.encode(self.texts[i : i + self.batch_size]))
            self._matrix = np.concatenate(embs, axis=0).astype(np.float32)
            self._index = {h: i for i, h in enumerate(self.hash_ids)}
            self._save()
            return
        emb_rows = table.column("embedding").to_pylist()
        if emb_rows:
            self._matrix = np.asarray(emb_rows, dtype=np.float32)
        self._index = {h: i for i, h in enumerate(self.hash_ids)}
        logger.info("Loaded %d records from %s", len(self.hash_ids), self.path)

    def _save(self) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        emb = self._matrix if self._matrix is not None else np.zeros((0, 0), np.float32)
        table = pa.table(
            {
                "hash_id": self.hash_ids,
                "content": self.texts,
                "embedding": [row for row in emb.tolist()],
            }
        )
        fp = getattr(self.encoder, "fingerprint", "")
        if fp:
            table = table.replace_schema_metadata({b"encoder_fingerprint": fp.encode()})
        pq.write_table(table, self.path)

    def clear(self) -> None:
        """Drop all rows and the on-disk artifact (used when a derived
        layer — e.g. the timeline — is stale and must be rebuilt)."""
        self.hash_ids = []
        self.texts = []
        self._matrix = None
        self._index = {}
        if os.path.exists(self.path):
            os.remove(self.path)

    # ------------------------------------------------------------ insertion
    def key_for(self, text: str) -> str:
        return content_hash(text, prefix=self.namespace + "-")

    def missing(self, texts: Sequence[str]) -> Dict[str, str]:
        """hash_id -> text for texts not yet stored (order-preserving,
        reference get_missing_string_hash_ids semantics)."""
        out: Dict[str, str] = {}
        for t in texts:
            h = self.key_for(t)
            if h not in self._index and h not in out:
                out[h] = t
        return out

    def insert_strings(self, texts: Sequence[str]) -> List[str]:
        """Encode + store any new texts; returns hash ids of ALL inputs."""
        missing = self.missing(texts)
        if missing:
            new_texts = list(missing.values())
            embs = []
            for i in range(0, len(new_texts), self.batch_size):
                embs.append(
                    np.asarray(
                        self.encoder.encode(new_texts[i : i + self.batch_size]),
                        dtype=np.float32,
                    )
                )
            new_matrix = np.concatenate(embs, axis=0)
            start = len(self.hash_ids)
            for j, (h, t) in enumerate(missing.items()):
                self._index[h] = start + j
                self.hash_ids.append(h)
                self.texts.append(t)
            if self._matrix is None:
                self._matrix = new_matrix
            else:
                self._matrix = np.concatenate([self._matrix, new_matrix], axis=0)
            self._save()
            logger.info(
                "Inserted %d new records into %s (%d total)",
                len(missing), self.namespace, len(self.hash_ids),
            )
        return [self.key_for(t) for t in texts]

    # ------------------------------------------------------------ accessors
    def __len__(self) -> int:
        return len(self.hash_ids)

    def __contains__(self, hash_id: str) -> bool:
        return hash_id in self._index

    def get_all_ids(self) -> List[str]:
        return list(self.hash_ids)

    def get_all_texts(self) -> List[str]:
        return list(self.texts)

    def get_text(self, hash_id: str) -> str:
        return self.texts[self._index[hash_id]]

    def get_texts(self, hash_ids: Sequence[str]) -> List[str]:
        return [self.get_text(h) for h in hash_ids]

    def hash_to_text(self) -> Dict[str, str]:
        return {h: self.texts[i] for h, i in self._index.items()}

    def text_to_hash(self) -> Dict[str, str]:
        return {self.texts[i]: h for h, i in self._index.items()}

    def order_of(self, hash_id: str) -> int:
        """Insertion-order index (reference get_hash_id_to_order semantics)."""
        return self._index[hash_id]

    @property
    def matrix(self) -> np.ndarray:
        """The full [N, dim] embedding matrix (contiguous, float32)."""
        if self._matrix is None:
            return np.zeros((0, getattr(self.encoder, "dim", 0)), dtype=np.float32)
        return self._matrix

    def get_embedding(self, hash_id: str) -> np.ndarray:
        return self.matrix[self._index[hash_id]]

    def get_embeddings(self, hash_ids: Sequence[str]) -> np.ndarray:
        if not hash_ids:
            return np.zeros((0, self.matrix.shape[1] if self.matrix.size else 0), np.float32)
        idx = np.asarray([self._index[h] for h in hash_ids], dtype=np.intp)
        return self.matrix[idx]
