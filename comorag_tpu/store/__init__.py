from comorag_tpu.store.embedding_store import EmbeddingStore

__all__ = ["EmbeddingStore"]
