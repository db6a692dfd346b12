from comorag_tpu.retrieval.index import MipsIndex

__all__ = ["MipsIndex"]
