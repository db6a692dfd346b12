from comorag_tpu.ops.similarity import min_max_normalize, min_max_normalize_np
from comorag_tpu.ops.topk import dense_topk, make_sharded_topk

__all__ = [
    "min_max_normalize",
    "min_max_normalize_np",
    "dense_topk",
    "make_sharded_topk",
]
