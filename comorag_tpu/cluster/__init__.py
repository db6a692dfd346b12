from comorag_tpu.cluster.raptor import SemanticTree, two_level_soft_cluster

__all__ = ["SemanticTree", "two_level_soft_cluster"]
