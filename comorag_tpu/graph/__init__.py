from comorag_tpu.graph.builder import GraphBuilder, GraphData

__all__ = ["GraphBuilder", "GraphData"]
