from comorag_tpu.memory.pool import MemoryNode, MemoryPool, NodeType

__all__ = ["MemoryNode", "MemoryPool", "NodeType"]
