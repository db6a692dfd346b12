from comorag_tpu.parallel.mesh import build_mesh, corpus_axis_size

__all__ = ["build_mesh", "corpus_axis_size"]
