"""Device mesh construction.

The framework's parallel layout (SURVEY.md §2.2 "TPU-native equivalent"):

  - axis ``corpus``: the retrieval substrate shards every embedding matrix
    (chunks / facts / entities / summaries / timeline) row-wise over this
    axis; each probe fan-out is one batched MIPS with a per-shard top-k and
    an ``all_gather`` merge over ICI.
  - axis ``data``: data-parallel encoder forward / training batches.

The reference has no first-party parallelism (SURVEY.md §1: thread pools
around HTTP); this module is where the new framework gets its scale-out.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def build_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh. Default: all devices on the ``corpus`` axis.

    ``shape`` maps axis name -> size, e.g. ``{"data": 2, "corpus": 4}``.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = {"corpus": len(devices)}
    sizes = list(shape.values())
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(shape.keys()))


def corpus_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get("corpus", 1)
