"""Entity/passage graph construction (host) -> device PPR arrays.

Capability parity with the reference's graph layer (ComoRAG.py:627-841):

  - fact edges: each OpenIE triple adds weight-accumulating edges between
    its subject and object entity nodes, recorded in BOTH directions —
    reproducing the reference's double-entry stats that materialize as two
    parallel undirected igraph edges (ComoRAG.py:641-644);
  - passage edges: chunk -> contained-entity edges, weight 1.0;
  - synonymy edges: KNN over entity embeddings (device MIPS kernel instead
    of torch.mm loops — this is indexing's #1 hot loop, SURVEY.md §3.1),
    similarity >= threshold, <=100 neighbors/node, entities longer than 2
    alphanumeric chars;
  - per-entity chunk counts (weight normalization in graph search).

Persistence is a .npz (arcs) + .json (node names) pair replacing GraphML.
The finalized graph feeds ``ops.ppr.PPRGraph`` (arcs = stats entries
expanded symmetrically, exactly matching igraph's undirected weighted
semantics under PPR).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from comorag_tpu.retrieval.index import MipsIndex
from comorag_tpu.utils.hashing import content_hash
from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class GraphData:
    """Finalized graph: node table + symmetric arc arrays."""

    def __init__(
        self,
        node_names: List[str],
        src: np.ndarray,
        dst: np.ndarray,
        weights: np.ndarray,
        ent_node_to_num_chunk: Dict[str, int],
    ):
        self.node_names = node_names
        self.name_to_idx = {n: i for i, n in enumerate(node_names)}
        self.src = src
        self.dst = dst
        self.weights = weights
        self.ent_node_to_num_chunk = ent_node_to_num_chunk

    @property
    def n_nodes(self) -> int:
        return len(self.node_names)

    @property
    def n_arcs(self) -> int:
        return len(self.src)

    def save(self, path_prefix: str) -> None:
        np.savez_compressed(
            path_prefix + ".npz", src=self.src, dst=self.dst, weights=self.weights
        )
        with open(path_prefix + ".json", "w", encoding="utf-8") as f:
            json.dump(
                {"node_names": self.node_names, "ent_node_to_num_chunk": self.ent_node_to_num_chunk},
                f,
            )

    @classmethod
    def load(cls, path_prefix: str) -> Optional["GraphData"]:
        if not (os.path.exists(path_prefix + ".npz") and os.path.exists(path_prefix + ".json")):
            return None
        arrays = np.load(path_prefix + ".npz")
        with open(path_prefix + ".json", encoding="utf-8") as f:
            meta = json.load(f)
        return cls(
            meta["node_names"],
            arrays["src"],
            arrays["dst"],
            arrays["weights"],
            meta["ent_node_to_num_chunk"],
        )

    def info(self) -> Dict[str, int]:
        return {"num_nodes": self.n_nodes, "num_arcs": self.n_arcs}


class GraphBuilder:
    def __init__(self):
        # stats entry (u, v) -> weight; each entry becomes a symmetric arc pair.
        self.stats: Dict[Tuple[str, str], float] = {}
        self.ent_node_to_num_chunk: Dict[str, int] = {}

    # ------------------------------------------------------------- fact edges
    def add_fact_edges(self, chunk_ids: Sequence[str], chunk_triples: Sequence[Sequence[Sequence[str]]]) -> None:
        for chunk_key, triples in zip(chunk_ids, chunk_triples):
            entities_in_chunk = set()
            for triple in triples:
                if len(triple) != 3:
                    continue
                subj_key = content_hash(str(triple[0]), prefix="entity-")
                obj_key = content_hash(str(triple[2]), prefix="entity-")
                self.stats[(subj_key, obj_key)] = self.stats.get((subj_key, obj_key), 0.0) + 1.0
                self.stats[(obj_key, subj_key)] = self.stats.get((obj_key, subj_key), 0.0) + 1.0
                entities_in_chunk.add(subj_key)
                entities_in_chunk.add(obj_key)
            for node in entities_in_chunk:
                self.ent_node_to_num_chunk[node] = self.ent_node_to_num_chunk.get(node, 0) + 1

    # ---------------------------------------------------------- passage edges
    def add_passage_edges(self, chunk_ids: Sequence[str], chunk_triple_entities: Sequence[Sequence[str]]) -> int:
        num_new = 0
        for chunk_key, entities in zip(chunk_ids, chunk_triple_entities):
            for ent in entities:
                ent_key = content_hash(str(ent), prefix="entity-")
                self.stats[(chunk_key, ent_key)] = 1.0
            num_new += 1
        return num_new

    # --------------------------------------------------------- synonymy edges
    def add_synonymy_edges(
        self,
        entity_keys: Sequence[str],
        entity_texts: Sequence[str],
        entity_embeddings: np.ndarray,
        mesh=None,
        topk: int = 2047,
        sim_threshold: float = 0.8,
        max_neighbors: int = 100,
        query_batch_size: int = 1000,
    ) -> int:
        """Device KNN over all entities with pipelined query batches
        (one giant call would materialize an [n, n] score matrix beyond
        HBM at 100k+ entities; the reference batches at 1000 too,
        config_utils.py:156-159), then host thresholding."""
        n = len(entity_keys)
        if n < 2:
            return 0
        embs = np.asarray(entity_embeddings, np.float32)
        index = MipsIndex(embs, mesh=mesh)
        k = min(topk, n)
        batches = [embs[i : i + query_batch_size] for i in range(0, n, query_batch_size)]
        outs = index.topk_many(batches, k=k)
        scores = np.concatenate([s for s, _ in outs], axis=0)
        idx = np.concatenate([i for _, i in outs], axis=0)

        num_added = 0
        for qi in range(n):
            if len(re.sub(r"[^A-Za-z0-9]", "", entity_texts[qi])) <= 2:
                continue
            num_nns = 0
            for score, ni in zip(scores[qi], idx[qi]):
                if score < sim_threshold or num_nns >= max_neighbors:
                    break
                ni = int(ni)
                if ni == qi or not entity_texts[ni]:
                    continue
                self.stats[(entity_keys[qi], entity_keys[ni])] = float(score)
                num_nns += 1
                num_added += 1
        logger.info("Added %d synonymy edges", num_added)
        return num_added

    # -------------------------------------------------------------- finalize
    def finalize(self, node_names: Sequence[str]) -> GraphData:
        """Materialize arcs over the given node universe; stats entries whose
        endpoints are unknown are dropped (with a warning), self-loops skipped
        (ComoRAG.py:812 semantics)."""
        name_to_idx = {n: i for i, n in enumerate(node_names)}
        src, dst, weights = [], [], []
        dropped = 0
        for (u, v), w in self.stats.items():
            if u == v:
                continue
            ui = name_to_idx.get(u)
            vi = name_to_idx.get(v)
            if ui is None or vi is None:
                dropped += 1
                continue
            # one stats entry == one undirected edge == two arcs
            src.extend((ui, vi))
            dst.extend((vi, ui))
            weights.extend((w, w))
        if dropped:
            logger.warning("Dropped %d edges with unknown endpoints", dropped)
        return GraphData(
            list(node_names),
            np.asarray(src, np.int32),
            np.asarray(dst, np.int32),
            np.asarray(weights, np.float32),
            dict(self.ent_node_to_num_chunk),
        )
