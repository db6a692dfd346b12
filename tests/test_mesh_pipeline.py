"""Full pipeline over a device mesh (BASELINE config 5: corpus sharded
across the mesh, iterative loop on top). The corpus is large enough that
the veridical index actually shards (>= 8 devices x 256 rows)."""

import os

import numpy as np
import pytest

from comorag_tpu.comorag import ComoRAG
from comorag_tpu.config import ComoConfig

N_CHUNKS = 2100

NAMES = ["Arden", "Brisa", "Corin", "Davet", "Elwyn", "Fiora", "Garrick", "Halla"]
PLACES = ["mill", "harbor", "orchard", "quarry", "archive", "forge", "lighthouse", "granary"]
ITEMS = ["ledger", "compass", "seed chest", "iron key", "star chart", "bell", "anvil", "lantern"]


def make_corpus(n):
    rng = np.random.default_rng(11)
    chunks = []
    for i in range(n):
        a = NAMES[rng.integers(len(NAMES))]
        b = PLACES[rng.integers(len(PLACES))]
        c = ITEMS[rng.integers(len(ITEMS))]
        chunks.append(f"Record {i}: {a} visited the {b} and catalogued the {c} on day {int(rng.integers(1, 365))}.")
    # one distinctive gold fact
    chunks[1234] = "Record 1234: Quintessa hid the moonstone crown inside the old cistern beneath the granary."
    return chunks


@pytest.fixture(scope="module")
def mesh_rag(tmp_path_factory, request):
    cpu_mesh = request.getfixturevalue("cpu_mesh")
    tmp = tmp_path_factory.mktemp("mesh_e2e")
    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=64,
        need_cluster=False,  # focus: sharded retrieval path, not tree build
        skip_graph=True,     # graph path covered elsewhere; keep this fast
        save_dir=str(tmp / "outputs"),
        output_dir=str(tmp / "results"),
        max_meta_loop_iterations=1,
    )
    rag = ComoRAG(config, mesh=cpu_mesh)
    rag.index(make_corpus(N_CHUNKS))
    return rag


def test_ver_index_is_sharded(mesh_rag):
    mesh_rag.engine.prepare()
    idx = mesh_rag.engine.ver_index
    assert idx.mesh is not None, "2100-row corpus must shard over the 8-device mesh"
    assert idx.n_shards == 8


def test_sharded_retrieval_finds_gold_chunk(mesh_rag):
    # hash-encoder retrieval is exact-word based; the query shares the
    # distinctive words of the gold record
    res = mesh_rag.engine.tri_retrieve("Who hid the moonstone crown in the cistern?")
    assert any("moonstone crown" in d for d in res.veridical)


def test_sharded_matches_unsharded_ranking(mesh_rag):
    from comorag_tpu.retrieval.index import MipsIndex

    engine = mesh_rag.engine
    engine.prepare()
    q = engine.encode_queries(["Who catalogued the star chart?"])["passage"]
    sharded_scores, sharded_idx = engine.ver_index.topk(q, k=20)
    single = MipsIndex(mesh_rag.ver_store.matrix)  # no mesh
    single_scores, single_idx = single.topk(q, k=20)
    assert (sharded_idx == single_idx).all()
    assert np.allclose(sharded_scores, single_scores, atol=1e-5)


def test_meta_loop_over_mesh(mesh_rag):
    sols = mesh_rag.try_answer(["Who hid the moonstone crown in the cistern?"])
    assert "cistern" in sols[0].answer or "granary" in sols[0].answer
