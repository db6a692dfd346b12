import numpy as np

from comorag_tpu.models.hash_encoder import HashEncoder
from comorag_tpu.store.embedding_store import EmbeddingStore
from comorag_tpu.utils.hashing import content_hash
from comorag_tpu.utils.json_repair import (
    extract_json_array,
    extract_json_object,
    filter_valid_triples,
    repair_json,
)
from comorag_tpu.utils.text import TokenCounter, normalize_answer, text_processing


def test_content_hash_prefix():
    h = content_hash("hello", prefix="chunk-")
    assert h.startswith("chunk-") and len(h) == len("chunk-") + 32
    assert h == content_hash("hello", prefix="chunk-")  # deterministic


def test_hash_encoder_similarity_structure():
    enc = HashEncoder(dim=128)
    vecs = enc.encode(["the cat sat on the mat", "the cat sat on a mat", "quantum flux capacitor"])
    assert vecs.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)
    sim_close = vecs[0] @ vecs[1]
    sim_far = vecs[0] @ vecs[2]
    assert sim_close > sim_far


def test_store_dedup_and_persistence(tmp_path):
    enc = HashEncoder(dim=32)
    store = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    ids = store.insert_strings(["a", "b", "a", "c"])
    assert len(store) == 3
    assert ids[0] == ids[2]
    assert store.matrix.shape == (3, 32)
    # order preserved
    assert store.get_all_texts() == ["a", "b", "c"]
    assert store.order_of(store.key_for("b")) == 1

    # reload from parquet
    store2 = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    assert len(store2) == 3
    np.testing.assert_allclose(store.matrix, store2.matrix, atol=1e-6)
    assert store2.get_text(store2.key_for("c")) == "c"
    # insert into reloaded store dedups
    store2.insert_strings(["c", "d"])
    assert len(store2) == 4


def test_store_loads_legacy_list_column(tmp_path):
    """Parquet written by the old per-row list<float> layout (pre the
    zero-copy FixedSizeList save path) must load to the identical matrix,
    and a re-save upgrades the file in place."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    enc = HashEncoder(dim=16)
    texts = ["alpha", "beta", "gamma"]
    rows = enc.encode(texts).astype(np.float32)
    table = pa.table(
        {
            "hash_id": [content_hash(t, prefix="chunk-") for t in texts],
            "content": texts,
            "embedding": [r for r in rows.tolist()],  # legacy layout
        }
    ).replace_schema_metadata({b"encoder_fingerprint": enc.fingerprint.encode()})
    pq.write_table(table, str(tmp_path / "vdb_chunk.parquet"))

    store = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    assert len(store) == 3
    np.testing.assert_allclose(store.matrix, rows, atol=1e-6)

    store.insert_strings(["delta"])  # re-save upgrades to the new layout
    assert (tmp_path / "vdb_chunk_vec.parquet").exists()
    main = pq.read_table(str(tmp_path / "vdb_chunk.parquet"))
    assert "embedding" not in main.column_names
    store2 = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    assert len(store2) == 4
    np.testing.assert_allclose(store2.matrix[:3], rows, atol=1e-6)

    # a main table without vectors (sidecar deleted) re-encodes on load
    (tmp_path / "vdb_chunk_vec.parquet").unlink()
    store3 = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    assert len(store3) == 4
    np.testing.assert_allclose(store3.matrix[:3], rows, atol=1e-6)
    assert (tmp_path / "vdb_chunk_vec.parquet").exists()  # re-saved


def test_store_rejects_stale_and_torn_sidecars(tmp_path):
    """A sidecar whose own fingerprint disagrees with the active encoder
    (crash between the two _save writes) and a torn/truncated sidecar
    must both re-encode instead of loading wrong/raising."""
    enc = HashEncoder(dim=16)
    store = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    store.insert_strings(["alpha", "beta"])
    good = store.matrix.copy()
    vec_path = tmp_path / "vdb_chunk_vec.parquet"

    # stale: same shape, wrong fingerprint (as if written by an old encoder)
    import pyarrow as pa
    import pyarrow.parquet as pq

    bogus = np.full((2, 16), 7.0, np.float32)
    tab = pa.table({"values": pa.array(bogus.reshape(-1))}).replace_schema_metadata(
        {b"dim": b"16", b"encoder_fingerprint": b"HashEncoder:s0:d16:v2"}
    )
    pq.write_table(tab, str(vec_path))
    s2 = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    np.testing.assert_allclose(s2.matrix, good, atol=1e-6)  # re-encoded, not 7.0

    # torn: truncated parquet bytes
    vec_path.write_bytes(vec_path.read_bytes()[:100])
    s3 = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    np.testing.assert_allclose(s3.matrix, good, atol=1e-6)


def test_store_rejects_sidecar_from_racing_writer(tmp_path):
    """Same encoder, same row COUNT, different row SET: a sidecar written
    by a concurrent writer whose final row differs must not pair with this
    main table (the content signature binds the two files)."""
    import shutil

    enc = HashEncoder(dim=16)
    vec_path = tmp_path / "vdb_chunk_vec.parquet"

    # writer B saved base + "beta"; keep its sidecar
    b = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    b.insert_strings(["base one", "base two", "beta"])
    shutil.copy(vec_path, tmp_path / "sidecar_B.parquet")

    # writer A then saved base + "alpha" (same count, same encoder)
    for p in (tmp_path / "vdb_chunk.parquet", vec_path):
        p.unlink()
    a = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    a.insert_strings(["base one", "base two", "alpha"])
    good = a.matrix.copy()

    # interleaving leaves B's sidecar beside A's main table
    shutil.copy(tmp_path / "sidecar_B.parquet", vec_path)
    s = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    assert s.get_all_texts() == ["base one", "base two", "alpha"]
    np.testing.assert_allclose(s.matrix, good, atol=1e-6)  # re-encoded


def test_hash_encoder_empty_batch_fallback_path():
    """The scipy-less fallback must return a clean (0, dim) for an empty
    batch like the csr path does (empty int lists asarray to float64)."""
    import builtins

    enc = HashEncoder(dim=16)
    real_import = builtins.__import__

    def no_scipy(name, *a, **k):
        if name.startswith("scipy"):
            raise ImportError("forced")
        return real_import(name, *a, **k)

    builtins.__import__ = no_scipy
    try:
        out = enc.encode([])
        nonempty = enc.encode(["hello world"])
    finally:
        builtins.__import__ = real_import
    assert out.shape == (0, 16)
    np.testing.assert_allclose(nonempty, HashEncoder(dim=16).encode(["hello world"]))


def test_json_repair_roundtrip():
    import json

    # truncation mid-string keeps the (honest) partial value — the old
    # rfind(',') cut amputated at commas INSIDE strings, fabricating a
    # confident shorter value ('"Paris, France and the ' -> '"Paris"')
    broken = '{"named_entities": ["a", "b", "c'
    assert json.loads(repair_json(broken))["named_entities"] == ["a", "b", "c"]
    cut = repair_json('{"answer": "Paris, France and the ')
    assert json.loads(cut)["answer"] == "Paris, France and the "
    # truncation OUTSIDE a string drops the trailing partial element
    assert json.loads(repair_json('{"a": 1, "b": [1, 2,')) == {"a": 1, "b": [1, 2]}


def test_extract_json_from_prose():
    text = 'Sure! Here is the answer:\n{"triples": [["a","b","c"], ["d","e","f"]]} hope that helps'
    obj = extract_json_object(text)
    assert obj["triples"][1] == ["d", "e", "f"]
    arr = extract_json_array('prefix [1, 2, 3] suffix')
    assert arr == [1, 2, 3]


def test_filter_valid_triples():
    triples = [["a", "b", "c"], ["a", "b"], ["a", "b", "c"], [1, 2, 3]]
    out = filter_valid_triples(triples)
    assert out == [["a", "b", "c"], ["1", "2", "3"]]


def test_text_processing_and_normalize():
    assert text_processing("Hello, World!") == "hello  world"
    assert normalize_answer("The  Answer!") == "answer"


def test_token_budget_truncation():
    tc = TokenCounter()
    texts = ["one two three four five six seven eight"] * 10
    kept = tc.truncate_by_budget(texts, budget=25)
    assert 1 <= len(kept) < 10


def test_store_reencodes_on_encoder_fingerprint_change(tmp_path):
    """Vectors from a different/older embedding function must not be mixed
    with new query encodings — the store keeps the TEXTS (they may be
    expensive LLM artifacts) but re-encodes them when the persisted
    fingerprint doesn't match the active encoder's."""
    enc = HashEncoder(dim=32, seed=0)
    store = EmbeddingStore(enc, str(tmp_path), batch_size=2, namespace="chunk")
    store.insert_strings(["alpha beta", "gamma delta"])
    old_matrix = store.matrix.copy()

    # a different seed is a different projection space (covered by the
    # fingerprint), so the reload must re-encode, not reuse
    changed = HashEncoder(dim=32, seed=1)
    store2 = EmbeddingStore(changed, str(tmp_path), batch_size=2, namespace="chunk")
    assert store2.get_all_texts() == ["alpha beta", "gamma delta"]  # texts kept
    assert not np.allclose(store2.matrix, old_matrix)  # vectors regenerated
    np.testing.assert_allclose(
        store2.matrix, changed.encode(["alpha beta", "gamma delta"]), atol=1e-6
    )

    # matching fingerprint -> plain reload, vectors unchanged
    store3 = EmbeddingStore(changed, str(tmp_path), batch_size=2, namespace="chunk")
    assert len(store3) == 2
    np.testing.assert_allclose(store3.matrix, store2.matrix, atol=1e-6)
