import numpy as np
import pytest

from comorag_tpu.ops.gmm import fit_gmm_bic
from comorag_tpu.ops.ppr import PPRGraph, ppr_dense_reference
from comorag_tpu.ops.projection import random_projection


def _blobs(seed=0, n_per=40, centers=((0, 0), (8, 8), (-8, 6))):
    rng = np.random.default_rng(seed)
    xs, labels = [], []
    for i, c in enumerate(centers):
        xs.append(rng.normal(loc=c, scale=0.6, size=(n_per, 2)))
        labels += [i] * n_per
    return np.concatenate(xs).astype(np.float32), np.asarray(labels)


def test_gmm_bic_recovers_blob_count():
    x, labels = _blobs()
    k, resp = fit_gmm_bic(x, max_clusters=8, iters=50, seed=224)
    assert k == 3
    # hard assignment should be consistent within each blob
    hard = resp.argmax(axis=1)
    for blob in range(3):
        blob_assignments = hard[labels == blob]
        # all points of one blob land in the same component
        assert (blob_assignments == blob_assignments[0]).all()
    # responsibilities are proper probabilities
    np.testing.assert_allclose(resp.sum(axis=1), 1.0, atol=1e-3)


def test_gmm_single_point_and_tiny():
    x = np.asarray([[1.0, 2.0]], np.float32)
    k, resp = fit_gmm_bic(x)
    assert k == 1 and resp.shape == (1, 1)
    x2 = np.asarray([[0.0, 0.0], [10.0, 10.0], [0.1, 0.1]], np.float32)
    k2, resp2 = fit_gmm_bic(x2, max_clusters=5)
    assert 1 <= k2 <= 2
    assert resp2.shape == (3, k2)


def test_random_projection_preserves_neighborhoods():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((50, 128)).astype(np.float32)
    y = random_projection(x, 10, seed=224)
    assert y.shape == (50, 10)
    # deterministic
    np.testing.assert_allclose(y, random_projection(x, 10, seed=224))
    # identity if already small
    small = rng.standard_normal((5, 8)).astype(np.float32)
    assert random_projection(small, 10).shape == (5, 8)


def _toy_graph():
    # 0-1 (w2), 1-2 (w1), 2-3 (w1), 3-0 (w1), 4 isolated
    und = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)]
    src, dst, w = [], [], []
    for s, d, wt in und:
        src += [s, d]
        dst += [d, s]
        w += [wt, wt]
    return np.asarray(src), np.asarray(dst), np.asarray(w, np.float32), 5


def test_ppr_matches_dense_reference():
    src, dst, w, n = _toy_graph()
    g = PPRGraph(src, dst, w, n)
    reset = np.asarray([1.0, 0.0, 0.0, 1.0, 0.5], np.float32)
    got = g.query(reset, damping=0.5)[0]
    want = ppr_dense_reference(src, dst, w, n, reset, damping=0.5)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-5


def test_ppr_batched_and_ranking():
    src, dst, w, n = _toy_graph()
    g = PPRGraph(src, dst, w, n)
    resets = np.zeros((2, n), np.float32)
    resets[0, 0] = 1.0
    resets[1, 2] = 1.0
    out = g.query(resets, damping=0.5)
    assert out.shape == (2, n)
    # seeding at node 0 should rank node 0 first; its heavy neighbor 1 above distant 2
    assert out[0].argmax() == 0
    assert out[0, 1] > out[0, 2]
    assert out[1].argmax() == 2


def test_ppr_handles_nan_and_negative_reset():
    src, dst, w, n = _toy_graph()
    g = PPRGraph(src, dst, w, n)
    reset = np.asarray([np.nan, -1.0, 1.0, 0.0, 0.0], np.float32)
    out = g.query(reset)[0]
    assert np.isfinite(out).all()
    assert out.argmax() == 2


def test_edge_sharded_ppr_matches_single_device(cpu_mesh):
    """Arcs sharded over the 8-device mesh + per-iteration psum must match
    the single-device solver exactly (same fixed point)."""
    import numpy as np
    from comorag_tpu.ops.ppr import PPRGraph

    rng = np.random.default_rng(9)
    n, m = 60, 400
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    u, v = u[keep], v[keep]
    w = (rng.random(len(u)) + 0.1).astype(np.float32)
    src = np.concatenate([u, v]).astype(np.int32)
    dst = np.concatenate([v, u]).astype(np.int32)
    ww = np.concatenate([w, w]).astype(np.float32)
    resets = rng.random((4, n)).astype(np.float32)

    single = PPRGraph(src, dst, ww, n, backend="device", tol=1e-12, max_iters=300)
    sharded = PPRGraph(src, dst, ww, n, backend="device", tol=1e-12, max_iters=300, mesh=cpu_mesh)
    assert sharded.mesh is not None
    out_single = single.query(resets, damping=0.5)
    out_sharded = sharded.query(resets, damping=0.5)
    assert np.abs(out_single - out_sharded).max() < 1e-6


def test_fused_query_topk_matches_dense_query():
    """query_topk (sparse seeds + device prior -> top-k on device) must
    rank exactly like the dense query() -> slice -> sort flow it fuses."""
    rng = np.random.default_rng(11)
    n, e, b, k = 500, 3000, 5, 10
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    passage_idxs = np.arange(200, dtype=np.int64)

    g = PPRGraph(src, dst, w, n, max_iters=256, tol=1e-8, backend="device")

    s_pad = 8
    seed_idx = rng.integers(200, n, (b, s_pad)).astype(np.int32)
    seed_w = (rng.random((b, s_pad)) * (rng.random((b, s_pad)) > 0.3)).astype(np.float32)
    prior = (rng.random((b, len(passage_idxs)))).astype(np.float32) * 0.005

    # dense reference flow (what the engine's unfused branch does)
    resets = np.zeros((b, n), np.float32)
    for row in range(b):
        for j in range(s_pad):
            resets[row, seed_idx[row, j]] += seed_w[row, j]
    resets[:, passage_idxs] += prior
    dense = g.query(resets)
    doc = dense[:, passage_idxs]

    scores, pos = g.query_topk(seed_idx, seed_w, passage_idxs, prior, k=k)
    for row in range(b):
        expect = np.sort(doc[row])[::-1][:k]
        np.testing.assert_allclose(scores[row], expect, rtol=2e-4, atol=1e-9)
        # positions agree wherever scores are distinct
        want = set(np.argsort(-doc[row])[:k].tolist())
        got = set(pos[row].tolist())
        assert len(want & got) >= k - 1


def test_fused_query_topk_sharded_matches_single_device(cpu_mesh):
    """The edge-sharded fused seed->PPR->top-k must match the single-device
    fused path exactly (same resets, psum-merged flows)."""
    rng = np.random.default_rng(13)
    n, e, b, k = 400, 2400, 4, 8
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    passage_idxs = np.arange(150, dtype=np.int64)
    seed_idx = rng.integers(150, n, (b, 8)).astype(np.int32)
    seed_w = rng.random((b, 8)).astype(np.float32)
    prior = rng.random((b, len(passage_idxs))).astype(np.float32) * 0.005

    single = PPRGraph(src, dst, w, n, backend="device", tol=1e-10, max_iters=300)
    sharded = PPRGraph(src, dst, w, n, backend="device", tol=1e-10, max_iters=300, mesh=cpu_mesh)
    assert sharded.mesh is not None

    s1, p1 = single.query_topk(seed_idx, seed_w, passage_idxs, prior, k=k)
    s2, p2 = sharded.query_topk(seed_idx, seed_w, passage_idxs, prior, k=k)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-8)
    for row in range(b):
        assert len(set(p1[row]) & set(p2[row])) >= k - 1  # ties may swap


def test_vmem_batch_chunking_matches_unchunked(monkeypatch):
    """Giant-graph batch chunking (PPR state kept under the VMEM budget)
    must return exactly what one unchunked call returns, including a
    non-divisible remainder chunk."""
    from comorag_tpu.ops import ppr as ppr_mod

    rng = np.random.default_rng(5)
    n, e, b, k = 600, 4000, 10, 8
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    g = PPRGraph(src, dst, w, n, max_iters=256, tol=1e-8, backend="device")

    seed_idx = rng.integers(0, n, (b, 6)).astype(np.int32)
    seed_w = rng.random((b, 6)).astype(np.float32)
    prior_idx = np.arange(300, dtype=np.int64)
    prior = rng.random((b, 300)).astype(np.float32) * 0.005
    resets = rng.random((b, n)).astype(np.float32)

    full_s, full_p = g.query_topk(seed_idx, seed_w, prior_idx, prior, k=k)
    full_q = g.query(resets)

    # shrink the budget so max_b = 4 -> chunks of 4 + 4 + remainder 2
    monkeypatch.setattr(
        ppr_mod, "_STATE_BYTES_BUDGET", g.n_pad * 4 * 4
    )
    assert ppr_mod._max_batch_for_nodes(g.n_pad) == 4
    chunk_s, chunk_p = g.query_topk(seed_idx, seed_w, prior_idx, prior, k=k)
    chunk_q = g.query(resets)

    np.testing.assert_array_equal(chunk_p, full_p)
    np.testing.assert_allclose(chunk_s, full_s, rtol=1e-6)
    np.testing.assert_allclose(chunk_q, full_q, rtol=1e-6, atol=1e-10)
