"""Kernel-level numerics tests (SURVEY.md §4): the Pallas fused MIPS top-k
(interpret mode on CPU; compiled path covered by bench on TPU) and the
native C++ runtime (CSR build, PPR vs dense reference, host top-k)."""

import numpy as np
import jax.numpy as jnp
import pytest

from comorag_tpu import native
from comorag_tpu.ops.pallas_topk import pallas_mips_topk
from comorag_tpu.ops.ppr import PPRGraph, ppr_dense_reference


def _random_graph(rng, n=40, m=120):
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    u, v = u[keep], v[keep]
    w = rng.random(len(u)).astype(np.float32) + 0.1
    src = np.concatenate([u, v]).astype(np.int32)
    dst = np.concatenate([v, u]).astype(np.int32)
    ww = np.concatenate([w, w]).astype(np.float32)
    return src, dst, ww, n


class TestPallasTopk:
    def test_exact_vs_argsort(self):
        rng = np.random.default_rng(0)
        n, d, p, k = 1024, 128, 8, 20
        c = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((p, d)).astype(np.float32)
        s, i = pallas_mips_topk(
            jnp.asarray(q), jnp.asarray(c), jnp.asarray(n, jnp.int32), k, interpret=True
        )
        ref_full = q @ c.T
        ref_i = np.argsort(-ref_full, axis=1)[:, :k]
        assert (np.asarray(i) == ref_i).all()
        ref_s = np.take_along_axis(ref_full, ref_i, axis=1)
        assert np.abs(np.asarray(s) - ref_s).max() < 1e-2

    def test_padding_mask(self):
        rng = np.random.default_rng(1)
        n_pad, n_valid, d, k = 1024, 900, 64, 10
        c = rng.standard_normal((n_pad, d)).astype(np.float32)
        q = rng.standard_normal((8, d)).astype(np.float32)
        _, i = pallas_mips_topk(
            jnp.asarray(q), jnp.asarray(c), jnp.asarray(n_valid, jnp.int32), k, interpret=True
        )
        i = np.asarray(i)
        assert (i < n_valid).all()
        ref_i = np.argsort(-(q @ c[:n_valid].T), axis=1)[:, :k]
        assert (i == ref_i).all()

    def test_tie_breaks_to_lowest_index(self):
        # duplicate rows -> equal scores; lax.top_k picks the lowest index
        c = np.zeros((512, 8), np.float32)
        c[:] = 1.0  # every row identical
        q = np.ones((8, 8), np.float32)
        _, i = pallas_mips_topk(
            jnp.asarray(q), jnp.asarray(c), jnp.asarray(512, jnp.int32), 4, interpret=True
        )
        assert (np.asarray(i) == np.arange(4)).all()

    def test_multi_query_block(self):
        rng = np.random.default_rng(2)
        n, d, p, k = 1024, 32, 16, 5
        c = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((p, d)).astype(np.float32)
        _, i = pallas_mips_topk(
            jnp.asarray(q), jnp.asarray(c), jnp.asarray(n, jnp.int32), k,
            tile_n=256, block_p=8, interpret=True,
        )
        ref_i = np.argsort(-(q @ c.T), axis=1)[:, :k]
        assert (np.asarray(i) == ref_i).all()


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNative:
    def test_csr_roundtrip(self):
        rng = np.random.default_rng(3)
        src, dst, w, n = _random_graph(rng)
        indptr, indices, data = native.build_csr(src, dst, w, n)
        assert indptr[-1] == len(src)
        # row u's out-neighbors match the arc list
        for u in range(n):
            mine = sorted(zip(indices[indptr[u] : indptr[u + 1]].tolist(), data[indptr[u] : indptr[u + 1]].tolist()))
            ref = sorted(zip(dst[src == u].tolist(), w[src == u].tolist()))
            assert mine == ref

    def test_ppr_matches_dense_reference(self):
        rng = np.random.default_rng(4)
        src, dst, w, n = _random_graph(rng)
        reset = np.zeros(n, np.float32)
        reset[[3, 7, 19]] = [1.0, 2.0, 0.5]
        ref = ppr_dense_reference(src, dst, w, n, reset, damping=0.5, iters=800)
        out = native.ppr(src, dst, w, n, reset[None, :], damping=0.5, tol=1e-12, max_iters=500)
        assert np.abs(out[0] - ref).max() < 1e-6
        assert (np.argsort(-out[0]) == np.argsort(-ref)).all()

    def test_ppr_batched_threads(self):
        rng = np.random.default_rng(5)
        src, dst, w, n = _random_graph(rng)
        resets = rng.random((6, n)).astype(np.float32)
        out = native.ppr(src, dst, w, n, resets, damping=0.5)
        for b in range(6):
            ref = ppr_dense_reference(src, dst, w, n, resets[b], 0.5, 800)
            assert np.abs(out[b] - ref).max() < 1e-6

    def test_host_topk(self):
        rng = np.random.default_rng(6)
        c = rng.standard_normal((300, 24)).astype(np.float32)
        q = rng.standard_normal((5, 24)).astype(np.float32)
        s, i = native.mips_topk(q, c, 7)
        ref_i = np.argsort(-(q @ c.T), axis=1)[:, :7]
        assert (i == ref_i).all()


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestPPRGraphBackends:
    def test_native_and_device_agree(self):
        rng = np.random.default_rng(7)
        src, dst, w, n = _random_graph(rng)
        resets = rng.random((3, n)).astype(np.float32)
        g_native = PPRGraph(src, dst, w, n, backend="native", tol=1e-12, max_iters=500)
        g_device = PPRGraph(src, dst, w, n, backend="device", tol=1e-12, max_iters=500)
        out_n = g_native.query(resets, damping=0.5)
        out_d = g_device.query(resets, damping=0.5)
        assert np.abs(out_n - out_d).max() < 1e-5
        # rankings identical (what retrieval consumes)
        assert (np.argsort(-out_n, axis=1) == np.argsort(-out_d, axis=1)).all()


class TestNativeUnavailableFallback:
    def test_ppr_auto_falls_back_to_device(self, monkeypatch):
        """With no C++ library, backend='auto' must solve on device."""
        import comorag_tpu.native as native_mod
        from comorag_tpu.ops.ppr import PPRGraph

        monkeypatch.setattr(native_mod, "_get", lambda: None)
        monkeypatch.setattr(native_mod, "_LIB", None)
        rng = np.random.default_rng(11)
        src, dst, w, n = _random_graph(rng)
        g = PPRGraph(src, dst, w, n, backend="auto", tol=1e-12, max_iters=400)
        assert g._native is None or not native_mod.available()
        out = g.query(np.eye(1, n, 3, dtype=np.float32))
        ref = ppr_dense_reference(src, dst, w, n, np.eye(1, n, 3, dtype=np.float32)[0], 0.5, 800)
        assert (np.argsort(-out[0])[:10] == np.argsort(-ref)[:10]).all()

    def test_build_csr_numpy_fallback(self, monkeypatch):
        import comorag_tpu.native as native_mod

        monkeypatch.setattr(native_mod, "_get", lambda: None)
        rng = np.random.default_rng(12)
        src, dst, w, n = _random_graph(rng)
        indptr, indices, data = native_mod.build_csr(src, dst, w, n)
        assert indptr[-1] == len(src)
        for u in (0, n // 2, n - 1):
            mine = sorted(zip(indices[indptr[u] : indptr[u + 1]].tolist(), data[indptr[u] : indptr[u + 1]].tolist()))
            ref = sorted(zip(dst[src == u].tolist(), w[src == u].tolist()))
            assert mine == ref


class TestPallasInt8:
    def test_int8_kernel_matches_xla_int8(self):
        from comorag_tpu.ops.pallas_topk import pallas_mips_topk_int8
        from comorag_tpu.ops.topk import int8_topk, quantize_int8

        rng = np.random.default_rng(3)
        n, d, p, k = 1024, 128, 8, 16
        c = rng.standard_normal((n, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        q = rng.standard_normal((p, d)).astype(np.float32)
        cq, scales = quantize_int8(c)
        s_pl, i_pl = pallas_mips_topk_int8(
            jnp.asarray(q), cq, scales.reshape(1, -1), jnp.asarray(n, jnp.int32),
            k, interpret=True,
        )
        s_x, i_x = int8_topk(jnp.asarray(q), cq, scales, jnp.asarray(n, jnp.int32), k)
        assert (np.asarray(i_pl) == np.asarray(i_x)).all()
        np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_x), rtol=2e-2, atol=2e-2)

    def test_int8_kernel_padding_mask(self):
        from comorag_tpu.ops.pallas_topk import pallas_mips_topk_int8
        from comorag_tpu.ops.topk import quantize_int8

        rng = np.random.default_rng(4)
        c = rng.standard_normal((1024, 64)).astype(np.float32)
        cq, scales = quantize_int8(c)
        _, i = pallas_mips_topk_int8(
            jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32)),
            cq, scales.reshape(1, -1), jnp.asarray(700, jnp.int32), 10, interpret=True,
        )
        assert (np.asarray(i) < 700).all()


class TestPallasInt4:
    def test_int4_matmul_matches_dequant_reference(self):
        """The fused nibble-unpack matmul (0.5 bytes/element weight HBM
        reads — VERDICT r3 #7) equals dequant + fp32 dot, including
        non-tile-aligned M and out."""
        from comorag_tpu.ops.pallas_int4 import (
            dequantize_int4,
            int4_matmul,
            quantize_int4_grouped,
        )

        rng = np.random.default_rng(5)
        d_in, d_out, m, gs = 512, 640, 5, 128
        w = (rng.standard_normal((d_in, d_out)) * 0.02).astype(np.float32)
        x = rng.standard_normal((m, d_in)).astype(np.float32)
        packed, scales = quantize_int4_grouped(jnp.asarray(w), gs)
        assert packed.shape == (d_in // 2, d_out) and packed.dtype == jnp.int8
        wd = np.asarray(dequantize_int4(packed, scales, gs))
        # dequant error bounded by half the per-group step
        step = np.repeat(np.asarray(scales), gs, axis=0)
        assert (np.abs(wd - w) <= step * 0.51).all()
        out = np.asarray(
            int4_matmul(jnp.asarray(x), packed, scales, group_size=gs, interpret=True)
        )
        ref = x @ wd
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    def test_int4_pack_nibble_signs(self):
        """Both nibbles sign-extend correctly through the packed byte."""
        from comorag_tpu.ops.pallas_int4 import dequantize_int4, quantize_int4_grouped

        w = np.zeros((4, 4), np.float32)
        w[0] = [-7, 7, -1, 1]   # low-half rows
        w[2] = [7, -7, 1, -1]   # high-half rows (packed into high nibbles)
        packed, scales = quantize_int4_grouped(jnp.asarray(w), group_size=2)
        wd = np.asarray(dequantize_int4(packed, scales, 2))
        np.testing.assert_allclose(wd, w, atol=1e-6)


class TestShardedPallas:
    """The Pallas kernel as the per-shard scorer (VERDICT round 1 item 4):
    interpret mode on the CPU mesh; the compiled path is covered by the
    COMORAG_TEST_TPU-gated tests below."""

    def test_sharded_pallas_matches_sharded_xla(self, cpu_mesh):
        from comorag_tpu.ops.topk import make_sharded_topk

        rng = np.random.default_rng(5)
        n, d, p, k = 8 * 512, 64, 8, 12
        c = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((p, d)).astype(np.float32)
        nv = jnp.asarray(n - 100, jnp.int32)  # padding inside the last shard
        xla_fn = make_sharded_topk(cpu_mesh, k)
        pl_fn = make_sharded_topk(cpu_mesh, k, method="pallas", interpret=True)
        s_x, i_x = xla_fn(jnp.asarray(q), jnp.asarray(c), nv)
        s_p, i_p = pl_fn(jnp.asarray(q), jnp.asarray(c), nv)
        assert (np.asarray(i_p) == np.asarray(i_x)).all()
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-3, atol=1e-3)
        assert (np.asarray(i_p) < n - 100).all()

    def test_sharded_pallas_int8_matches_sharded_xla_int8(self, cpu_mesh):
        from comorag_tpu.ops.topk import make_sharded_topk, quantize_int8

        rng = np.random.default_rng(6)
        n, d, p, k = 8 * 512, 64, 8, 12
        c = rng.standard_normal((n, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        q = rng.standard_normal((p, d)).astype(np.float32)
        cq, scales = quantize_int8(c)
        nv = jnp.asarray(n, jnp.int32)
        xla_fn = make_sharded_topk(cpu_mesh, k, int8=True)
        pl_fn = make_sharded_topk(cpu_mesh, k, method="pallas", int8=True, interpret=True)
        s_x, i_x = xla_fn(jnp.asarray(q), cq, scales, nv)
        s_p, i_p = pl_fn(jnp.asarray(q), cq, scales, nv)
        assert (np.asarray(i_p) == np.asarray(i_x)).all()
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=2e-2, atol=2e-2)


class TestShardedInt8Index:
    def test_int8_index_shards_over_mesh(self, cpu_mesh):
        """int8 was single-device-only in round 1; the sharded index now
        quantizes per shard and merges over ICI like fp32."""
        from comorag_tpu.retrieval.index import MipsIndex

        rng = np.random.default_rng(7)
        n, d = 8 * 300, 32
        c = rng.standard_normal((n, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        q = rng.standard_normal((4, d)).astype(np.float32)
        sharded = MipsIndex(c, mesh=cpu_mesh, dtype="int8")
        assert sharded.mesh is not None and sharded.int8
        single = MipsIndex(c, dtype="int8")
        s_m, i_m = sharded.topk(q, k=15)
        s_1, i_1 = single.topk(q, k=15)
        assert (i_m == i_1).all()
        np.testing.assert_allclose(s_m, s_1, rtol=1e-4, atol=1e-4)
        # full scores path too
        np.testing.assert_allclose(sharded.scores(q), single.scores(q), rtol=1e-3, atol=1e-3)
