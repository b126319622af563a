"""Streaming chunk-select v2 (ops/chunk_stream.py) — interpret-mode
exactness on CPU; the TPU perf claims live in benchmarks/run.py config 6."""

import numpy as np
import pytest

from rag_icd10_tpu.ops.chunk_stream import (
    ChunkStore,
    search,
    transposed_tile_n,
)


def make_problem(n=3000, d=128, b=8, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    w = rng.choice([0.8, 1.0, 1.2], n).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return vecs, w, q


def brute(q, vecs, w, k):
    expected = (q @ vecs.T) * w[None, :]
    eidx = np.argsort(-expected, axis=1)[:, :k]
    return np.take_along_axis(expected, eidx, axis=1), eidx


class TestChunkStreamExactness:
    @pytest.fixture(scope="class")
    def store_and_data(self):
        vecs, w, q = make_problem()
        return ChunkStore.build(vecs, w, batch_hint=8, tile_cap=512), vecs, w, q

    def test_matches_brute_force(self, store_and_data):
        store, vecs, w, q = store_and_data
        vals, idx, cert = map(
            np.asarray, search(store, q, k=10, interpret=True)
        )
        evals, eidx = brute(q, vecs, w, 10)
        assert np.array_equal(idx, eidx)
        np.testing.assert_allclose(vals, evals, rtol=1e-5, atol=1e-6)
        assert cert.all()

    def test_negative_score_regime(self, store_and_data):
        """All-negative scores: padding rows (weight-folded zeros score 0
        in pass 1) must not leak into results, and the post-hoc mask must
        keep the certificate sound."""
        store, vecs, w, q = store_and_data
        vals, idx, cert = map(
            np.asarray, search(store, -q, k=10, interpret=True)
        )
        evals, eidx = brute(-q, vecs, w, 10)
        assert np.array_equal(idx, eidx)
        assert cert.all()
        assert int(idx.max()) < len(vecs)

    def test_guarantee_fallback_path_compiles(self, store_and_data):
        store, vecs, w, q = store_and_data
        vals, idx, cert = map(
            np.asarray,
            search(store, q, k=10, guarantee=True, interpret=True),
        )
        evals, eidx = brute(q, vecs, w, 10)
        assert np.array_equal(idx, eidx)

    def test_xla_scan_matches_brute_force(self, store_and_data):
        """scan="xla" (HIGHEST, zero-epsilon certificate) must be exact."""
        store, vecs, w, q = store_and_data
        vals, idx, cert = map(
            np.asarray, search(store, q, k=10, scan="xla", interpret=True)
        )
        evals, eidx = brute(q, vecs, w, 10)
        assert np.array_equal(idx, eidx)
        np.testing.assert_allclose(vals, evals, rtol=1e-5, atol=1e-6)
        assert cert.all()

    def test_xla_high_scan_exact_values_widened_cert(self, store_and_data):
        """scan="xla_high": pass-2 values stay EXACT fp32 (only the chunk
        bound carries scan rounding); certified results must match brute
        force."""
        store, vecs, w, q = store_and_data
        vals, idx, cert = map(
            np.asarray,
            search(store, q, k=10, scan="xla_high", interpret=True),
        )
        evals, eidx = brute(q, vecs, w, 10)
        for row in range(q.shape[0]):
            if cert[row]:
                assert np.array_equal(idx[row], eidx[row])
                np.testing.assert_allclose(
                    vals[row], evals[row], rtol=1e-5, atol=1e-6
                )
        assert cert.mean() >= 0.9  # random data certifies essentially always

    def test_tiny_mc_decertifies_not_wrong(self, store_and_data):
        """With mc too small to cover the true top-k spread the result may
        be incomplete — but then certified MUST be False for that query
        (the contract callers rely on)."""
        store, vecs, w, q = store_and_data
        vals, idx, cert = map(
            np.asarray, search(store, q, k=10, mc=1, interpret=True)
        )
        _, eidx = brute(q, vecs, w, 10)
        for row in range(q.shape[0]):
            if not np.array_equal(idx[row], eidx[row]):
                assert not cert[row]


def test_tile_sizer_divides():
    t = transposed_tile_n(64, 1_048_576, 256)
    assert 1_048_576 % t == 0 and t % 128 == 0
    with pytest.raises(ValueError):
        transposed_tile_n(64, 999, 256)


class TestReducedPrecisionScans:
    """bf16/int8 stored pass-1 scans: pass-2 values stay exact fp32;
    certified rows must match brute force; residuals are measured at
    build (no modeling assumptions)."""

    @pytest.fixture(scope="class")
    def data(self):
        return make_problem(n=2500, d=128, b=8, seed=3)

    @pytest.mark.parametrize("scan_dtype", ["bf16", "int8"])
    def test_certified_rows_exact(self, data, scan_dtype):
        vecs, w, q = data
        store = ChunkStore.build(
            vecs, w, batch_hint=8, tile_cap=512, scan_dtype=scan_dtype
        )
        assert store.resid_max > 0.0
        if scan_dtype == "int8":
            assert store.scales is not None
            assert str(store.corpus_t.dtype) == "int8"
        else:
            assert str(store.corpus_t.dtype) == "bfloat16"
        vals, idx, cert = map(
            np.asarray, search(store, q, k=10, interpret=True)
        )
        evals, eidx = brute(q, vecs, w, 10)
        for row in range(q.shape[0]):
            if cert[row]:
                assert np.array_equal(idx[row], eidx[row])
                np.testing.assert_allclose(
                    vals[row], evals[row], rtol=1e-5, atol=1e-6
                )

    @pytest.mark.parametrize("scan_dtype", ["bf16", "int8"])
    def test_wide_margin_corpus_certifies(self, data, scan_dtype):
        """A corpus whose true top-k stands clearly above the field
        (planted near-duplicates vs random background) must certify
        under the measured-residual bound — the certificate may be
        conservative but not uselessly so."""
        rng = np.random.default_rng(9)
        d, n, b, k = 64, 1024, 4, 5
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        # plant k+2 near-duplicates of each query (scores ~0.995 vs
        # random background ~0.4 max): the top-k margin dwarfs the
        # quantization epsilon
        slot = 0
        for r in range(b):
            for _ in range(k + 2):
                v = q[r] + 0.05 * rng.standard_normal(d).astype(
                    np.float32
                ) / np.sqrt(d)
                vecs[slot] = v / np.linalg.norm(v)
                slot += 7
        w = np.ones(n, np.float32)
        store = ChunkStore.build(
            vecs, w, batch_hint=4, tile_cap=128, scan_dtype=scan_dtype
        )
        vals, idx, cert = map(
            np.asarray, search(store, q, k=k, interpret=True)
        )
        evals, eidx = brute(q, vecs, w, k)
        assert cert.all()
        assert np.array_equal(idx, eidx)


class TestBuildDevice:
    def test_build_device_matches_host_build(self):
        import jax.numpy as jnp

        from rag_icd10_tpu.ops.chunk_stream import build_device

        vecs, w, q = make_problem(n=1000, d=64, b=8, seed=5)
        for scan_dtype in ("fp32", "bf16", "int8"):
            host = ChunkStore.build(
                vecs, w, batch_hint=8, tile_cap=512, scan_dtype=scan_dtype
            )
            dev = build_device(
                jnp.asarray(vecs), jnp.asarray(w), batch_hint=8,
                tile_cap=512, scan_dtype=scan_dtype,
            )
            assert dev.n_real == host.n_real
            assert dev.tile_n == host.tile_n
            np.testing.assert_allclose(
                dev.bound_scale, host.bound_scale, rtol=1e-6
            )
            np.testing.assert_allclose(
                dev.resid_max, host.resid_max, rtol=1e-4, atol=1e-7
            )
            np.testing.assert_array_equal(
                np.asarray(dev.corpus), np.asarray(host.corpus)
            )
            assert str(dev.corpus_t.dtype) == str(host.corpus_t.dtype)
            if scan_dtype == "int8":
                np.testing.assert_allclose(
                    np.asarray(dev.scales), np.asarray(host.scales),
                    rtol=1e-6,
                )
            vals_d, idx_d, _ = map(
                np.asarray, search(dev, q, k=10, interpret=True)
            )
            vals_h, idx_h, _ = map(
                np.asarray, search(host, q, k=10, interpret=True)
            )
            np.testing.assert_array_equal(idx_d, idx_h)
            np.testing.assert_allclose(vals_d, vals_h, rtol=1e-6)


def test_all_chunks_fetched_certifies():
    """mc >= nc fetches and exactly re-scores EVERY chunk — the result is
    trivially exact and must certify (the bound test against the smallest
    fetched chunk max would otherwise spuriously fail tiny corpora)."""
    vecs, w, q = make_problem(n=500, d=64, b=8, seed=11)
    store = ChunkStore.build(vecs, w, batch_hint=8, tile_cap=128)
    nc = store.corpus.shape[0] // 128
    vals, idx, cert = map(
        np.asarray, search(store, q, k=10, mc=nc, interpret=True)
    )
    evals, eidx = brute(q, vecs, w, 10)
    assert cert.all()
    assert np.array_equal(idx, eidx)
