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
