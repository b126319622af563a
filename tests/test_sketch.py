"""Beyond-HBM capacity tier (ops/sketch.py + STORE_DEVICE_DTYPE=host).

Contract under test: candidate selection is approximate (screen recall —
measured here on clustered geometry, the real-embedding regime; bench
config 9 measures it at scale), returned SCORES are exact fp32 weighted
inner products of the true rows — the HNSW contract
(index/vector_store.py _search_hnsw) at corpus sizes where even int8
residency does not fit.

Measured context for the thresholds (2026-08-18, CPU): real 40k corpus
embeddings through the store path (level weights folded into the
screen) — pca d'=64 m=80 recall@10 = 0.98; ops-level unweighted probe
1.0; random-JL d'=128 m=80 = 0.99; i.i.d. gaussian (structureless worst
case) d'=128 needs m≈4k for 0.99. Real embedding corpora are low-rank,
so the clustered thresholds below are conservative.
"""

import numpy as np
import pytest

from rag_icd10_tpu.config import StoreConfig
from rag_icd10_tpu.data.corpus import synthetic_corpus
from rag_icd10_tpu.index.vector_store import VectorStore
from rag_icd10_tpu.ops.sketch import (
    build_sketch,
    fit_projection,
    sketch_search_host_rerank,
)


def clustered(n, d, n_clusters=64, seed=0, b=8):
    """Config-6 geometry: unit centers + sigma-0.5 noise, renormalized —
    i.i.d. rows make top-k spacing degenerate in a way no real embedding
    corpus exhibits (benchmarks/run.py:370-375)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[rng.integers(0, n_clusters, n)] + (
        0.5 * rng.standard_normal((n, d)).astype(np.float32) / np.sqrt(d)
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    w = np.array([0.8, 1.0, 1.2], np.float32)[rng.integers(0, 3, n)]
    q = centers[rng.integers(0, n_clusters, b)] + (
        0.5 * rng.standard_normal((b, d)).astype(np.float32) / np.sqrt(d)
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return v, w, q


class TestProjection:
    @pytest.mark.parametrize("kind", ["pca", "random"])
    def test_orthonormal_columns(self, kind):
        v = clustered(2048, 128)[0]
        p = fit_projection(v, 32, kind=kind)
        assert p.shape == (128, 32)
        np.testing.assert_allclose(p.T @ p, np.eye(32), atol=1e-4)

    def test_width_clamps_to_dim(self):
        v = clustered(512, 48)[0]
        p = fit_projection(v, 128, kind="random")
        assert p.shape == (48, 48)

    def test_unknown_kind_raises(self):
        with pytest.raises(ValueError, match="projection kind"):
            fit_projection(clustered(256, 32)[0], 16, kind="umap")


class TestSketchSearch:
    def test_scores_exact_for_returned_ids(self):
        v, w, q = clustered(4096, 128)
        st = build_sketch(v, w, d_sketch=32, pad_multiple=128)
        vals, idx = sketch_search_host_rerank(st, v, w, q, k=10)
        gt = (q @ v.T) * w[None, :]
        np.testing.assert_allclose(
            vals, np.take_along_axis(gt, idx, axis=1), atol=1e-5
        )
        assert idx.max() < st.n_real  # padding never surfaces

    def test_recall_on_clustered_geometry(self):
        v, w, q = clustered(8192, 256, seed=2)
        gt = (q @ v.T) * w[None, :]
        gt_idx = np.argsort(-gt, axis=1)[:, :10]
        st = build_sketch(v, w, d_sketch=64, pad_multiple=128)
        _, idx = sketch_search_host_rerank(st, v, w, q, k=10)
        recall = np.mean([
            len(set(idx[i]) & set(gt_idx[i])) / 10 for i in range(len(q))
        ])
        assert recall >= 0.95  # measured 1.0; margin for seed drift

    def test_overfetch_recovers_hard_geometry(self):
        """i.i.d. rows (no structure for the screen to exploit): a wider
        m must strictly help — the knob exists for exactly this regime."""
        rng = np.random.default_rng(5)
        n, d = 8192, 128
        v = rng.standard_normal((n, d)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        w = np.ones(n, np.float32)
        q = rng.standard_normal((4, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        gt_idx = np.argsort(-(q @ v.T), axis=1)[:, :10]
        st = build_sketch(v, w, d_sketch=64, pad_multiple=128)

        def recall(m):
            _, idx = sketch_search_host_rerank(st, v, w, q, k=10, m=m)
            return np.mean([
                len(set(idx[i]) & set(gt_idx[i])) / 10 for i in range(4)
            ])

        assert recall(2048) > recall(32)

    def test_prebuilt_projection_is_honored(self):
        v, w, q = clustered(1024, 64)
        p = fit_projection(v, 16, kind="random", seed=7)
        st = build_sketch(v, w, proj=p, pad_multiple=128)
        assert st.d_sketch == 16
        np.testing.assert_array_equal(st.proj, p)

    def test_device_bytes_accounting(self):
        v, w, _ = clustered(1000, 64)
        st = build_sketch(v, w, d_sketch=32, pad_multiple=128)
        n_pad = 1024
        assert st.sketch_q.shape == (n_pad, 32)
        assert st.device_bytes == n_pad * (32 + 12)


def _store(n=2048, d=128, seed=3, **cfg):
    corpus = synthetic_corpus(n, seed=seed)
    rng = np.random.default_rng(seed)
    # clustered vectors: the store-level tests exercise dispatch, not
    # worst-case screen recall
    v = clustered(n, d, seed=seed)[0]
    store = VectorStore(dim=d, config=StoreConfig(pad_multiple=128, **cfg))
    store.insert_records(list(corpus.records()), v)
    q = v[rng.integers(0, n, 5)] + 0.01
    return store, v, q


class TestChunkedScreen:
    """screen_chunk > 0 scans the sketch in row chunks with an exact
    running top-m merge — the transient is (B, chunk), not (B, N),
    which is the difference between screening 100M rows and OOMing.
    The merged selection must equal the materializing screen's."""

    def _stores(self, n=4096, d=96, d_sketch=32):
        v = clustered(n, d, seed=5)[0]
        w = np.random.default_rng(5).choice(
            [0.8, 1.0, 1.2], n).astype(np.float32)
        from rag_icd10_tpu.ops.sketch import build_sketch

        flat = build_sketch(v, w, d_sketch=d_sketch, kind="random",
                            pad_multiple=128, screen_chunk=0)
        chunked = build_sketch(v, w, d_sketch=d_sketch, kind="random",
                               pad_multiple=128, screen_chunk=512,
                               proj=flat.proj)
        return v, w, flat, chunked

    def test_matches_materializing_screen(self):
        from rag_icd10_tpu.ops.sketch import sketch_screen

        v, w, flat, chunked = self._stores()
        assert chunked.screen_chunk == 512
        assert chunked.sketch_q.shape[0] % 512 == 0
        q = v[np.random.default_rng(6).integers(0, len(v), 8)] + 0.01
        m = 64
        a = np.sort(np.asarray(sketch_screen(flat, q, m)), axis=1)
        b = np.sort(np.asarray(sketch_screen(chunked, q, m)), axis=1)
        # identical math → identical candidate SET (ties can reorder
        # within equal scores; sorting by id makes the comparison
        # order-free). Allow a tiny tie-induced set difference.
        overlap = np.mean([
            len(set(ra) & set(rb)) / m for ra, rb in zip(a, b)
        ])
        assert overlap >= 0.98, overlap

    def test_rerank_end_to_end_matches(self):
        from rag_icd10_tpu.ops.sketch import sketch_search_host_rerank

        v, w, flat, chunked = self._stores()
        q = v[np.random.default_rng(7).integers(0, len(v), 6)] + 0.01
        va, ia = sketch_search_host_rerank(flat, v, w, q, k=10, m=80)
        vb, ib = sketch_search_host_rerank(chunked, v, w, q, k=10, m=80)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_allclose(va, vb, rtol=1e-6)

    def test_auto_threshold(self):
        from rag_icd10_tpu.ops.sketch import build_sketch

        v = clustered(512, 32, seed=8)[0]
        w = np.ones(512, np.float32)
        small = build_sketch(v, w, d_sketch=16, kind="random",
                             pad_multiple=128)
        assert small.screen_chunk == 0  # materializing below 2^20 rows

    def test_m_larger_than_chunk(self):
        from rag_icd10_tpu.ops.sketch import sketch_screen

        v, w, flat, chunked = self._stores()
        q = v[:4] + 0.01
        m = 1024  # > chunk of 512: per-step top-k clamps, merge covers
        a = np.asarray(sketch_screen(flat, q, m))
        b = np.asarray(sketch_screen(chunked, q, m))
        overlap = np.mean([
            len(set(ra) & set(rb)) / m for ra, rb in zip(a, b)
        ])
        assert overlap >= 0.98, overlap


class TestHostResidency:
    def test_serves_and_matches_exact_selection(self):
        store, v, q = _store(device_dtype="host", sketch_dim=64)
        ref, _, _ = _store()  # fp32-resident control on identical data
        hits = store.search(q, top_k=5)
        exact = ref.search(q, top_k=5, method="exact")
        for a, b in zip(hits, exact):
            assert [h.id for h in a] == [h.id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-5
            )

    def test_explicit_fullprecision_method_rejected(self):
        store, _, q = _store(device_dtype="host")
        for method in ("exact", "fast", "streaming", "chunkstream"):
            with pytest.raises(ValueError, match="host tier"):
                store.search(q, top_k=5, method=method)

    def test_hnsw_still_served(self):
        store, _, q = _store(device_dtype="host")
        hits = store.search(q, top_k=5, method="hnsw")
        assert all(len(h) == 5 for h in hits)

    def test_device_bytes_shrink(self):
        store, _, q = _store(device_dtype="host", sketch_dim=64)
        store.search(q, top_k=5)
        mem = store.get_memory_usage()
        assert mem["device_vector_bytes"] < mem["estimated_vector_memory_bytes"] / 4
        assert mem["device_dtype"] == "host"

    def test_release_drops_sketch(self):
        store, _, q = _store(device_dtype="host")
        store.search(q, top_k=5)
        assert store._sketch is not None
        store.release_collection()
        assert store._sketch is None

    def test_append_invalidates_sketch_and_finds_new_rows(self):
        """insert_records must drop the screen: a stale sketch can never
        surface appended rows (they don't exist in its index space)."""
        store, v, _ = _store(device_dtype="host", sketch_dim=64)
        rng = np.random.default_rng(9)
        nv = rng.standard_normal((1, v.shape[1])).astype(np.float32)
        nv /= np.linalg.norm(nv)
        store.search(nv, top_k=5)  # builds the screen over the OLD rows
        from rag_icd10_tpu.data.corpus import synthetic_corpus

        rec = list(synthetic_corpus(1, seed=77).records())
        store.insert_records(rec, nv)
        assert store._sketch is None
        hits = store.search(nv, top_k=5)  # exact self-match must win
        assert hits[0][0].id == store.num_entities - 1


class TestSketchAsPerRequestMethod:
    def test_on_fp32_store_matches_exact(self):
        store, v, q = _store()
        exact = store.search(q, top_k=5, method="exact")
        sk = store.search(q, top_k=5, method="sketch")
        for a, b in zip(exact, sk):
            assert [h.id for h in a] == [h.id for h in b]

    def test_sketch_fetch_config_knob(self):
        store, _, q = _store(sketch_fetch=32)
        hits = store.search(q, top_k=5, method="sketch")
        assert all(len(h) == 5 for h in hits)

    def test_sketch_fetch_below_k_still_returns_k(self):
        # an operator SKETCH_FETCH below the effective k (orchestrator
        # over-fetch routinely asks for 50) must not silently truncate
        # the result rows — the fetch floors at k
        store, _, q = _store(sketch_fetch=4)
        hits = store.search(q, top_k=16, method="sketch")
        assert all(len(h) == 16 for h in hits)
