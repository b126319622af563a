"""C++ HNSW index tests: recall on structured data, persistence, and the
VectorStore HNSW path with level-weight semantics."""

import numpy as np
import pytest

from rag_icd10_tpu.config import StoreConfig
from rag_icd10_tpu.data.corpus import synthetic_corpus

hnsw_index = pytest.importorskip(
    "rag_icd10_tpu.index.hnsw_index", reason="native toolchain unavailable"
)
from rag_icd10_tpu.index.hnsw_index import HNSWIndex  # noqa: E402
from rag_icd10_tpu.index.vector_store import VectorStore  # noqa: E402


def clustered(n, d, n_centers=50, seed=0, spread=0.3, centers=None):
    rng = np.random.default_rng(seed)
    if centers is None:
        centers = np.random.default_rng(99).standard_normal(
            (n_centers, d)
        ).astype(np.float32)
    vecs = centers[rng.integers(0, len(centers), n)] + spread * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return vecs / np.linalg.norm(vecs, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def built():
    vecs = clustered(3000, 64)
    idx = HNSWIndex(dim=64, M=16, ef_construction=100)
    idx.add(vecs)
    return idx, vecs


class TestHNSW:
    def test_size(self, built):
        idx, vecs = built
        assert len(idx) == 3000

    def test_recall_on_clustered(self, built):
        idx, vecs = built
        q = clustered(20, 64, seed=7)
        exact = np.argsort(-(q @ vecs.T), axis=1)[:, :10]
        _, ids = idx.search(q, 10, ef_search=64)
        recall = np.mean(
            [len(set(ids[i]) & set(exact[i])) / 10 for i in range(20)]
        )
        assert recall >= 0.95, recall

    def test_ip_scores_match_exact_dot(self, built):
        idx, vecs = built
        q = vecs[:3]
        ips, ids = idx.search(q, 5, ef_search=64)
        for i in range(3):
            for ip, j in zip(ips[i], ids[i]):
                assert ip == pytest.approx(float(q[i] @ vecs[j]), abs=1e-4)

    def test_self_retrieval(self, built):
        idx, vecs = built
        _, ids = idx.search(vecs[:10], 1, ef_search=64)
        assert (ids[:, 0] == np.arange(10)).mean() >= 0.9

    def test_save_load_identical(self, built, tmp_path):
        idx, vecs = built
        p = str(tmp_path / "g.hnsw")
        idx.save(p)
        idx2 = HNSWIndex.load(p)
        assert len(idx2) == len(idx) and idx2.dim == idx.dim
        q = vecs[:5]
        _, a = idx.search(q, 10, 64)
        _, b = idx2.search(q, 10, 64)
        np.testing.assert_array_equal(a, b)

    def test_memory_reported(self, built):
        idx, _ = built
        assert idx.memory_bytes() > 3000 * 64 * 4  # at least the vectors

    def test_empty_index_search(self):
        idx = HNSWIndex(dim=16, M=8, ef_construction=50)
        ips, ids = idx.search(np.zeros((1, 16), np.float32), 5)
        assert (ids == -1).all()


class TestStoreHNSWPath:
    def test_level_weighted_resort(self):
        corpus = synthetic_corpus(256, seed=3)
        vecs = clustered(256, 64, seed=3)
        store = VectorStore(
            dim=64, config=StoreConfig(pad_multiple=128, index_type="HNSW")
        )
        store.insert_records(list(corpus.records()), vecs)
        hits = store.search(vecs[:2], top_k=5)
        assert len(hits) == 2
        for row in hits:
            scores = [h.score for h in row]
            assert scores == sorted(scores, reverse=True)
            for h in row:
                w = {1: 1.2, 2: 1.0, 3: 0.8}[h.level]
                assert h.score == pytest.approx(h.original_score * w, rel=1e-4)

    def test_method_override_matches_weighted_exact(self):
        corpus = synthetic_corpus(128, seed=4)
        vecs = clustered(128, 64, seed=4)
        store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
        store.insert_records(list(corpus.records()), vecs)
        hits = store.search(vecs[:1], top_k=3, method="hnsw")[0]
        weighted = (vecs[:1] @ vecs.T)[0] * corpus.level_weights()
        expected_top = set(np.argsort(-weighted)[:3].tolist())
        # small corpus + high ef -> graph search should agree with exact
        assert {h.id for h in hits} == expected_top
