"""VectorStore tests: insert/search/lifecycle/persistence."""

import numpy as np
import pytest

from rag_icd10_tpu.config import StoreConfig
from rag_icd10_tpu.data.corpus import synthetic_corpus
from rag_icd10_tpu.index import VectorStore


def normed(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture()
def store():
    corpus = synthetic_corpus(200, seed=1)
    rng = np.random.default_rng(1)
    vecs = normed(rng.standard_normal((200, 64)).astype(np.float32))
    s = VectorStore(dim=64, config=StoreConfig(pad_multiple=256))
    s.insert_records(list(corpus.records()), vecs, semantic_vectors=vecs)
    s._test_vecs = vecs
    return s


class TestInsertSearch:
    def test_exact_self_retrieval(self, store):
        """Querying with a corpus vector must return that record first
        (weight distortion aside, weight>=0.8 keeps self on top for
        near-orthogonal random others)."""
        q = store._test_vecs[:4]
        results = store.search(q, top_k=5)
        assert len(results) == 4
        for i, hits in enumerate(results):
            assert hits[0].id == i
            assert hits[0].code == store.corpus.codes[i]

    def test_level_weighted_scores(self, store):
        q = store._test_vecs[:2]
        for hits in store.search(q, top_k=5):
            for h in hits:
                w = {1: 1.2, 2: 1.0, 3: 0.8}[h.level]
                assert h.score == pytest.approx(h.original_score * w, rel=1e-4)

    def test_sorted_desc(self, store):
        hits = store.search(store._test_vecs[:1], top_k=10)[0]
        scores = [h.score for h in hits]
        assert scores == sorted(scores, reverse=True)

    def test_topk_not_bucket_size(self, store):
        hits = store.search(store._test_vecs[:1], top_k=7)[0]
        assert len(hits) == 7

    def test_single_vector_1d(self, store):
        hits = store.search(store._test_vecs[0], top_k=3)
        assert len(hits) == 1 and len(hits[0]) == 3

    def test_exact_title_hits_lookup(self, store):
        q = store._test_vecs[7]
        hits = store.exact_title_hits(store.corpus.titles[7], q)
        assert hits and hits[0].id == 7
        # weighted-score convention matches the search path
        w = {1: 1.2, 2: 1.0, 3: 0.8}[hits[0].level]
        assert hits[0].original_score == pytest.approx(1.0, abs=1e-5)
        assert hits[0].score == pytest.approx(w, abs=1e-4)
        assert store.exact_title_hits("不存在的标题", q) == []

    def test_exact_title_map_invalidated_on_insert(self, store):
        q = store._test_vecs[0]
        store.exact_title_hits(store.corpus.titles[0], q)  # build the map
        extra = synthetic_corpus(8, seed=77)
        rng = np.random.default_rng(77)
        vecs = normed(rng.standard_normal((8, 64)).astype(np.float32))
        recs = [r for r in extra.records()]
        for r in recs:  # make titles unique vs the base corpus
            r.preferred_zh = "新增" + r.preferred_zh
        store.insert_records(recs, vecs)
        hits = store.exact_title_hits(recs[0].preferred_zh, vecs[0])
        assert hits and hits[0].preferred_zh == recs[0].preferred_zh

    def test_incremental_insert(self, store):
        extra = synthetic_corpus(56, seed=9)
        rng = np.random.default_rng(9)
        vecs = normed(rng.standard_normal((56, 64)).astype(np.float32))
        store.insert_records(list(extra.records()), vecs)
        assert store.num_entities == 256
        # store must re-load and still search fine
        hits = store.search(vecs[:1], top_k=3)[0]
        assert hits[0].id == 200


class TestLifecycle:
    def test_load_release(self, store):
        assert not store.is_loaded
        assert store.load_collection()
        assert store.is_loaded
        assert store.release_collection()
        assert not store.is_loaded
        # search auto-reloads
        hits = store.search(store._test_vecs[:1], top_k=3)
        assert len(hits[0]) == 3 and store.is_loaded

    def test_clear(self, store):
        store.clear_collection()
        assert store.num_entities == 0
        assert store.search(np.zeros((1, 64), np.float32), top_k=3) == [[]]

    def test_stats_and_memory(self, store):
        stats = store.get_collection_stats()
        assert stats["num_entities"] == 200
        # formula parity: n*dim*4
        assert stats["memory"]["estimated_vector_memory_bytes"] == 200 * 64 * 4

    def test_health(self, store):
        h = store.health_check()
        assert h["status"] in ("healthy", "degraded")
        assert h["checks"]["has_data"]
        assert store.test_connection()


class TestSemanticSimilarities:
    def test_self_similarity_one(self, store):
        q = store._test_vecs[:2]
        ids = np.array([[0, 1], [1, 0]])
        sims = store.semantic_similarities(q, ids)
        assert sims.shape == (2, 2)
        assert sims[0, 0] == pytest.approx(1.0, abs=1e-5)
        assert sims[1, 0] == pytest.approx(1.0, abs=1e-5)


class TestPersistence:
    def test_save_load_roundtrip(self, store, tmp_path):
        base = str(tmp_path / "store")
        store.save(base)
        assert VectorStore.exists(base)
        back = VectorStore.load(base, config=StoreConfig(pad_multiple=256))
        assert back.num_entities == store.num_entities
        a = store.search(store._test_vecs[:2], top_k=5)
        b = back.search(store._test_vecs[:2], top_k=5)
        for ha, hb in zip(a, b):
            assert [h.code for h in ha] == [h.code for h in hb]
            np.testing.assert_allclose(
                [h.score for h in ha], [h.score for h in hb], rtol=1e-6
            )


class TestLateSemanticVectors:
    """Regression: semantic vectors arriving on a LATER insert used to be
    silently dropped when the first insert carried none."""

    def test_backfill_on_late_arrival(self):
        corpus = synthetic_corpus(64, seed=5)
        recs = list(corpus.records())
        rng = np.random.default_rng(5)
        vecs = normed(rng.standard_normal((64, 32)).astype(np.float32))
        sem = normed(rng.standard_normal((32, 32)).astype(np.float32))
        s = VectorStore(dim=32, config=StoreConfig(pad_multiple=64))
        s.insert_records(recs[:32], vecs[:32])  # no semantic vectors
        assert s._semantic_vectors is None
        s.insert_records(recs[32:], vecs[32:], semantic_vectors=sem)
        assert s._semantic_vectors is not None
        assert s._semantic_vectors.shape == (64, 32)
        # first 32 rows backfilled with record vectors, last 32 use sem
        np.testing.assert_allclose(s._semantic_vectors[:32], vecs[:32])
        np.testing.assert_allclose(s._semantic_vectors[32:], sem)
        # and semantic_similarities reads the semantic rows
        sims = s.semantic_similarities(sem[:1], np.array([[32]]))
        assert sims[0, 0] == pytest.approx(1.0, abs=1e-5)

    def test_mixed_inserts_stay_row_parallel(self):
        corpus = synthetic_corpus(48, seed=6)
        recs = list(corpus.records())
        rng = np.random.default_rng(6)
        vecs = normed(rng.standard_normal((48, 32)).astype(np.float32))
        sem = normed(rng.standard_normal((16, 32)).astype(np.float32))
        s = VectorStore(dim=32, config=StoreConfig(pad_multiple=64))
        s.insert_records(recs[:16], vecs[:16], semantic_vectors=sem)
        s.insert_records(recs[16:32], vecs[16:32])  # none -> record vecs
        s.insert_records(recs[32:], vecs[32:], semantic_vectors=vecs[32:])
        assert s._semantic_vectors.shape == (48, 32)
        np.testing.assert_allclose(s._semantic_vectors[:16], sem)
        np.testing.assert_allclose(s._semantic_vectors[16:32], vecs[16:32])


class TestStatsKnobs:
    def test_stats_expose_index_params(self):
        from rag_icd10_tpu.config import HNSWConfig

        s = VectorStore(
            dim=16,
            config=StoreConfig(pad_multiple=64),
            hnsw_config=HNSWConfig(M=24, ef_construction=111, ef_search=77),
        )
        stats = s.get_collection_stats()
        assert stats["index_params"] == {
            "M": 24, "ef_construction": 111, "ef_search": 77,
        }
        assert stats["search_method"] in ("exact", "approx")


class TestFastMethod:
    def test_fast_matches_exact(self, store):
        """method='fast' (certified chunk-select) returns the same hits
        as the exact path; uncertified queries transparently redo."""
        rng = np.random.default_rng(5)
        q = normed(rng.standard_normal((4, 64)).astype(np.float32))
        fast = store.search(q, 5, method="fast")
        exact = store.search(q, 5, method="exact")
        for rf, re_ in zip(fast, exact):
            assert [h.code for h in rf] == [h.code for h in re_]
            np.testing.assert_allclose(
                [h.score for h in rf], [h.score for h in re_],
                rtol=1e-4, atol=1e-4,
            )

    def test_fast_on_duplicate_rows_still_exact(self):
        """Near-duplicate corpus rows (certificate-hostile ties) must
        still produce exact results via the host-mediated redo."""
        from rag_icd10_tpu.data.corpus import synthetic_corpus

        corpus = synthetic_corpus(300, seed=2)
        rng = np.random.default_rng(2)
        base = normed(rng.standard_normal((1, 64)).astype(np.float32))
        vecs = normed(
            base + 1e-7 * rng.standard_normal((300, 64)).astype(np.float32)
        )
        s = VectorStore(dim=64, config=StoreConfig(pad_multiple=256))
        s.insert_records(list(corpus.records()), vecs)
        fast = s.search(base, 5, method="fast")
        exact = s.search(base, 5, method="exact")
        np.testing.assert_allclose(
            [h.score for h in fast[0]], [h.score for h in exact[0]],
            rtol=1e-5, atol=1e-5,
        )


class TestDeviceQueries:
    def test_search_accepts_jax_arrays(self, store):
        """Device (jax) query arrays must produce identical hits to the
        numpy path — the serving hot path feeds encoder output straight
        in without a host round trip."""
        import jax.numpy as jnp

        rng = np.random.default_rng(9)
        q = normed(rng.standard_normal((3, 64)).astype(np.float32))
        host = store.search(q, 5)
        dev = store.search(jnp.asarray(q), 5)
        for rh, rd in zip(host, dev):
            assert [h.code for h in rh] == [h.code for h in rd]
            np.testing.assert_allclose(
                [h.score for h in rh], [h.score for h in rd], rtol=1e-6
            )

    def test_device_1d_query_and_hnsw_fallback(self, store):
        import jax.numpy as jnp

        rng = np.random.default_rng(10)
        q = normed(rng.standard_normal((64,)).astype(np.float32))
        dev = store.search(jnp.asarray(q), 3)
        host = store.search(q, 3)
        assert [h.code for h in dev[0]] == [h.code for h in host[0]]
        # hnsw path pulls the device array to host transparently
        dev_h = store.search(jnp.asarray(q), 3, method="hnsw")
        assert len(dev_h[0]) == 3
