"""bf16 device-residency option: results stay rank-correct within bf16
tolerance of the fp32 path."""

import numpy as np

from rag_icd10_tpu.config import StoreConfig
from rag_icd10_tpu.data.corpus import synthetic_corpus
from rag_icd10_tpu.index.vector_store import VectorStore


def test_bf16_residency_matches_fp32_ranking():
    corpus = synthetic_corpus(256, seed=11)
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((256, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    s32 = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
    s32.insert_records(list(corpus.records()), vecs)
    s16 = VectorStore(
        dim=64, config=StoreConfig(pad_multiple=128, device_dtype="bfloat16")
    )
    s16.insert_records(list(corpus.records()), vecs)

    q = vecs[:4]
    r32 = s32.search(q, top_k=5)
    r16 = s16.search(q, top_k=5)
    for a, b in zip(r32, r16):
        # same candidate set at bf16 tolerance; scores within 1e-2
        assert {h.code for h in a} & {h.code for h in b}
        np.testing.assert_allclose(
            [h.score for h in a], [h.score for h in b], atol=2e-2, rtol=2e-2
        )
    stats = s16.get_memory_usage()
    assert stats["device_dtype"] == "bfloat16"


class TestInt8Residency:
    """int8 quantized residency: 4x less corpus HBM at recall@10>=0.99."""

    def _pair(self, n=2048, d=64, int8_rerank="device"):
        corpus = synthetic_corpus(n, seed=12)
        rng = np.random.default_rng(12)
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        s32 = VectorStore(dim=d, config=StoreConfig(pad_multiple=128))
        s32.insert_records(list(corpus.records()), vecs)
        s8 = VectorStore(
            dim=d,
            config=StoreConfig(
                pad_multiple=128, device_dtype="int8",
                int8_rerank=int8_rerank,
            ),
        )
        s8.insert_records(list(corpus.records()), vecs)
        return s32, s8, vecs

    def test_host_rerank_mode_is_exact(self):
        """INT8_RERANK=host re-ranks against the host fp32 matrix —
        bit-parity with the fp32 path."""
        s32, s8, vecs = self._pair(int8_rerank="host")
        rng = np.random.default_rng(14)
        q = vecs[rng.integers(0, len(vecs), 16)]
        for a, b in zip(s32.search(q, top_k=10), s8.search(q, top_k=10)):
            assert [h.id for h in a] == [h.id for h in b]

    def test_device_rerank_needs_no_host_matrix(self):
        """INT8_RERANK=device (default): the search path never touches
        the host fp32 matrix — the int8 matrix is the only corpus-sized
        array involved (the 1/4-memory serving story)."""
        s32, s8, vecs = self._pair()
        s8.load_collection()
        hidden = s8._vectors
        s8._vectors = None  # search must not need it
        try:
            q = vecs[:8]
            rows = s8.search(q, top_k=10)
            assert all(len(r) == 10 for r in rows)
            recalls = []
            for a, b in zip(s32.search(q, top_k=10), rows):
                recalls.append(
                    len({h.id for h in a} & {h.id for h in b}) / 10
                )
            assert np.mean(recalls) >= 0.99
        finally:
            s8._vectors = hidden

    def test_recall_vs_fp32(self):
        s32, s8, vecs = self._pair()
        rng = np.random.default_rng(13)
        q = vecs[rng.integers(0, len(vecs), 32)]
        r32 = s32.search(q, top_k=10)
        r8 = s8.search(q, top_k=10)
        recalls = []
        for a, b in zip(r32, r8):
            ids_a = {h.id for h in a}
            ids_b = {h.id for h in b}
            recalls.append(len(ids_a & ids_b) / 10)
        assert np.mean(recalls) >= 0.99, np.mean(recalls)

    def test_scores_close_and_weighted(self):
        s32, s8, vecs = self._pair(n=256)
        r8 = s8.search(vecs[:2], top_k=5)
        r32 = s32.search(vecs[:2], top_k=5)
        for a, b in zip(r32, r8):
            for ha, hb in zip(a, b):
                if ha.id == hb.id:
                    assert abs(ha.score - hb.score) < 3e-2
            # level weighting preserved in the quantized path
            for h in b:
                w = {1: 1.2, 2: 1.0, 3: 0.8}[h.level]
                assert h.score == __import__("pytest").approx(
                    h.original_score * w, rel=1e-3)

    def test_fused_engine_skips_int8(self):
        from rag_icd10_tpu.ops.fused_query import FusedQueryEngine

        _, s8, _ = self._pair(n=256)
        s8.load_collection()

        class E:  # minimal duck-typed "real" encoder shape
            model = params = tokenizer = object()

        assert not FusedQueryEngine.supports(E(), s8)

    def test_quantize_roundtrip_error(self):
        from rag_icd10_tpu.ops.quantized import quantize_rows

        rng = np.random.default_rng(14)
        x = rng.standard_normal((128, 64)).astype(np.float32)
        q, scale = quantize_rows(x)
        back = q.astype(np.float32) * scale[:, None]
        rel = np.abs(back - x).max() / np.abs(x).max()
        assert rel < 1e-2
        assert q.dtype == np.int8 and scale.dtype == np.float32
