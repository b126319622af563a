"""Fused encode+search path: equivalence with the two-step path."""

import numpy as np
import pytest

from rag_icd10_tpu.config import EncoderConfig, NERConfig, StoreConfig
from rag_icd10_tpu.data.corpus import ICDCorpus
from rag_icd10_tpu.index import VectorStore
from rag_icd10_tpu.models.encoder import TextEncoder
from rag_icd10_tpu.models.tokenizer import WordPieceTokenizer
from rag_icd10_tpu.ops.fused_query import FusedQueryEngine
from rag_icd10_tpu.pipeline.ner import MedicalNERService
from rag_icd10_tpu.pipeline.orchestrator import MultiDiagnosisService
from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor

from test_orchestrator import CORPUS_ROWS

TINY = dict(
    hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
    max_position_embeddings=64, vocab_size=256, dtype="float32",
    max_length=64, length_buckets=(16, 32, 64),
)


@pytest.fixture(scope="module")
def setup():
    corpus = ICDCorpus.from_rows(CORPUS_ROWS)
    tok = WordPieceTokenizer.from_corpus(corpus.titles + corpus.semantic_texts)
    enc = TextEncoder(EncoderConfig(**TINY), tokenizer=tok)
    vecs = enc.encode_batch(corpus.semantic_texts, kind="query")
    store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
    store.insert_records(list(corpus.records()), vecs)
    store.load_collection()
    return enc, store, corpus


class TestFusedEngine:
    def test_supports_real_encoder(self, setup):
        enc, store, _ = setup
        assert FusedQueryEngine.supports(enc, store)

    def test_fused_matches_two_step(self, setup):
        enc, store, corpus = setup
        texts = ["急性胃肠炎", "高血压病3级"]
        fused = FusedQueryEngine(enc, store)
        emb_f, vals_f, idx_f = fused.query(texts, k=8)
        emb_s = enc.encode_queries(texts)
        hits = store.search(emb_s, top_k=8)
        np.testing.assert_allclose(emb_f, emb_s, atol=1e-5)
        for i, row in enumerate(hits):
            assert [h.id for h in row] == idx_f[i][: len(row)].tolist()
            np.testing.assert_allclose(
                [h.score for h in row], vals_f[i][: len(row)], rtol=1e-5
            )

    def test_orchestrator_uses_fused_path(self, setup, monkeypatch):
        monkeypatch.setenv("FUSED_QUERY", "1")
        enc, store, _ = setup
        ner = MedicalNERService(NERConfig(use_model=False))
        svc = MultiDiagnosisService(
            encoder=enc, store=store, ner_service=ner,
            text_processor=DiagnosisTextProcessor(
                use_enhanced_processing=True, ner_service=ner),
        )
        assert svc._fused_engine() is not None
        from rag_icd10_tpu.utils.metrics import metrics

        metrics.reset()
        result = svc.match_multiple_diagnoses("急性胃肠炎，高血压病3级", top_k=3)
        assert result["total_matches"] > 0
        snap = metrics.snapshot()
        assert "encode+search(fused)" in snap
        assert "encode" not in snap  # two-step path not taken

    def test_mock_encoder_falls_back(self):
        from test_orchestrator import MockEncoder

        corpus = ICDCorpus.from_rows(CORPUS_ROWS)
        enc = MockEncoder()
        vecs = enc.encode_queries(corpus.semantic_texts)
        store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
        store.insert_records(list(corpus.records()), vecs)
        ner = MedicalNERService(NERConfig(use_model=False))
        svc = MultiDiagnosisService(
            encoder=enc, store=store, ner_service=ner,
            text_processor=DiagnosisTextProcessor(
                use_enhanced_processing=True, ner_service=ner),
        )
        assert svc._fused_engine() is None
        result = svc.match_multiple_diagnoses("急性胃肠炎", top_k=3)
        assert result["total_matches"] > 0


class TestFusedInvalidation:
    """Regression: the cached FusedQueryEngine must be dropped when the
    orchestrator's store/encoder object is swapped (e.g. a resource reload
    builds a fresh store), not keep serving from the old binding."""

    def test_store_swap_invalidates_engine(self, setup, monkeypatch):
        monkeypatch.setenv("FUSED_QUERY", "1")
        enc, store, corpus = setup
        ner = MedicalNERService(NERConfig(use_model=False))
        svc = MultiDiagnosisService(
            encoder=enc, store=store, ner_service=ner,
            text_processor=DiagnosisTextProcessor(
                use_enhanced_processing=True, ner_service=ner),
        )
        first = svc._fused_engine()
        assert first is not None and first.store is store
        # swap in a NEW store object (different corpus subset)
        vecs = enc.encode_batch(corpus.semantic_texts, kind="query")
        store2 = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
        store2.insert_records(list(corpus.records()), vecs)
        store2.load_collection()
        svc.store = store2
        second = svc._fused_engine()
        assert second is not None
        assert second is not first
        assert second.store is store2
        # engine bound to the new arrays actually serves
        result = svc.match_multiple_diagnoses("急性胃肠炎", top_k=3)
        assert result["total_matches"] > 0

    def test_encoder_swap_invalidates_engine(self, setup, monkeypatch):
        monkeypatch.setenv("FUSED_QUERY", "1")
        enc, store, corpus = setup
        ner = MedicalNERService(NERConfig(use_model=False))
        svc = MultiDiagnosisService(
            encoder=enc, store=store, ner_service=ner,
            text_processor=DiagnosisTextProcessor(
                use_enhanced_processing=True, ner_service=ner),
        )
        first = svc._fused_engine()
        assert first is not None
        tok = enc.tokenizer
        enc2 = TextEncoder(EncoderConfig(**TINY), tokenizer=tok)
        svc.encoder = enc2
        second = svc._fused_engine()
        assert second is not first and second.encoder is enc2
