"""Orchestrator tests with a deterministic mock encoder (the reference's
duck-typed mock-embedding fixture pattern, SURVEY.md §4)."""

import hashlib

import numpy as np
import pytest

from rag_icd10_tpu.config import NERConfig, StoreConfig
from rag_icd10_tpu.data.corpus import ICDCorpus
from rag_icd10_tpu.index import VectorStore
from rag_icd10_tpu.pipeline.ner import MedicalNERService
from rag_icd10_tpu.pipeline.orchestrator import MultiDiagnosisService
from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor


class MockEncoder:
    """Deterministic text -> unit vector. Same text => same vector; adds a
    char-overlap component so related strings are closer than random."""

    dim = 64

    def _vec(self, text: str) -> np.ndarray:
        h = hashlib.sha256(text.encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        v = rng.standard_normal(self.dim)
        for ch in text:
            crng = np.random.default_rng(ord(ch))
            v += 0.8 * crng.standard_normal(self.dim)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def encode_queries(self, texts):
        return np.stack([self._vec(t) for t in texts])

    def encode_query(self, text):
        return self._vec(text)

    def encode_batch(self, texts, kind="passage", batch_size=None):
        return self.encode_queries(texts)

    def get_model_info(self):
        return {
            "model_name": "mock-encoder",
            "embedding_dimension": self.dim,
            "max_seq_length": 512,
            "device": "mock",
        }


CORPUS_ROWS = [
    {"code": "K52", "disease": "胃肠炎"},
    {"code": "K52.9", "disease": "未特指的胃肠炎"},
    {"code": "K52.904", "disease": "急性胃肠炎"},
    {"code": "I10", "disease": "高血压"},
    {"code": "I10.005", "disease": "高血压病3级"},
    {"code": "E11", "disease": "2型糖尿病"},
    {"code": "E11.9", "disease": "未特指的2型糖尿病"},
    {"code": "J18", "disease": "肺炎"},
]


@pytest.fixture(scope="module")
def service():
    corpus = ICDCorpus.from_rows(CORPUS_ROWS)
    enc = MockEncoder()
    vecs = enc.encode_queries(corpus.semantic_texts)
    store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
    store.insert_records(list(corpus.records()), vecs, semantic_vectors=vecs)
    ner = MedicalNERService(NERConfig(use_model=False))
    return MultiDiagnosisService(
        encoder=enc,
        store=store,
        ner_service=ner,
        text_processor=DiagnosisTextProcessor(
            use_enhanced_processing=True, ner_service=ner
        ),
    )


class TestMatchMultiple:
    def test_pooled_rescore_matches_sequential(self, service):
        """RESCORE_WORKERS>1 fans per-diagnosis rescoring over a thread
        pool (the multi-core serving host path); results must equal the
        sequential path byte-for-byte."""
        from concurrent.futures import ThreadPoolExecutor

        texts = ["急性胃肠炎，高血压病3级", "2型糖尿病", "肺炎；支气管炎"]
        service._rescore_executor = None  # force sequential
        seq = service.match_many_texts(texts, top_k=3)
        pool = ThreadPoolExecutor(max_workers=4)
        try:
            service._rescore_executor = pool
            par = service.match_many_texts(texts, top_k=3)
        finally:
            service._rescore_executor = False  # back to auto
            pool.shutdown()
        for a, b in zip(seq, par):
            assert a["extracted_diagnoses"] == b["extracted_diagnoses"]
            assert a["total_matches"] == b["total_matches"]
            for ma, mb in zip(a["matches"], b["matches"]):
                assert ma.diagnosis_text == mb.diagnosis_text
                assert ma.match_confidence == mb.match_confidence
                assert [c.code for c in ma.candidates] == [
                    c.code for c in mb.candidates
                ]
                assert [c.score for c in ma.candidates] == [
                    c.score for c in mb.candidates
                ]

    def test_stage_split_equals_monolithic(self, service):
        """extract/device/rescore stages composed manually must equal
        match_many_texts (the batcher pipelines over these stages)."""
        texts = ["急性胃肠炎，高血压病3级", "肺炎"]
        mono = service.match_many_texts(texts, top_k=3)
        state = service.extract_stage(texts)
        service.device_stage(state, top_k=3)
        staged = service.rescore_stage(state, top_k=3)
        for a, b in zip(mono, staged):
            assert a["extracted_diagnoses"] == b["extracted_diagnoses"]
            assert [
                [c.code for c in m.candidates] for m in a["matches"]
            ] == [[c.code for c in m.candidates] for m in b["matches"]]

    def test_device_stage_is_dispatch_only(self, service):
        """With a dispatch-capable store, device_stage must defer every
        blocking fetch: it returns with a PendingSearch in the state and
        NO materialized hits; rescore_stage's finalize step fills them in
        (api/batching.py overlaps batches on exactly this contract)."""
        state = service.extract_stage(["急性胃肠炎，高血压病3级"])
        service.device_stage(state, top_k=3)
        assert "pending_search" in state
        assert "all_hits" not in state
        results = service.rescore_stage(state, top_k=3)
        assert "pending_search" not in state  # consumed by finalize
        assert len(state["all_hits"]) == len(state["flat_diagnoses"])
        assert results[0]["matches"]

    def test_search_dispatch_equals_search(self, service):
        """store.search_dispatch(...).finalize() must equal store.search."""
        q = service.encoder.encode_queries(["急性胃肠炎", "肺炎"])
        eager = service.store.search(q, 3)
        deferred = service.store.search_dispatch(q, 3).finalize()
        assert [[h.code for h in row] for row in eager] == [
            [h.code for h in row] for row in deferred
        ]
        assert [[h.score for h in row] for row in eager] == [
            [h.score for h in row] for row in deferred
        ]

    def test_result_contract(self, service):
        result = service.match_multiple_diagnoses("急性胃肠炎，高血压病3级", top_k=3)
        assert set(result) == {
            "original_text",
            "extracted_diagnoses",
            "matches",
            "total_matches",
            "processing_mode",
            "extraction_metadata",
        }
        assert len(result["extracted_diagnoses"]) == 2
        assert len(result["matches"]) == 2
        assert result["total_matches"] == sum(
            len(m.candidates) for m in result["matches"]
        )

    def test_exact_title_match_ranks_first(self, service):
        result = service.match_multiple_diagnoses("急性胃肠炎", top_k=3)
        match = result["matches"][0]
        assert match.candidates[0].title == "急性胃肠炎"
        # exact match floor >= 1.5 (hierarchical_similarity_service.py:203-209)
        assert match.candidates[0].score >= 1.5

    def test_candidates_have_factors_and_confidence(self, service):
        result = service.match_multiple_diagnoses("急性胃肠炎", top_k=3)
        m = result["matches"][0]
        assert m.confidence_metrics is not None
        assert m.confidence_level in ("高置信度", "中等置信度", "低置信度", "极低置信度")
        c = m.candidates[0]
        assert c.similarity_factors is not None
        assert c.original_score is not None

    def test_empty_text(self, service):
        result = service.match_multiple_diagnoses("", top_k=3)
        assert result["matches"] == [] and result["total_matches"] == 0

    def test_uncertainty_boosts_unspecified(self, service):
        result = service.match_multiple_diagnoses("胃肠炎待查", top_k=3)
        titles = [c.title for c in result["matches"][0].candidates]
        assert "未特指的胃肠炎" in titles

    def test_topk_respected(self, service):
        result = service.match_multiple_diagnoses("肺炎", top_k=2)
        assert len(result["matches"][0].candidates) <= 2

    def test_match_dict_serializable(self, service):
        import json

        result = service.match_multiple_diagnoses("急性胃肠炎", top_k=2)
        payload = [m.to_dict() for m in result["matches"]]
        json.dumps(payload)  # must not raise


class TestHeuristicConfidence:
    def test_formula(self, service):
        from rag_icd10_tpu.pipeline.orchestrator import Candidate

        mk = lambda s: Candidate(code="x", title="y", score=s)
        f = service._calculate_match_confidence
        assert f([mk(0.95)]) == 0.95
        assert f([mk(0.99)]) == 0.95  # capped
        assert f([mk(0.8), mk(0.75)]) == pytest.approx(0.8 * 0.8)
        assert f([mk(0.5)]) == pytest.approx(0.3)
        assert f([]) == 0.0


class TestReports:
    def test_suggestions(self, service):
        suggestions = service.get_diagnosis_suggestions("急性胃肠炎", min_confidence=0.0)
        assert suggestions
        assert {"diagnosis", "confidence", "best_match", "alternative_matches"} <= set(
            suggestions[0]
        )

    def test_detailed_report(self, service):
        report = service.get_detailed_confidence_report("急性胃肠炎，高血压病3级")
        assert report["processing_summary"]["total_diagnoses"] == 2
        assert len(report["diagnosis_reports"]) == 2
        assert report["overall_assessment"]["overall_quality"] in (
            "优秀",
            "良好",
            "一般",
            "待改进",
        )


class TestUncertaintyStrippedEncoding:
    """Documented divergence: retrieval encodes uncertainty-STRIPPED text
    (the reference embeds the raw fragment and relies on a pretrained
    encoder shrugging markers off). The mock encoder is marker-sensitive,
    so these pass only if the orchestrator strips before encoding."""

    def test_marked_query_matches_clean_query_results(self, service):
        clean = service.match_multiple_diagnoses("急性胃肠炎", top_k=3)
        clean_top = [c.code for c in clean["matches"][0].candidates]
        for query in ("疑似急性胃肠炎", "急性胃肠炎待查", "考虑急性胃肠炎"):
            res = service.match_multiple_diagnoses(query, top_k=3)
            m = res["matches"][0]
            assert m.candidates, query
            # stripped-encoding: the marked query retrieves the same
            # candidate set the clean query does (modulo boost re-order)
            assert set(c.code for c in m.candidates) == set(clean_top), (
                query, [(c.title, c.score) for c in m.candidates])
