"""Fault-injection tests for the graceful-degradation ladder.

The reference degrades at every layer but never tests it (SURVEY.md §5:
"Preserve the degradation ladder as explicit pipeline policy; add actual
fault-injection tests"). Each test breaks one dependency and asserts the
pipeline still answers.
"""

import numpy as np
import pytest

from rag_icd10_tpu.config import NERConfig, StoreConfig
from rag_icd10_tpu.data.corpus import ICDCorpus
from rag_icd10_tpu.index import VectorStore
from rag_icd10_tpu.pipeline.llm import LLMService
from rag_icd10_tpu.pipeline.ner import MedicalNERService
from rag_icd10_tpu.pipeline.orchestrator import MultiDiagnosisService
from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor

from test_orchestrator import CORPUS_ROWS, MockEncoder


def make_service(**overrides):
    corpus = ICDCorpus.from_rows(CORPUS_ROWS)
    enc = MockEncoder()
    vecs = enc.encode_queries(corpus.semantic_texts)
    store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
    store.insert_records(list(corpus.records()), vecs)
    ner = MedicalNERService(NERConfig(use_model=False))
    kwargs = dict(
        encoder=enc,
        store=store,
        ner_service=ner,
        text_processor=DiagnosisTextProcessor(
            use_enhanced_processing=True, ner_service=ner
        ),
    )
    kwargs.update(overrides)
    return MultiDiagnosisService(**kwargs)


class BrokenHierarchical:
    """Rescoring engine that always explodes."""

    def batch_calculate_similarities(self, *a, **k):
        raise RuntimeError("injected rescoring failure")


class BrokenNER:
    def extract_medical_entities(self, *a, **k):
        raise RuntimeError("injected NER failure")

    def get_entity_summary(self, *a, **k):
        raise RuntimeError("injected NER failure")

    def get_model_info(self):
        return {"use_model": False}


class TestDegradationLadder:
    def test_rescoring_failure_falls_back_to_plain_match(self):
        svc = make_service(hierarchical=BrokenHierarchical())
        result = svc.match_multiple_diagnoses("急性胃肠炎", top_k=3)
        match = result["matches"][0]
        # plain match: candidates present, heuristic confidence, no metrics
        assert match.candidates
        assert match.confidence_metrics is None
        assert 0.0 <= match.match_confidence <= 1.0

    def test_ner_failure_inside_rescore_falls_back(self):
        svc = make_service(ner_service=BrokenNER())
        # text processor also gets the broken NER -> enhanced extraction
        # falls back internally; match must still answer
        result = svc.match_multiple_diagnoses("急性胃肠炎，高血压", top_k=3)
        assert result["matches"]
        for m in result["matches"]:
            assert m.candidates

    def test_empty_store_returns_empty_matches(self):
        svc = make_service()
        svc.store.clear_collection()
        result = svc.match_multiple_diagnoses("急性胃肠炎", top_k=3)
        match = result["matches"][0]
        assert match.candidates == []
        # query-only confidence factors remain, but stay below the reject
        # threshold (0.20) so should_reject_prediction fires
        assert match.match_confidence < 0.20

    def test_enhanced_processor_failure_uses_simple_split(self):
        class BrokenEnhanced:
            def extract_diagnoses_enhanced(self, text):
                raise RuntimeError("injected")

        proc = DiagnosisTextProcessor(use_enhanced_processing=True)
        proc._enhanced = BrokenEnhanced()
        out = proc.extract_diagnoses("肺炎，心衰")
        assert out == ["肺炎", "心衰"]  # simple-mode fallback

    def test_llm_unreachable_fallback_result(self):
        svc = LLMService()
        # zero-egress environment: the HTTP call fails -> top-candidate
        # fallback with confidence capped at 0.95
        out = svc.standardize_diagnosis(
            "急性胃肠炎",
            [{"code": "K52.9", "title": "未特指的胃肠炎", "score": 1.3}],
        )
        assert out == [
            {
                "diagnosis": "急性胃肠炎",
                "code": "K52.9",
                "title": "未特指的胃肠炎",
                "confidence": 0.95,
            }
        ]

    def test_llm_unreachable_no_candidates(self):
        assert LLMService().standardize_diagnosis("x", []) == []

    def test_ner_model_mode_without_weights_degrades_to_rules(self, monkeypatch):
        monkeypatch.delenv("NER_WEIGHTS_PATH", raising=False)
        svc = MedicalNERService(NERConfig(use_model=True))
        assert not svc.use_model
        ents = svc.extract_medical_entities("急性胃肠炎")
        assert any(ents.values())


class TestMetrics:
    def test_stage_latency_recorded(self):
        from rag_icd10_tpu.utils.metrics import StageMetrics

        m = StageMetrics(window=8)
        with m.timer("encode"):
            pass
        m.record("search", 0.002)
        snap = m.snapshot()
        assert set(snap) == {"encode", "search"}
        assert snap["search"]["count"] == 1
        assert snap["search"]["p50_ms"] == pytest.approx(2.0, rel=0.2)

    def test_pipeline_populates_metrics(self):
        from rag_icd10_tpu.utils.metrics import metrics

        metrics.reset()
        svc = make_service()
        svc.match_multiple_diagnoses("急性胃肠炎", top_k=3)
        snap = metrics.snapshot()
        assert {"extract", "encode", "search", "rescore"} <= set(snap)
