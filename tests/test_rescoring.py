"""Rescoring stack tests: hierarchical similarity + 12-dim confidence.

Reproduces the reference's constants and behaviors (SURVEY.md §2.2), using
the mock-candidate pattern of hierarchical_similarity_service.py:642-733.
"""

import numpy as np
import pytest

from rag_icd10_tpu.pipeline.confidence import (
    ConfidenceFactors,
    MultiDimensionalConfidenceService,
    context_consistency,
)
from rag_icd10_tpu.pipeline.hierarchy import (
    FACTOR_WEIGHTS_DEFAULT,
    HierarchicalSimilarityService,
    SimilarityFactors,
)


def make_candidates():
    """Mirrors the reference's hand-written I21.9/I47.9/I25.9 fixtures."""
    return [
        {
            "id": 0,
            "code": "I21.9",
            "preferred_zh": "急性心肌梗死",
            "score": 0.85,
            "level": 2,
            "parent_code": "I21",
            "category_path": "I21 > I21.9",
            "semantic_text": "急性心肌梗死 | 急性心肌梗死 | ICD-10: I21.9",
        },
        {
            "id": 1,
            "code": "I47.9",
            "preferred_zh": "阵发性心动过速",
            "score": 0.65,
            "level": 2,
            "parent_code": "I47",
            "category_path": "I47 > I47.9",
            "semantic_text": "阵发性心动过速 | ICD-10: I47.9",
        },
        {
            "id": 2,
            "code": "I25.9",
            "preferred_zh": "慢性缺血性心脏病",
            "score": 0.55,
            "level": 3,
            "parent_code": "I25",
            "category_path": "I25 > I25.9",
            "semantic_text": "慢性缺血性心脏病 | ICD-10: I25.9",
        },
    ]


QUERY_ENTITIES = {
    "disease": [{"text": "心肌梗死", "confidence": 0.9, "start": 2, "end": 6}],
    "symptom": [],
    "anatomy": [{"text": "心", "confidence": 0.7, "start": 2, "end": 3}],
}


class TestHierarchy:
    def setup_method(self):
        self.svc = HierarchicalSimilarityService()

    def test_weights_sum_to_one(self):
        assert sum(FACTOR_WEIGHTS_DEFAULT.values()) == pytest.approx(1.0)

    def test_exact_match_floor(self):
        record = make_candidates()[0]
        score, factors = self.svc.calculate_enhanced_similarity(
            "急性心肌梗死", QUERY_ENTITIES, record
        )
        assert score >= 1.5
        # exact match with vector 0.85 < 0.9 -> corrected to 1.0
        assert factors.vector_similarity == 1.0

    def test_exact_match_low_vector_corrected(self):
        record = dict(make_candidates()[0], score=0.3)
        score, factors = self.svc.calculate_enhanced_similarity(
            "急性心肌梗死", QUERY_ENTITIES, record
        )
        assert factors.vector_similarity == 1.0
        assert score >= 1.5

    def test_score_cap_18(self):
        record = dict(make_candidates()[0], score=1.7)
        score, _ = self.svc.calculate_enhanced_similarity(
            "急性心肌梗死心脏高血压心肌", QUERY_ENTITIES, record
        )
        assert score <= 1.8

    def test_hierarchy_boost_capped(self):
        record = make_candidates()[0]
        boost = self.svc._hierarchy_boost("心脏高血压心肌血管循环", QUERY_ENTITIES, record)
        assert 0.0 <= boost <= 0.3

    def test_level_boost_factors(self):
        # level boosts {1:.15, 2:.20, 3:.10} * 0.3 are part of hierarchy boost
        empty_entities = {"disease": [], "symptom": [], "anatomy": []}
        b1 = self.svc._hierarchy_boost("xyz", empty_entities, {"level": 1, "code": "X01", "parent_code": ""})
        b2 = self.svc._hierarchy_boost("xyz", empty_entities, {"level": 2, "code": "X01.1", "parent_code": "X01"})
        b3 = self.svc._hierarchy_boost("xyz", empty_entities, {"level": 3, "code": "X01.101", "parent_code": "X01.1"})
        assert b1 == pytest.approx(0.15 * 0.3)
        assert b2 == pytest.approx(0.20 * 0.3 + 0.1 * 0.3)  # + parent-child
        assert b3 == pytest.approx(0.10 * 0.3 + 0.1 * 0.3)

    def test_entity_match_weights(self):
        record = make_candidates()[0]
        # disease containment: 0.9*0.4 ; anatomy containment: 0.7*0.1
        score = self.svc._entity_match_score(QUERY_ENTITIES, record)
        assert score == pytest.approx(0.9 * 0.4 + 0.7 * 0.1)

    def test_batch_sorts_desc_and_keeps_uncertainty(self):
        results = self.svc.batch_calculate_similarities(
            "心肌梗死待查", QUERY_ENTITIES, make_candidates()
        )
        scores = [s for _, s, _ in results]
        assert scores == sorted(scores, reverse=True)
        for rec, score, factors in results:
            assert "enhanced_score" in rec and rec["enhanced_score"] == score
            assert isinstance(factors, SimilarityFactors)

    def test_capped_tie_breaks_on_raw_similarity(self):
        # Two non-exact siblings that both saturate the 1.8 cap: the cap
        # erases the enhanced-score signal, so the tertiary sort key must
        # fall back to the raw weighted similarity regardless of the
        # insertion order (the reference's stable sort keeps arbitrary
        # order here — documented divergence, hierarchy.py sort comment).
        base = make_candidates()[0]
        lo = dict(base, id=10, code="I21.1", preferred_zh="急性前壁心肌梗死", score=1.69)
        hi = dict(base, id=11, code="I21.2", preferred_zh="急性下壁心肌梗死", score=1.70)
        query = "急性心肌梗死心脏高血压心肌"
        for order in ([lo, hi], [hi, lo]):
            results = self.svc.batch_calculate_similarities(
                query, QUERY_ENTITIES, order
            )
            scores = [s for _, s, _ in results]
            assert scores == [1.8, 1.8], "premise: both candidates cap at 1.8"
            assert results[0][0]["code"] == "I21.2"

    def test_capped_tie_key_normalizes_boosted_original_score(self):
        # original_score has two reference-mandated semantics: raw
        # UNWEIGHTED cosine on search hits vs WEIGHTED pre-boost score on
        # uncertainty-boosted candidates. The tertiary tie-break must undo
        # the level weight on the boosted form, or a x1.2 ancestor with
        # LOWER raw similarity (1.08/1.2 = 0.90 < 0.95) outranks the gold
        # row at the cap — the weight-inversion class the key exists to fix.
        base = make_candidates()[0]
        gold = dict(
            base, id=30, code="I21.1", preferred_zh="急性前壁心肌梗死",
            score=1.70, original_score=0.95, level=3,
        )
        boosted = dict(
            base, id=31, code="I21", preferred_zh="急性心肌梗死未特指",
            score=1.69, original_score=1.08, level=1,
            uncertainty_boost=0.3, uncertainty_weight=1.0,
        )
        query = "急性心肌梗死心脏高血压心肌"
        for order in ([gold, boosted], [boosted, gold]):
            results = self.svc.batch_calculate_similarities(
                query, QUERY_ENTITIES, order
            )
            scores = [s for _, s, _ in results]
            assert scores == [1.8, 1.8], "premise: both candidates cap at 1.8"
            assert results[0][0]["code"] == "I21.1"

    def test_exact_title_outranks_capped_sibling(self):
        # Secondary key: an exact-title candidate beats a non-exact one at
        # equal capped score even when its raw similarity is LOWER.
        base = make_candidates()[0]
        exact = dict(base, id=20, code="I21.9", preferred_zh="急性心肌梗死心脏高血压心肌", score=1.60)
        sibling = dict(base, id=21, code="I21.1", preferred_zh="急性前壁心肌梗死", score=1.75)
        query = "急性心肌梗死心脏高血压心肌"
        for order in ([sibling, exact], [exact, sibling]):
            results = self.svc.batch_calculate_similarities(
                query, QUERY_ENTITIES, order
            )
            scores = [s for _, s, _ in results]
            assert scores == [1.8, 1.8], "premise: both candidates cap at 1.8"
            assert results[0][0]["code"] == "I21.9"

    def test_semantic_coherence_excess_only(self):
        f = SimilarityFactors(vector_similarity=0.8, semantic_coherence=0.9)
        s_with = self.svc._weighted_score(f)
        f2 = SimilarityFactors(vector_similarity=0.8, semantic_coherence=0.7)
        s_without = self.svc._weighted_score(f2)
        assert s_with == pytest.approx(s_without + 0.1)  # (0.9-0.8)*0.08/0.08

    def test_precision_bonus(self):
        hi = SimilarityFactors(vector_similarity=0.96)
        lo = SimilarityFactors(vector_similarity=0.94)
        # bonus 0.15 applies above 0.95
        assert self.svc._weighted_score(hi) == pytest.approx(0.96 + 0.15)
        assert self.svc._weighted_score(lo) == pytest.approx(0.94)

    def test_update_weights_renormalizes(self):
        svc = HierarchicalSimilarityService()
        svc.update_weights({"vector_similarity": 1.0})
        assert sum(svc.factor_weights.values()) == pytest.approx(1.0)

    def test_explanation_contract(self):
        f = SimilarityFactors(vector_similarity=0.8)
        exp = self.svc.get_similarity_explanation(f)
        assert "total_score" in exp and len(exp["factors"]) == 6


class TestConfidence:
    def setup_method(self):
        self.svc = MultiDimensionalConfidenceService()

    def test_weights_sum_to_one(self):
        assert sum(self.svc.factor_weights.values()) == pytest.approx(1.0)

    def test_comprehensive_confidence_shape(self):
        metrics, factors = self.svc.calculate_comprehensive_confidence(
            "急性心肌梗死", make_candidates()
        )
        assert 0.0 <= metrics.overall_confidence <= 1.0
        lo, hi = metrics.confidence_interval
        assert 0.0 <= lo <= hi <= 1.0
        assert 0.0 <= metrics.reliability_score <= 1.0
        assert len(factors.to_dict()) == 12

    def test_empty_candidates(self):
        metrics, _ = self.svc.calculate_comprehensive_confidence("心肌梗死", [])
        assert 0.0 <= metrics.overall_confidence <= 1.0

    def test_levels_and_reject(self):
        assert self.svc.get_confidence_level(0.85) == "高置信度"
        assert self.svc.get_confidence_level(0.65) == "中等置信度"
        assert self.svc.get_confidence_level(0.45) == "低置信度"
        assert self.svc.get_confidence_level(0.1) == "极低置信度"
        assert self.svc.should_reject_prediction(0.19)
        assert not self.svc.should_reject_prediction(0.21)

    def test_adjust_thresholds(self):
        self.svc.adjust_thresholds({"high_confidence": 0.9})
        assert self.svc.get_confidence_level(0.85) == "中等置信度"

    def test_complexity_monotonic(self):
        simple = self.svc._diagnosis_complexity("胃炎病")
        complex_ = self.svc._diagnosis_complexity(
            "冠状动脉粥样硬化并慢性心功能不全伴糖尿病酮症酸中毒，多发性脑梗死"
        )
        assert complex_ > simple

    def test_model_uncertainty_tight_scores_higher(self):
        tight = [{"score": 0.8}, {"score": 0.79}, {"score": 0.78}]
        spread = [{"score": 0.9}, {"score": 0.3}, {"score": 0.1}]
        assert self.svc._model_uncertainty(tight) > self.svc._model_uncertainty(spread)

    def test_cross_validation_buckets(self):
        strong = [{"score": 0.9}, {"score": 0.5}, {"score": 0.4}]
        weak = [{"score": 0.5}, {"score": 0.48}, {"score": 0.46}]
        assert self.svc._cross_validation(strong) == 0.8
        assert self.svc._cross_validation(weak) == 0.4
        assert self.svc._cross_validation([{"score": 0.5}]) == 0.5

    def test_confidence_interval_196_sigma(self):
        records = make_candidates()
        scores = [r["score"] for r in records]
        metrics, _ = self.svc.calculate_comprehensive_confidence("心肌梗死", records)
        std = float(np.std(scores))
        width = metrics.confidence_interval[1] - metrics.confidence_interval[0]
        # width <= 2*1.96*std (clamped to [0,1])
        assert width <= 2 * 1.96 * std + 1e-9
        assert metrics.prediction_variance == pytest.approx(np.var(scores))

    def test_context_consistency_formula(self):
        assert context_consistency("胃炎", "胃炎") == pytest.approx(1.0)
        assert context_consistency("", "x") == pytest.approx(0.0 * 0.7 + 0.0 * 0.3)

    def test_explanation_contract(self):
        metrics, factors = self.svc.calculate_comprehensive_confidence(
            "急性心肌梗死", make_candidates()
        )
        exp = self.svc.get_confidence_explanation(metrics, factors)
        assert len(exp["factor_contributions"]) == 12
        assert len(exp["top_contributing_factors"]) == 3
        assert "confidence_level" in exp

    def test_terminology_cache_from_corpus(self):
        from rag_icd10_tpu.data.corpus import synthetic_corpus

        svc = MultiDimensionalConfidenceService(corpus=synthetic_corpus(64))
        spec = svc._term_specificity(svc.corpus.titles[0])
        assert 0.0 < spec <= 1.0
