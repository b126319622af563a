"""Property/fuzz tests for the scoring math: invariants that must hold for
ANY input (caps, ranges, monotonicity), complementing the exact-constant
tests in test_rescoring.py."""

import numpy as np
import pytest

from rag_icd10_tpu.pipeline.confidence import (
    ConfidenceFactors,
    MultiDimensionalConfidenceService,
)
from rag_icd10_tpu.pipeline.hierarchy import (
    HierarchicalSimilarityService,
    SimilarityFactors,
)
from rag_icd10_tpu.pipeline.uncertainty import detect_uncertainty, unspecified_boost

RNG = np.random.default_rng(42)


def random_factors():
    return SimilarityFactors(
        vector_similarity=float(RNG.uniform(0, 1.3)),
        hierarchy_boost=float(RNG.uniform(0, 0.3)),
        entity_match_score=float(RNG.uniform(0, 1)),
        semantic_coherence=float(RNG.uniform(0, 1)),
        category_alignment=float(RNG.uniform(0, 1)),
        context_relevance=float(RNG.uniform(0, 1)),
    )


class TestHierarchyInvariants:
    def test_score_always_capped_and_nonnegative_base(self):
        svc = HierarchicalSimilarityService()
        for _ in range(200):
            s = svc._weighted_score(random_factors())
            assert s <= 1.8 + 1e-9

    def test_score_monotonic_in_entity_match(self):
        svc = HierarchicalSimilarityService()
        for _ in range(50):
            f = random_factors()
            lo = svc._weighted_score(f)
            f.entity_match_score = min(f.entity_match_score + 0.2, 1.0)
            hi = svc._weighted_score(f)
            assert hi >= lo - 1e-9

    def test_hierarchy_boost_bounds_any_record(self):
        svc = HierarchicalSimilarityService()
        entities = {
            "disease": [{"text": "心脏病感染", "confidence": 0.9}],
            "symptom": [],
            "anatomy": [],
        }
        for _ in range(100):
            level = int(RNG.integers(0, 6))
            code = RNG.choice(["A01", "I21.9", "", "Z99", "K52.904"])
            rec = {
                "level": level,
                "code": str(code),
                "parent_code": str(code)[:3],
                "preferred_zh": "x",
            }
            b = svc._hierarchy_boost("心脏感染检查", entities, rec)
            assert 0.0 <= b <= 0.3


class TestConfidenceInvariants:
    def test_overall_in_unit_interval_any_records(self):
        svc = MultiDimensionalConfidenceService()
        for _ in range(30):
            n = int(RNG.integers(0, 8))
            records = [
                {
                    "code": str(RNG.choice(["A01", "I21.9", ""])),
                    "preferred_zh": "病" * int(RNG.integers(0, 12)),
                    "score": float(RNG.uniform(-0.2, 1.9)),
                    "level": int(RNG.integers(1, 4)),
                }
                for _ in range(n)
            ]
            metrics, factors = svc.calculate_comprehensive_confidence(
                "急性胃肠炎伴未特指的并发症", records
            )
            assert 0.0 <= metrics.overall_confidence <= 1.0
            lo, hi = metrics.confidence_interval
            assert 0.0 <= lo <= hi <= 1.0
            assert 0.0 <= metrics.reliability_score <= 1.0
            for v in factors.to_dict().values():
                assert np.isfinite(v)

    def test_weights_invariant_after_many_threshold_adjusts(self):
        svc = MultiDimensionalConfidenceService()
        svc.adjust_thresholds({"high_confidence": 0.99, "bogus_key": 0.1})
        assert "bogus_key" not in svc.confidence_thresholds
        assert sum(svc.factor_weights.values()) == pytest.approx(1.0)


class TestUncertaintyInvariants:
    def test_boost_values_closed_set(self):
        titles = ["未特指的胃炎", "胃炎，未特指", "其他胃炎", "某病", "不明胃炎"]
        codes = ["K29.7", "K29.9", "A01", "", "K29.91"]
        for t in titles:
            for c in codes:
                b = unspecified_boost(t, c, "胃炎")
                assert b in (0.0, 0.15, 0.20, 0.25, 0.30)

    def test_detect_weight_closed_set_fuzz(self):
        markers = ["待查", "疑似", "不除外", "", "？"]
        for _ in range(100):
            text = "".join(RNG.choice(markers, size=3)) + "胃炎"
            info = detect_uncertainty(text)
            assert info.uncertainty_weight in (0.0, 0.8, 0.9, 1.0)
            if info.has_uncertainty:
                assert info.clean_text != "" or text.strip("待查疑似不除外？") == ""
