"""Text-pipeline tests: uncertainty, splitting, NER, entity filter,
boundaries, enhanced extraction.

Test cases mirror the reference's module-level smoke tests
(uncertainty_diagnosis_service.py:270-299, tools/text_processor.py:202-243,
medical_ner_service.py:471-514, diagnosis_entity_filter.py:349-407).
"""

import numpy as np
import pytest

from rag_icd10_tpu.config import FilterConfig, NERConfig
from rag_icd10_tpu.pipeline.boundary import SemanticBoundaryDetector
from rag_icd10_tpu.pipeline.enhanced import EnhancedTextProcessor, char_jaccard
from rag_icd10_tpu.pipeline.entity_filter import DiagnosisEntityFilter
from rag_icd10_tpu.pipeline.ner import MedicalNERService
from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor, split_simple
from rag_icd10_tpu.pipeline.uncertainty import (
    detect_uncertainty,
    process_uncertainty_query,
    unspecified_boost,
)


def rule_ner():
    return MedicalNERService(NERConfig(use_model=False))


class TestUncertainty:
    @pytest.mark.parametrize(
        "text,expected_weight",
        [
            ("胃炎待查", 1.0),
            ("疑似肺炎", 0.9),
            ("不除外心梗", 0.8),
            ("急性胃肠炎", 0.0),
            ("考虑为肺部感染？", 1.0),  # ？(1.0) outranks 考虑(0.9)
        ],
    )
    def test_detect_weight(self, text, expected_weight):
        info = detect_uncertainty(text)
        assert info.uncertainty_weight == pytest.approx(expected_weight)
        assert info.has_uncertainty == (expected_weight > 0)

    def test_clean_text_strips_markers(self):
        info = detect_uncertainty("疑似急性胃肠炎待查")
        assert "疑似" not in info.clean_text and "待查" not in info.clean_text
        assert "急性胃肠炎" in info.clean_text

    @pytest.mark.parametrize(
        "title,code,query,expected",
        [
            ("未特指的胃炎", "K29.7", "胃炎", 0.30),
            ("胃炎，未特指", "K29.7", "胃炎", 0.30),
            ("某种未特指病", "K29.7", "胃炎", 0.25),
            ("其他胃炎", "K29.6", "胃炎", 0.20),
            ("急性胃炎", "K29.9", "胃炎", 0.15),  # .9 code
            ("急性胃炎", "K29.1", "胃炎", 0.0),
        ],
    )
    def test_unspecified_boost_priority(self, title, code, query, expected):
        assert unspecified_boost(title, code, query) == pytest.approx(expected)

    def test_process_applies_weighted_boost_and_resorts(self):
        candidates = [
            {"code": "K29.1", "preferred_zh": "急性胃炎", "score": 0.80},
            {"code": "K29.7", "preferred_zh": "未特指的胃炎", "score": 0.75},
        ]
        clean, out = process_uncertainty_query("胃炎待查", candidates)
        assert clean == "胃炎"
        # boosted: 0.75 + 0.30*1.0 = 1.05 > 0.80 -> re-sorted first
        assert out[0]["code"] == "K29.7"
        assert out[0]["score"] == pytest.approx(1.05)
        assert out[0]["original_score"] == pytest.approx(0.75)

    def test_no_uncertainty_passthrough(self):
        cands = [{"code": "A", "preferred_zh": "未特指的胃炎", "score": 0.5}]
        clean, out = process_uncertainty_query("急性胃肠炎", cands)
        assert clean == "急性胃肠炎"
        assert out[0]["score"] == 0.5


class TestSimpleSplit:
    @pytest.mark.parametrize(
        "text,expected",
        [
            ("急性胃肠炎，高血压病3级", ["急性胃肠炎", "高血压病3级"]),
            ("肺炎；心衰", ["肺炎", "心衰"]),
            ("糖尿病+高血压", ["糖尿病", "高血压"]),
            ("患者急性胃肠炎", ["急性胃肠炎"]),
            ("诊断为肺炎", ["肺炎"]),
            ("胃炎待查", ["胃炎待查"]),  # uncertainty markers preserved
            ("肺炎 肺炎 肺炎", ["肺炎"]),  # dedup
            ("", []),
            ("炎", []),  # < 2 chars dropped
        ],
    )
    def test_split(self, text, expected):
        assert split_simple(text) == expected

    def test_facade_simple_mode(self):
        proc = DiagnosisTextProcessor(use_enhanced_processing=False)
        assert proc.get_processing_mode() == "simple"
        assert proc.extract_diagnoses("肺炎，心衰") == ["肺炎", "心衰"]
        assert proc.is_multi_diagnosis("肺炎，心衰")
        enhanced = proc.extract_diagnoses_enhanced("肺炎，心衰")
        assert [d["diagnosis_text"] for d in enhanced] == ["肺炎", "心衰"]


class TestRuleNER:
    def test_disease_extraction(self):
        ents = rule_ner().extract_medical_entities("急性胃肠炎，高血压病")
        diseases = [e["text"] for e in ents.get("disease", [])]
        assert any("胃肠炎" in d for d in diseases)
        assert any("高血压病" in d for d in diseases)

    def test_symptom_extraction(self):
        ents = rule_ner().extract_medical_entities("持续腹痛伴呕吐")
        texts = [e["text"] for v in ents.values() for e in v]
        assert any("痛" in t for t in texts)

    def test_stop_words_not_entities(self):
        ents = rule_ner().extract_medical_entities("待查，考虑")
        assert sum(len(v) for v in ents.values()) == 0

    def test_confidence_heuristic(self):
        ents = rule_ner().extract_medical_entities("急性阑尾炎")
        d = ents["disease"][0]
        # base .5 + len>=4 .1 + disease suffix .2 + 急性 prefix .1 = 0.9
        assert d["confidence"] == pytest.approx(0.9)

    def test_overlap_dedup_keeps_higher_confidence(self):
        ents = rule_ner().extract_medical_entities("慢性阻塞性肺疾病")
        diseases = ents.get("disease", [])
        # overlapping spans deduplicated
        spans = [(e["start"], e["end"]) for e in diseases]
        for i, a in enumerate(spans):
            for b in spans[i + 1:]:
                assert a[1] <= b[0] or b[1] <= a[0]

    def test_keywords_prefer_disease(self):
        kws = rule_ner().identify_diagnosis_keywords("急性胃肠炎伴腹痛")
        assert any("胃肠炎" in k for k in kws)

    def test_entity_summary_contract(self):
        summary = rule_ner().get_entity_summary("急性胃肠炎")
        assert set(summary) >= {
            "total_entities",
            "entity_types",
            "high_confidence_entities",
            "primary_diagnosis_candidates",
            "extraction_method",
            "model_info",
        }
        assert summary["extraction_method"] == "rules"


class TestEntityFilter:
    def make(self, **kw):
        return DiagnosisEntityFilter(FilterConfig(**kw))

    def test_strict_keeps_only_diagnosis_types(self):
        f = self.make(strict_mode=True)
        ents = {
            "disease": [{"text": "胃炎", "confidence": 0.9}],
            "drug": [{"text": "阿司匹林", "confidence": 0.9}],
            "department": [{"text": "内科", "confidence": 0.9}],
        }
        out = f.filter_entities(ents, "")
        assert "disease" in out and "drug" not in out and "department" not in out

    def test_strict_confidence_threshold(self):
        f = self.make(strict_mode=True, confidence_threshold=0.6)
        ents = {"disease": [{"text": "胃炎", "confidence": 0.5}]}
        assert f.filter_entities(ents, "") == {}

    def test_smart_drops_drug_names(self):
        f = self.make()
        text = "服用阿莫西林胶囊"
        ents = {
            "drug": [{"text": "阿莫西林胶囊", "confidence": 0.9, "start": 2, "end": 8}]
        }
        assert f.filter_entities(ents, text) == {}

    def test_smart_keeps_drug_related_disease_with_context(self):
        f = self.make()
        text = "青霉素过敏性休克"
        ents = {"drug": [{"text": "青霉素过敏", "confidence": 0.9, "start": 0, "end": 5}]}
        out = f.filter_entities(ents, text)
        assert "drug_related_disease" in out

    def test_smart_department_always_dropped(self):
        f = self.make()
        out = f.filter_entities(
            {"department": [{"text": "心内科", "confidence": 0.99}]}, ""
        )
        assert out == {}

    def test_lab_indicator_relaxed_threshold(self):
        f = self.make(confidence_threshold=0.6)
        ents = {"lab_indicator": [{"text": "血糖升高", "confidence": 0.55}]}
        out = f.filter_entities(ents, "")
        assert "lab_indicator" in out  # 0.55 >= min(0.5, 0.6)

    def test_treatment_kept_with_disease_suffix(self):
        f = self.make()
        ents = {"treatment": [{"text": "心衰竭", "confidence": 0.9, "start": 0, "end": 3}]}
        out = f.filter_entities(ents, "心衰竭")
        assert "treatment_related_disease" in out

    def test_pure_treatment_dropped(self):
        f = self.make(enable_context_analysis=False)
        ents = {"treatment": [{"text": "阑尾切除术", "confidence": 0.9, "start": 0, "end": 5}]}
        assert f.filter_entities(ents, "阑尾切除术") == {}

    def test_filter_stats(self):
        f = self.make()
        orig = {"disease": [{"text": "胃炎", "confidence": 0.9}],
                "department": [{"text": "内科", "confidence": 0.9}]}
        filt = f.filter_entities(orig, "")
        stats = f.get_filter_stats(orig, filt)
        assert stats["original_count"] == 2 and stats["filtered_count"] == 1


class TestBoundary:
    def test_semicolon_beats_comma(self):
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries("肺炎，咳嗽；心衰，水肿")
        assert [t for _, _, t in b] == ["肺炎，咳嗽", "心衰，水肿"]

    def test_comma_split(self):
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries("急性胃肠炎，高血压病")
        assert [t for _, _, t in b] == ["急性胃肠炎", "高血压病"]

    def test_connection_pattern_merges(self):
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries("冠心病，伴有合并心衰")
        assert len(b) == 1
        assert "冠心病" in b[0][2] and "心衰" in b[0][2]

    def test_single_text_one_boundary(self):
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries("急性胃肠炎")
        assert b == [(0, 5, "急性胃肠炎")]

    def test_confidence_components(self):
        det = SemanticBoundaryDetector()
        confs = det.get_boundary_confidence([(0, 8, "急性胃肠炎综合征")])
        # 0.5 + len>=4 + len>=8 + disease-term + independence = 1.0
        assert confs[0] == pytest.approx(1.0)

    def test_analyze_structure(self):
        det = SemanticBoundaryDetector()
        a = det.analyze_text_structure("肺炎；心衰")
        assert a["is_multi_diagnosis"] and a["total_boundaries"] == 2

    @pytest.mark.parametrize(
        "title",
        [
            # qualifier-clause commas merge back (ONE ICD code each)
            "肺结核,经组织学所证实",
            "霍乱,由于01群霍乱弧菌,霍乱生物型所致",
            "其他细菌性食物中毒,不可归类在他处者",
            "急性乙型肝炎,伴有δ因子(共同感染),并伴有肝昏迷",
            # delimiters inside （）/()/[] never split
            "继发性肺结核(初治,耐多药)涂阳培阳",
            "早发性阿尔茨海默病性痴呆(G30.0+)",
            "类风湿性肺病(J99.0*)",
            "迪格奥尔格综合征[Di George综合征]",
            # + after ASCII alphanumerics = immunophenotype, not a join
            "原发皮肤CD30+T细胞淋巴增殖性疾病",
            "ALK+大B细胞淋巴瘤",
        ],
    )
    def test_corpus_title_stays_whole(self, title):
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries(title)
        assert [t for _, _, t in b] == [title]

    def test_qualifier_merge_preserves_original_delimiters(self):
        # merged text must be the ORIGINAL slice (comma kept), not a
        # space-join — otherwise it can never exact-match a corpus title
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries("急性查加斯病,未累及心脏")
        assert [t for _, _, t in b] == ["急性查加斯病,未累及心脏"]

    def test_disease_tail_still_splits(self):
        # a tail with its own disease term is a separate diagnosis even
        # when it starts with a qualifier cue character
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries("急性胃肠炎，未特指的肝病")
        assert [t for _, _, t in b] == ["急性胃肠炎", "未特指的肝病"]

    def test_cjk_plus_still_splits(self):
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries("高血压病+2型糖尿病")
        assert [t for _, _, t in b] == ["高血压病", "2型糖尿病"]

    def test_symptom_tail_with_weak_prefix_still_splits(self):
        # 经常/目前/在/于 open ordinary symptom clauses, not only ICD
        # qualifier tails — the bare prefixes must not swallow a genuine
        # second segment (a real qualifier tail matches via its suffix:
        # 证实/所致/者/区域)
        det = SemanticBoundaryDetector()
        for q, parts in [
            ("高血压，经常头晕", ["高血压", "经常头晕"]),
            ("冠心病，目前咳嗽", ["冠心病", "目前咳嗽"]),
            ("肺结核,经组织学所证实", ["肺结核,经组织学所证实"]),
        ]:
            b = det.detect_diagnosis_boundaries(q)
            assert [t for _, _, t in b] == parts, q

    def test_unbalanced_open_bracket_does_not_suppress_splits(self):
        # a typo'd opener with no closer anywhere after it is inert —
        # depth would otherwise never return to 0 and every later comma
        # stops splitting, while the regex splitters DO split this text
        det = SemanticBoundaryDetector()
        b = det.detect_diagnosis_boundaries("左肺（上叶结节，高血压，2型糖尿病")
        assert [t for _, _, t in b] == ["左肺（上叶结节", "高血压", "2型糖尿病"]
        # balanced pairs keep suppressing
        b2 = det.detect_diagnosis_boundaries("左肺（上叶，结节），高血压")
        assert [t for _, _, t in b2] == ["左肺（上叶，结节）", "高血压"]


class TestEnhancedProcessor:
    @pytest.fixture()
    def proc(self):
        return EnhancedTextProcessor(encoder=None, ner_service=rule_ner())

    def test_multi_diagnosis_extraction(self, proc):
        results = proc.extract_diagnoses_enhanced("急性胃肠炎，高血压病3级，2型糖尿病")
        texts = [r["text"] for r in results]
        assert len(results) >= 3
        assert any("胃肠炎" in t for t in texts)
        assert any("高血压" in t for t in texts)
        assert any("糖尿病" in t for t in texts)
        for r in results:
            assert 0.4 <= r["diagnosis_confidence"] <= 1.0

    def test_simple_interface(self, proc):
        texts = proc.extract_diagnoses_simple("肺炎；心功能不全")
        assert len(texts) == 2

    @pytest.mark.parametrize(
        "title",
        [
            # single corpus titles whose internal 病/症/瘤 suffixes make the
            # greedy NER regex emit >1 disease entity; the contiguous-entity
            # grouping must keep them whole (enhanced.py sub-split divergence)
            "产后垂体功能不全综合征[席恩综合征]",
            "其他B细胞淋巴瘤[恶性免疫增生性疾病]",
            "分类于他处的疾病引起的皮肤角化病",
            "NK细胞淋巴母细胞性白血病/淋巴瘤伴缓解",
            "2型糖尿病性增殖性新生血管化性视网膜病",
        ],
    )
    def test_single_title_not_subsplit(self, proc, title):
        results = proc.extract_diagnoses_enhanced(title)
        texts = [r["text"] for r in results]
        assert texts == [title]

    def test_exact_title_bypass_never_splits(self, proc):
        # a verbatim known corpus title is that diagnosis by definition —
        # even when it holds commas the splitter would otherwise fire on
        title = "肺结核,经显微镜下痰检查证实,伴有或不伴有痰培养"
        proc.set_known_titles([title, "急性胃肠炎"])
        results = proc.extract_diagnoses_enhanced(title)
        assert [r["text"] for r in results] == [title]

    def test_exact_title_bypass_exempts_length_cap(self, proc):
        title = "伴" * 60  # longer than the 50-char max_diagnosis_length
        proc.set_known_titles([title])
        results = proc.extract_diagnoses_enhanced(title)
        assert [r["text"] for r in results] == [title]

    def test_facade_exact_title_bypass_simple_mode(self):
        title = "肺结核,经组织学所证实"
        proc = DiagnosisTextProcessor(
            use_enhanced_processing=False, known_titles=[title]
        )
        assert proc.extract_diagnoses(title) == [title]
        out = proc.extract_diagnoses_enhanced(title)
        assert [d["diagnosis_text"] for d in out] == [title]
        # non-title input still splits
        assert len(proc.extract_diagnoses("肺炎；心衰")) == 2

    def test_separated_entities_still_subsplit(self, proc):
        # whitespace between entities = real boundary even without ，/；
        results = proc.extract_diagnoses_enhanced("慢性肾功能不全 高血压病3级 糖尿病")
        texts = [r["text"] for r in results]
        assert any("高血压" in t for t in texts)
        assert any(t == "糖尿病" or "糖尿病" in t for t in texts)
        assert len(texts) >= 2

    def test_jaccard_dedup(self):
        assert char_jaccard("急性胃肠炎", "急性胃肠炎") == 1.0
        assert char_jaccard("abc", "xyz") == 0.0

    def test_processing_summary(self, proc):
        s = proc.get_processing_summary("急性胃肠炎，高血压病")
        assert s["total_diagnoses"] >= 2
        assert s["processing_method"] == "simple"  # no encoder

    def test_facade_enhanced_mode(self):
        proc = DiagnosisTextProcessor(
            use_enhanced_processing=True, ner_service=rule_ner()
        )
        assert proc.get_processing_mode() == "enhanced"
        out = proc.extract_diagnoses("急性胃肠炎，高血压病")
        assert len(out) >= 2


class TestFullCorpusTitleRetrievability:
    """Every verbatim corpus title must survive extraction as itself —
    the invariant behind the exact-tier eval sampling ALL titles. The
    round-4 waves fixed separator-bearing titles (3,902) and the
    confidence-filter drop of single-char titles (痔/疣/痈/疖/痣/僵)."""

    def test_every_title_extracts_to_itself(self, real_csv_path):
        from rag_icd10_tpu.config import NERConfig
        from rag_icd10_tpu.data.corpus import ICDCorpus
        from rag_icd10_tpu.pipeline.ner import MedicalNERService
        from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor

        corpus = ICDCorpus.from_csv(real_csv_path)
        ner = MedicalNERService(NERConfig(use_model=False))
        tp = DiagnosisTextProcessor(
            use_enhanced_processing=True, ner_service=ner,
            known_titles=corpus.titles,
        )
        bad = []
        for t in corpus.titles:
            out = tp.extract_diagnoses_enhanced(t)
            texts = [d.get("diagnosis_text", d.get("text", "")) for d in out]
            if texts != [t]:
                bad.append((t, texts))
        assert not bad, bad[:10]

    def test_single_char_title_confidence_floor(self):
        from rag_icd10_tpu.config import NERConfig
        from rag_icd10_tpu.pipeline.enhanced import EnhancedTextProcessor
        from rag_icd10_tpu.pipeline.ner import MedicalNERService

        ner = MedicalNERService(NERConfig(use_model=False))
        ep = EnhancedTextProcessor(
            ner_service=ner, known_titles=frozenset({"痔"})
        )
        out = ep.extract_diagnoses_enhanced("痔")
        assert [d["text"] for d in out] == ["痔"]
        assert out[0]["diagnosis_confidence"] >= 0.75
        # non-title single chars stay filtered
        assert ep.extract_diagnoses_enhanced("和") == []


class TestMarkerAwareEncoding:
    """clean_for_encoding peels uncertainty markers as AFFIXES with the
    title set consulted at every step — verbatim titles (incl. the 115
    that intrinsically contain marker words) encode untouched and
    marker-wrapped titles peel down to exactly the title."""

    TITLES = frozenset({
        "原发性血栓形成倾向", "原因不明的小肾", "经表皮排除疾患",
        "不明原因抽搐", "肺结核,经组织学所证实", "霍乱",
    })

    def test_intrinsic_marker_titles_untouched(self):
        from rag_icd10_tpu.pipeline.uncertainty import clean_for_encoding

        for t in self.TITLES:
            assert clean_for_encoding(t, self.TITLES) == t

    def test_wrapped_titles_peel_to_title(self):
        from rag_icd10_tpu.pipeline.uncertainty import clean_for_encoding

        cases = {
            "疑似原发性血栓形成倾向": "原发性血栓形成倾向",
            "原因不明的小肾待查": "原因不明的小肾",
            "不排除霍乱": "霍乱",  # reference substring strip gives 不霍乱
            "不明原因抽搐待查": "不明原因抽搐",  # needs suffix-first search
            "疑似肺结核,经组织学所证实可能": "肺结核,经组织学所证实",
            "排除经表皮排除疾患": "经表皮排除疾患",
        }
        for q, want in cases.items():
            assert clean_for_encoding(q, self.TITLES) == want, q

    def test_non_title_still_strips(self):
        from rag_icd10_tpu.pipeline.uncertainty import clean_for_encoding

        assert clean_for_encoding("疑似急性心肌梗死", self.TITLES) == "急性心肌梗死"
        assert clean_for_encoding("急性心梗待查", None) == "急性心梗"
        assert clean_for_encoding("急性阑尾炎", self.TITLES) == "急性阑尾炎"

    def test_marked_titles_extract_whole(self, real_csv_path):
        """Two marker shapes x full corpus: extraction must return ONE
        fragment whose encoding text is exactly the title (the round-4
        gap: marker-wrapped separator-bearing titles lost the bypass and
        got chopped at the title's own commas)."""
        from rag_icd10_tpu.config import NERConfig
        from rag_icd10_tpu.data.corpus import ICDCorpus
        from rag_icd10_tpu.pipeline.ner import MedicalNERService
        from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor
        from rag_icd10_tpu.pipeline.uncertainty import clean_for_encoding

        corpus = ICDCorpus.from_csv(real_csv_path)
        titles = frozenset(t.strip() for t in corpus.titles)
        ner = MedicalNERService(NERConfig(use_model=False))
        tp = DiagnosisTextProcessor(
            use_enhanced_processing=True, ner_service=ner,
            known_titles=corpus.titles,
        )
        bad = []
        for tpl in ("疑似{t}", "{t}待查"):
            for t in corpus.titles:
                out = tp.extract_diagnoses_enhanced(tpl.format(t=t))
                texts = [d.get("diagnosis_text", d.get("text", ""))
                         for d in out]
                if (len(texts) != 1
                        or clean_for_encoding(texts[0], titles).strip()
                        != t.strip()):
                    bad.append((tpl, t, texts))
        assert not bad, bad[:10]


class TestCompoundTitleExtraction:
    """Compounds of verbatim titles must extract to exactly their members
    (sampled sweep: 0/15,000 failures across ，/； and 3-member forms)."""

    def _proc(self, titles):
        from rag_icd10_tpu.config import NERConfig
        from rag_icd10_tpu.pipeline.ner import MedicalNERService
        from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor

        ner = MedicalNERService(NERConfig(use_model=False))
        return DiagnosisTextProcessor(
            use_enhanced_processing=True, ner_service=ner,
            known_titles=titles,
        )

    def _texts(self, tp, q):
        return [d.get("diagnosis_text", d.get("text", ""))
                for d in tp.extract_diagnoses_enhanced(q)]

    def test_one_char_title_as_compound_member(self):
        tp = self._proc(["岩骨脑膜瘤", "痔", "N"])
        assert sorted(self._texts(tp, "岩骨脑膜瘤；痔")) == ["岩骨脑膜瘤", "痔"]
        assert sorted(self._texts(tp, "岩骨脑膜瘤；N")) == ["N", "岩骨脑膜瘤"]

    def test_connective_bearing_title_not_subsplit_in_compound(self):
        t1 = "高血压心脏和肾脏病伴有(充血性)心力衰竭"
        tp = self._proc([t1, "绦虫病"])
        assert sorted(self._texts(tp, t1 + "，绦虫病")) == sorted([t1, "绦虫病"])

    def test_distinct_titles_survive_jaccard_dedup(self):
        a, b = "心功能III级(NYHA分级)", "心功能Ⅱ级(NYHA分级)"
        tp = self._proc([a, b])
        assert sorted(self._texts(tp, a + "；" + b)) == sorted([a, b])

    def test_non_title_near_duplicates_still_dedup(self):
        tp = self._proc(["某某无关"])
        out = self._texts(tp, "急性上呼吸道感染，急性上呼吸道的感染")
        assert len(out) == 1
