"""Corpus ingestion + hierarchy parsing tests.

Golden values from SURVEY.md §2.3 / reference tools/build_database.py.
"""

import numpy as np
import pytest

from rag_icd10_tpu.data.corpus import (
    ICDCorpus,
    build_semantic_text,
    load_corpus,
    parse_hierarchy,
    split_combo_code,
    synthetic_corpus,
)


class TestParseHierarchy:
    def test_level1(self):
        assert parse_hierarchy("A00", {}) == (1, "", "A00")

    def test_level2(self):
        assert parse_hierarchy("A00.0", {}) == (2, "A00", "A00 > A00.0")

    def test_level3_long_fraction_parent_is_subcategory(self):
        # >=3 chars after the dot -> parent is X.d
        assert parse_hierarchy("A00.001", {}) == (
            3,
            "A00.0",
            "A00 > A00.0 > A00.001",
        )

    def test_level3_two_char_fraction_parent_is_chapter(self):
        assert parse_hierarchy("A00.01", {}) == (3, "A00", "A00 > A00.01")

    def test_level2_boundary_single_char(self):
        lvl, parent, path = parse_hierarchy("K52.9", {})
        assert lvl == 2 and parent == "K52"


class TestComboCodes:
    def test_combo(self):
        assert split_combo_code("A01.1+B02*") == ("A01.1", "B02", True)

    def test_plain(self):
        assert split_combo_code("A01.1") == ("A01.1", "", False)

    def test_star_without_plus(self):
        assert split_combo_code("B02*") == ("B02*", "", False)


class TestSemanticText:
    def test_with_ancestors(self):
        parents = {"A00": "霍乱", "A00.0": "古典生物型霍乱"}
        text = build_semantic_text(
            "A00.001", "某病", "A00 > A00.0 > A00.001", parents
        )
        assert text == "某病 | 霍乱 | 古典生物型霍乱 | ICD-10: A00.001"

    def test_dedup_ancestor_same_title(self):
        parents = {"A00": "某病"}
        text = build_semantic_text("A00.1", "某病", "A00 > A00.1", parents)
        assert text == "某病 | ICD-10: A00.1"


class TestCorpusIngest:
    def test_from_rows_filters_invalid(self):
        rows = [
            {"code": "A00", "disease": "霍乱"},
            {"code": "", "disease": "x"},
            {"code": "B00", "disease": ""},
            {"code": "nan", "disease": "y"},
            {"code": "C00", "disease": "nan"},
        ]
        corpus = ICDCorpus.from_rows(rows)
        assert len(corpus) == 1
        assert corpus.codes == ["A00"]

    def test_level_weights(self):
        rows = [
            {"code": "A00", "disease": "a"},
            {"code": "A00.0", "disease": "b"},
            {"code": "A00.001", "disease": "c"},
        ]
        corpus = ICDCorpus.from_rows(rows)
        np.testing.assert_allclose(
            corpus.level_weights(), np.array([1.2, 1.0, 0.8], dtype=np.float32)
        )

    def test_json_roundtrip(self, tmp_path):
        corpus = synthetic_corpus(64)
        p = tmp_path / "meta.json"
        corpus.to_json(str(p))
        back = ICDCorpus.from_json(str(p))
        assert back.codes == corpus.codes
        assert back.semantic_texts == corpus.semantic_texts
        np.testing.assert_array_equal(back.levels, corpus.levels)

    def test_synthetic_deterministic(self):
        a, b = synthetic_corpus(128, seed=7), synthetic_corpus(128, seed=7)
        assert a.codes == b.codes and a.titles == b.titles


class TestGoldenStats:
    """Stats the reference corpus must reproduce (SURVEY.md §2.3)."""

    def test_reference_corpus_stats(self, real_csv_path):
        corpus = ICDCorpus.from_csv(real_csv_path)
        stats = corpus.hierarchy_stats()
        assert stats["total"] == 40474
        assert stats["level1"] == 5031
        assert stats["level2"] == 12106
        assert stats["level3"] == 23337
        assert stats["combo"] == 1000

    def test_reference_semantic_text_first_level3(self, real_csv_path):
        corpus = ICDCorpus.from_csv(real_csv_path)
        idx = corpus.code_to_idx["A00.001"]
        st = corpus.semantic_texts[idx]
        assert st.startswith("古典生物型霍乱 | 霍乱 | ")
        assert st.endswith("ICD-10: A00.001")
