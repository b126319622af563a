"""Encoder training tool tests (pure-python pieces + tiny train sanity)."""

import numpy as np
import pytest

from rag_icd10_tpu.data.corpus import ICDCorpus
from rag_icd10_tpu.tools.train_encoder import make_pairs


class TestMakePairs:
    def test_title_semantic_and_hierarchy_pairs(self):
        corpus = ICDCorpus.from_rows(
            [
                {"code": "A00", "disease": "霍乱"},
                {"code": "A00.0", "disease": "古典霍乱"},
                {"code": "A00.001", "disease": "某种霍乱"},
            ]
        )
        pairs = make_pairs(corpus)
        # 3 title<->semantic + 2 child<->parent
        assert ("霍乱", "霍乱 | ICD-10: A00") in pairs
        assert ("古典霍乱", "霍乱") in pairs  # child -> parent title
        # A00.001's parent is A00.0
        assert ("某种霍乱", "古典霍乱") in pairs
        assert len(pairs) == 5

    def test_no_self_pairs_for_duplicate_titles(self):
        corpus = ICDCorpus.from_rows(
            [
                {"code": "B00", "disease": "同名"},
                {"code": "B00.1", "disease": "同名"},
            ]
        )
        pairs = make_pairs(corpus)
        assert ("同名", "同名") not in pairs


class TestDocsEndpointSpec:
    def test_openapi_spec_shape(self):
        from rag_icd10_tpu.api.docs import docs_html, openapi_spec

        spec = openapi_spec()
        assert spec["openapi"].startswith("3.")
        assert "/query" in spec["paths"]
        assert "post" in spec["paths"]["/query"]
        assert "QueryRequest" in spec["components"]["schemas"]
        # nested models hoisted
        assert "Candidate" in spec["components"]["schemas"]
        html = docs_html()
        assert "/standardize" in html and "text/html"
