"""UI smoke tests without a browser (none in this image — VERDICT/verify
notes): parse the served HTML and mechanically bind the page script to
(a) the DOM it manipulates and (b) the response fields it renders,
using the same golden fixtures the API contract tests pin.

This catches the drift class a browser test would: a renamed element id,
a tab without its container, or the script reading a response field the
API no longer returns.
"""

import json
import re
import threading
import urllib.request
from http.server import HTTPServer
from pathlib import Path

import pytest

from ui_stub_server import Handler

ROOT = Path(__file__).parent.parent
HTML = (ROOT / "rag_icd10_tpu" / "api" / "static" / "index.html").read_text(
    encoding="utf-8"
)
GOLDEN = ROOT / "tests" / "golden"


def fixture(name):
    return json.loads((GOLDEN / f"{name}.json").read_text(encoding="utf-8"))


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


class TestDomScriptBinding:
    def test_every_scripted_id_exists(self):
        """Each $("...")/getElementById target and each oninput target id
        must exist as an element id in the markup."""
        ids_in_dom = set(re.findall(r'id="([^"]+)"', HTML))
        used = set(re.findall(r'\$\("([A-Za-z][\w-]*)"\)', HTML))
        used |= set(re.findall(r'getElementById\("([\w-]+)"\)', HTML))
        # dynamic tab ids: "tab-" + data-tab
        for tab in re.findall(r'data-tab="([\w-]+)"', HTML):
            used.add(f"tab-{tab}")
        missing = {u for u in used if u not in ids_in_dom}
        assert not missing, f"script references missing ids: {missing}"

    def test_three_tabs_with_examples(self):
        assert HTML.count('data-tab="') == 3
        for container in ("qExamples", "sExamples", "eExamples"):
            assert f'id="{container}"' in HTML
        # the reference's canned examples are embedded verbatim
        assert "急性心肌梗死伴左心室功能不全" in HTML  # entities example
        assert "疑似埃尔托霍乱爆发" in HTML  # standardize example
        assert "蛋白尿待查 肾功能不全" in HTML  # query example

    def test_badge_semantics_match_reference(self):
        """ui/utils.py:235-252: >1.0 层级加权, >0.8 高相似度,
        >0.6 中等相似度, else 低相似度."""
        assert "层级加权" in HTML
        assert "高相似度" in HTML and "中等相似度" in HTML and "低相似度" in HTML
        assert "s > 1.0" in HTML and "s > 0.8" in HTML and "s > 0.6" in HTML

    def _script_fields(self, var):
        """All `<var>.field` accesses in the page script."""
        return set(re.findall(rf"\b{var}\.(\w+)", HTML))

    def test_query_fields_exist_in_fixture(self):
        fx = fixture("query_multi")
        for f in ("is_multi_diagnosis", "extracted_diagnoses",
                  "diagnosis_matches"):
            assert f in fx, f
        m = fx["diagnosis_matches"][0]
        for f in self._script_fields("m") & {
            "diagnosis_text", "match_confidence", "confidence_level",
            "candidates",
        }:
            assert f in m, f
        c = m["candidates"][0]
        for f in ("code", "title", "score", "level", "parent_code"):
            assert f in c, f

    def test_factor_breakdown_keys_match_fixture(self):
        """The per-candidate similarity-factor breakdown and the 12-dim
        detailed confidence report render exactly the keys the API
        returns (golden fixtures pin the API side)."""
        fx = fixture("query_multi")
        m = fx["diagnosis_matches"][0]
        sim_keys = set(
            re.findall(r'\["(\w+)", "[^"]+", \d+\],\n', HTML.split("CONF_FACTORS")[0])
        )
        assert sim_keys == set(m["candidates"][0]["similarity_factors"]), (
            "SIM_FACTORS drifted from the API's similarity_factors keys"
        )
        conf_keys = set(
            re.findall(r'\["(\w+)", "[^"]+", \d+\],\n', HTML.split("CONF_FACTORS")[1])
        )
        assert conf_keys == set(m["confidence_factors"]), (
            "CONF_FACTORS drifted from the API's confidence_factors keys"
        )
        for metric in ("overall_confidence", "confidence_interval",
                       "reliability_score", "prediction_variance",
                       "calibration_score"):
            assert metric in m["confidence_metrics"], metric
            assert metric in HTML, f"report view never renders {metric}"
        assert "详细置信度报告" in HTML
        # factor weights rendered = the reference's contracts (.50/.20/...
        # hierarchical_similarity_service.py:76-83; .20/.15/... :97-117)
        assert '["vector_similarity", "向量相似度", 50]' in HTML
        assert '["vector_similarity", "向量相似度", 20]' in HTML

    def test_standardize_fields_exist_in_fixture(self):
        fx = fixture("standardize_multi")
        r = fx["results"][0]
        assert "is_multi_diagnosis" in r
        if r["is_multi_diagnosis"]:
            g = r["standardization_groups"][0]
            assert {"diagnosis_text", "standardized_results"} <= set(g)
            x = g["standardized_results"][0]
        else:
            x = r["standardized_results"][0]
        for f in ("diagnosis", "code", "title", "confidence"):
            assert f in x, f

    def test_entities_fields_exist_in_fixture(self):
        fx = fixture("entities")
        assert {"entities", "total_entities", "extraction_method"} <= set(fx)
        for etype, items in fx["entities"].items():
            for e in items:
                assert {"text", "confidence"} <= set(e)


class TestServedUI:
    def _get(self, url):
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.read().decode("utf-8")

    def _post(self, url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())

    def test_ui_page_served(self, server):
        status, body = self._get(server + "/ui")
        assert status == 200 and "ICD-10" in body
        assert "<script>" in body

    def test_fetch_paths_round_trip(self, server):
        """The exact fetch paths the script issues, end to end against
        reference-shaped payloads."""
        status, j = self._post(
            server + "/query", {"text": "急性胃肠炎，高血压病3级", "top_k": 3})
        assert status == 200 and j["is_multi_diagnosis"] is True
        status, j = self._post(
            server + "/standardize",
            {"text": "x", "top_k": 5, "llm_provider": "deepseek"})
        assert status == 200 and j["results"]
        status, j = self._post(
            server + "/entities", {"text": "x", "filter_drugs": True})
        assert status == 200 and "entities" in j
        status, body = self._get(server + "/health")
        assert status == 200 and json.loads(body)["status"] == "healthy"
