"""API endpoint tests over a real aiohttp server with a mock encoder.

Contract assertions mirror the reference's documented request/response
pairs (reference: CLAUDE.md:76-99, README.md:135-153).
"""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from rag_icd10_tpu.api.app import APIServer
from rag_icd10_tpu.config import Config, NERConfig, StoreConfig
from rag_icd10_tpu.data.corpus import ICDCorpus
from rag_icd10_tpu.index import VectorStore
from rag_icd10_tpu.pipeline.ner import MedicalNERService
from rag_icd10_tpu.pipeline.orchestrator import MultiDiagnosisService
from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor
from rag_icd10_tpu.runtime import Engine

from test_orchestrator import CORPUS_ROWS, MockEncoder


class MockLLM:
    provider = "deepseek"

    def standardize_diagnosis(self, text, candidates, provider=None):
        if not candidates:
            return []
        best = candidates[0]
        return [{
            "diagnosis": text, "code": best["code"], "title": best["title"],
            "confidence": min(best["score"], 0.95),
        }]

    def switch_provider(self, p):
        if p in ("deepseek", "openai", "local"):
            self.provider = p
            return True
        return False

    def test_connection(self):
        return {"connected": False, "provider": self.provider, "error": "no network",
                "error_type": "unknown", "duration": 0.0}

    def get_provider_info(self):
        return {"current_provider": self.provider, "model": "mock",
                "base_url": "", "max_tokens": 2048, "temperature": 0.1,
                "available_providers": ["deepseek", "openai", "local"]}

    def close(self):
        pass


def make_engine() -> Engine:
    corpus = ICDCorpus.from_rows(CORPUS_ROWS)
    enc = MockEncoder()
    vecs = enc.encode_queries(corpus.semantic_texts)
    store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
    store.insert_records(list(corpus.records()), vecs)
    ner = MedicalNERService(NERConfig(use_model=False))
    engine = Engine.__new__(Engine)
    engine.config = Config()
    engine.encoder = enc
    engine.store = store
    engine.llm = MockLLM()
    engine.ner = ner
    engine.matcher = MultiDiagnosisService(
        encoder=enc, store=store, ner_service=ner,
        text_processor=DiagnosisTextProcessor(
            use_enhanced_processing=True, ner_service=ner),
    )
    engine.started_at = 0.0
    engine.llm_status = {}

    def _noop_startup(test_llm=False):
        pass

    engine.startup = _noop_startup
    engine.shutdown = lambda: None
    return engine


@pytest.fixture()
def client():
    async def _make():
        server = APIServer(config=Config(), engine=make_engine())
        tc = TestClient(TestServer(server.app))
        await tc.start_server()
        return tc

    loop = asyncio.new_event_loop()
    tc = loop.run_until_complete(_make())
    yield tc, loop
    loop.run_until_complete(tc.close())
    loop.close()


def post(client, path, payload):
    tc, loop = client

    async def _do():
        resp = await tc.post(path, json=payload)
        return resp.status, await resp.json()

    return loop.run_until_complete(_do())


def get(client, path):
    tc, loop = client

    async def _do():
        resp = await tc.get(path)
        return resp.status, await resp.json()

    return loop.run_until_complete(_do())


class TestEndpoints:
    def test_root(self, client):
        status, j = get(client, "/")
        assert status == 200 and "ICD-10" in j["message"]

    def test_health(self, client):
        status, j = get(client, "/health")
        assert status == 200
        assert j["status"] == "healthy"
        assert j["milvus_connected"] and j["embedding_model_loaded"]
        assert j["total_records"] == len(CORPUS_ROWS)

    def test_query_contract(self, client):
        status, j = post(client, "/query", {"text": "急性胃肠炎，高血压病3级", "top_k": 3})
        assert status == 200
        assert set(j) >= {
            "candidates", "is_multi_diagnosis", "extracted_diagnoses",
            "diagnosis_matches", "processing_metadata",
        }
        assert j["is_multi_diagnosis"] is True
        assert len(j["extracted_diagnoses"]) == 2
        assert len(j["candidates"]) <= 3
        m = j["diagnosis_matches"][0]
        assert {"diagnosis_text", "candidates", "match_confidence"} <= set(m)
        c = m["candidates"][0]
        assert {"code", "title", "score", "level"} <= set(c)
        # scores may exceed 1.0 (enhanced, SURVEY §2.5#5)
        assert 0.0 <= m["match_confidence"] <= 1.0

    def test_query_ignores_unknown_fields(self, client):
        """Reference leniency quirk (SURVEY §2.5#6): the reference's own
        UI sends extra fields like enhanced_processing that the server
        silently ignores (reference ui/api_client.py:119-123) — unknown
        fields must be accepted, not 400'd."""
        status, j = post(client, "/query", {
            "text": "急性胃肠炎", "top_k": 3,
            "enhanced_processing": True, "not_a_real_field": 1,
        })
        assert status == 200
        assert "candidates" in j

    def test_query_validation(self, client):
        status, j = post(client, "/query", {"text": "", "top_k": 3})
        assert status == 400
        status, _ = post(client, "/query", {"text": "x", "top_k": 999})
        assert status == 400
        status, _ = post(client, "/query", {"top_k": 3})
        assert status == 400

    def test_embed(self, client):
        status, j = post(client, "/embed", {"texts": ["急性胃肠炎", "高血压"]})
        assert status == 200
        assert len(j["embeddings"]) == 2 and len(j["embeddings"][0]) == 64
        assert "model" in j

    def test_entities(self, client):
        status, j = post(client, "/entities", {"text": "急性胃肠炎伴腹痛", "filter_drugs": True})
        assert status == 200
        assert "entities" in j and "total_entities" in j
        assert j["extraction_method"] == "rules"

    def test_entities_empty_text(self, client):
        status, _ = post(client, "/entities", {"text": ""})
        assert status == 400

    def test_standardize_fallback(self, client):
        status, j = post(
            client, "/standardize",
            {"text": "急性胃肠炎", "top_k": 5, "llm_provider": "deepseek"},
        )
        assert status == 200
        assert j["results"]
        r = j["results"][0]
        assert r["is_multi_diagnosis"] is False
        assert r["standardized_results"][0]["confidence"] <= 0.95

    def test_standardize_multi(self, client):
        status, j = post(
            client, "/standardize",
            {"text": "急性胃肠炎，高血压病3级", "top_k": 5, "llm_provider": "deepseek"},
        )
        assert status == 200
        r = j["results"][0]
        assert r["is_multi_diagnosis"] is True
        assert len(r["standardization_groups"]) == 2

    def test_standardize_bad_provider(self, client):
        status, _ = post(
            client, "/standardize", {"text": "x", "llm_provider": "gemini"}
        )
        assert status == 400

    def test_stats(self, client):
        status, j = get(client, "/stats")
        assert status == 200
        assert {"milvus", "embedding", "llm", "batching"} <= set(j)

    def test_llm_switch_and_test(self, client):
        tc, loop = client

        async def _do():
            resp = await tc.post("/llm/switch?provider=openai")
            return resp.status, await resp.json()

        status, j = loop.run_until_complete(_do())
        assert status == 200 and j["current_provider"] == "openai"
        status, j = get(client, "/llm/test")
        assert status == 200 and j["connected"] is False

    def test_resource_lifecycle(self, client):
        status, j = get(client, "/resource/status")
        assert status == 200
        assert {"milvus", "embedding", "llm", "multi_diagnosis"} <= set(j)
        status, j = post(client, "/resource/release", {})
        assert status == 200 and j["status"] == "success"
        status, j = post(client, "/resource/reload", {})
        assert status == 200 and j["load_state"]["loaded"]

    def test_concurrent_queries_coalesce(self, client):
        tc, loop = client

        async def _do():
            tasks = [
                tc.post("/query", json={"text": f"肺炎", "top_k": 2})
                for _ in range(8)
            ]
            resps = await asyncio.gather(*tasks)
            return [await r.json() for r in resps]

        results = loop.run_until_complete(_do())
        assert all(r["diagnosis_matches"] for r in results)


class TestSearchKnobs:
    """Per-request index knobs through the API (the reference exposes
    these only via Milvus config, README_MILVUS_CONFIG.md)."""

    def test_ef_sweep_via_api(self, client):
        baseline = post(client, "/query", {"text": "急性胃肠炎", "top_k": 3})[1]
        for ef in (16, 64, 256):
            status, j = post(client, "/query", {
                "text": "急性胃肠炎", "top_k": 3,
                "search_method": "hnsw", "ef_search": ef,
            })
            assert status == 200, j
            assert j["candidates"], f"no candidates at ef={ef}"
        # high-ef graph results agree with the default exact path
        codes_exact = [c["code"] for c in baseline["candidates"]]
        codes_graph = [c["code"] for c in j["candidates"]]
        assert codes_graph == codes_exact

    def test_fast_method_via_api(self, client):
        """search_method=fast (certified chunk-select) returns the same
        candidates as the default exact path."""
        baseline = post(client, "/query", {"text": "急性胃肠炎", "top_k": 3})[1]
        status, j = post(client, "/query", {
            "text": "急性胃肠炎", "top_k": 3, "search_method": "fast"})
        assert status == 200, j
        assert [c["code"] for c in j["candidates"]] == [
            c["code"] for c in baseline["candidates"]
        ]

    def test_sketch_method_via_api(self, client):
        """search_method=sketch (beyond-HBM capacity tier screen,
        ops/sketch.py) serves through /query and agrees with the exact
        path on this tiny corpus."""
        baseline = post(client, "/query", {"text": "急性胃肠炎", "top_k": 3})[1]
        status, j = post(client, "/query", {
            "text": "急性胃肠炎", "top_k": 3, "search_method": "sketch"})
        assert status == 200, j
        assert [c["code"] for c in j["candidates"]] == [
            c["code"] for c in baseline["candidates"]
        ]

    def test_invalid_method_rejected(self, client):
        status, j = post(client, "/query", {
            "text": "急性胃肠炎", "search_method": "bogus"})
        assert status == 400

    def test_invalid_ef_rejected(self, client):
        status, _ = post(client, "/query", {
            "text": "急性胃肠炎", "ef_search": 0})
        assert status == 400

    def test_stats_mirror_index_params(self, client):
        status, j = get(client, "/stats")
        assert status == 200
        assert "index_params" in j["milvus"]
        assert set(j["milvus"]["index_params"]) == {
            "M", "ef_construction", "ef_search"}
        assert "queue_depth" in j["batching"]
