"""Remote store-server mode (STORE_MODE=remote): a second host's pipeline
runs against a peer API server's device-resident corpus.

Reference parity target: MILVUS_MODE=server connects the reference to a
remote Milvus over gRPC (services/milvus_service.py:57-118); here the
API server IS the store server (/vector_search, /semantic_similarities).
"""

import asyncio
import socket
import threading

import numpy as np
import pytest

from rag_icd10_tpu.api.app import APIServer
from rag_icd10_tpu.config import Config
from rag_icd10_tpu.index.remote_store import (
    RemoteStoreError,
    RemoteVectorStore,
)

from test_api import make_engine


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    """Real aiohttp server in a background thread (the remote client is
    synchronous httpx — it needs an actual socket, not a TestClient)."""
    engine = make_engine()
    port = _free_port()
    loop = asyncio.new_event_loop()
    started = threading.Event()
    runner_box = {}

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            from aiohttp import web

            api = APIServer(config=Config(), engine=engine)
            runner = web.AppRunner(api.app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", port)
            await site.start()
            # the batcher normally starts on app startup signals; the
            # bare runner path needs it explicit for /query parity tests
            from rag_icd10_tpu.api.batching import RequestBatcher

            api.batcher = RequestBatcher(engine.matcher.match_many_texts)
            api.batcher.start()
            runner_box["runner"] = runner
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(30)
    yield f"http://127.0.0.1:{port}", engine
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=10)


class TestRemoteVectorStore:
    def test_search_parity_with_local(self, server):
        url, engine = server
        remote = RemoteVectorStore(url, corpus=engine.store.corpus)
        q = engine.encoder.encode_queries(["急性胃肠炎", "高血压病3级"])
        local_rows = engine.store.search(q, top_k=5)
        remote_rows = remote.search(q, top_k=5)
        assert len(remote_rows) == len(local_rows)
        for a, b in zip(local_rows, remote_rows):
            assert [h.id for h in a] == [h.id for h in b]
            assert [h.code for h in a] == [h.code for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-6
            )
        remote.close()

    def test_semantic_similarities_parity(self, server):
        url, engine = server
        remote = RemoteVectorStore(url)
        q = engine.encoder.encode_queries(["急性胃肠炎"])
        ids = np.array([[0, 1, 2]])
        local = engine.store.semantic_similarities(q, ids)
        got = remote.semantic_similarities(q, ids)
        np.testing.assert_allclose(got, local, rtol=1e-6)
        remote.close()

    def test_health_stats_and_readonly(self, server):
        url, engine = server
        remote = RemoteVectorStore(url)
        assert remote.test_connection()
        assert remote.num_entities == engine.store.num_entities
        stats = remote.get_collection_stats()
        assert stats["mode"] == "remote"
        assert stats["num_entities"] == engine.store.num_entities
        with pytest.raises(RemoteStoreError, match="read-only"):
            remote.insert_records([], np.zeros((0, 64), np.float32))
        remote.close()

    def test_full_pipeline_over_remote_store(self, server):
        """A second host's matcher (local encoder + REMOTE store) must
        produce the same top candidates as the serving host's."""
        url, engine = server
        from rag_icd10_tpu.pipeline.ner import MedicalNERService
        from rag_icd10_tpu.pipeline.orchestrator import MultiDiagnosisService
        from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor
        from rag_icd10_tpu.config import NERConfig

        remote = RemoteVectorStore(url, corpus=engine.store.corpus)
        ner = MedicalNERService(NERConfig(use_model=False))
        matcher = MultiDiagnosisService(
            encoder=engine.encoder, store=remote, ner_service=ner,
            text_processor=DiagnosisTextProcessor(
                use_enhanced_processing=True, ner_service=ner
            ),
        )
        text = "急性胃肠炎，高血压病3级"
        got = matcher.match_multiple_diagnoses(text, top_k=3)
        want = engine.matcher.match_multiple_diagnoses(text, top_k=3)
        assert got["extracted_diagnoses"] == want["extracted_diagnoses"]
        for ma, mb in zip(want["matches"], got["matches"]):
            assert [c.code for c in ma.candidates] == [
                c.code for c in mb.candidates
            ]
        remote.close()

    def test_bad_requests_400(self, server):
        url, _ = server
        import httpx

        r = httpx.post(f"{url}/vector_search", json={"top_k": 5})
        assert r.status_code == 400
        r = httpx.post(
            f"{url}/vector_search",
            json={"vectors": [[0.0] * 64], "top_k": 9999},
        )
        assert r.status_code == 400
