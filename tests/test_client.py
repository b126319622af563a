"""Python API client tests against an in-process server."""

import asyncio

import pytest
from aiohttp.test_utils import TestServer

from rag_icd10_tpu.api.app import APIServer
from rag_icd10_tpu.client import APIClient, APIClientError
from rag_icd10_tpu.config import Config

from test_api import make_engine


@pytest.fixture()
def live_server():
    loop = asyncio.new_event_loop()

    async def _start():
        server = APIServer(config=Config(), engine=make_engine())
        ts = TestServer(server.app)
        await ts.start_server()
        return ts

    ts = loop.run_until_complete(_start())
    yield f"http://{ts.host}:{ts.port}", loop, ts
    loop.run_until_complete(ts.close())
    loop.close()


class TestClient:
    def test_health_and_query(self, live_server):
        url, loop, _ = live_server

        def run():
            client = APIClient(base_url=url)
            health = client.check_health()
            assert health["status"] == "healthy"
            result = client.query_diagnosis("急性胃肠炎，高血压", top_k=3)
            assert result["is_multi_diagnosis"] is True
            ents = client.extract_entities("急性胃肠炎")
            assert "entities" in ents
            emb = client.embed(["急性胃肠炎"])
            assert len(emb["embeddings"][0]) == 64
            stats = client.get_stats()
            assert "milvus" in stats
            client.close()

        loop.run_until_complete(loop.run_in_executor(None, run))

    def test_http_error_taxonomy(self, live_server):
        url, loop, _ = live_server

        def run():
            client = APIClient(base_url=url)
            with pytest.raises(APIClientError) as ei:
                client.query_diagnosis("", top_k=3)
            assert ei.value.kind == "http" and ei.value.status == 400
            client.close()

        loop.run_until_complete(loop.run_in_executor(None, run))

    def test_connection_error(self):
        client = APIClient(base_url="http://localhost:59999", timeout=2.0)
        with pytest.raises(APIClientError) as ei:
            client.check_health()
        assert ei.value.kind in ("connection", "timeout")
        client.close()
