"""Standalone UI launcher tests: index serving + API proxying."""

import asyncio

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from rag_icd10_tpu.ui_app import build_app, find_free_port


@pytest.fixture()
def loop():
    loop = asyncio.new_event_loop()
    yield loop
    loop.close()


def test_find_free_port_returns_int():
    port = find_free_port(45000)
    assert 45000 <= port < 45020


def test_ui_serves_index_and_proxies(loop):
    async def run():
        # stub API backend
        api = web.Application()

        async def health(request):
            return web.json_response({"status": "healthy", "total_records": 1})

        async def query(request):
            body = await request.json()
            return web.json_response({"echo": body["text"]})

        api.router.add_get("/health", health)
        api.router.add_post("/query", query)
        api_server = TestServer(api)
        await api_server.start_server()

        ui = build_app(f"http://{api_server.host}:{api_server.port}")
        client = TestClient(TestServer(ui))
        await client.start_server()

        resp = await client.get("/")
        assert resp.status == 200
        assert "ICD-10" in await resp.text()

        resp = await client.get("/health")
        assert (await resp.json())["status"] == "healthy"

        resp = await client.post("/query", json={"text": "肺炎", "top_k": 2})
        assert (await resp.json())["echo"] == "肺炎"

        await client.close()
        await api_server.close()

    loop.run_until_complete(run())


class TestProfilerClass:
    def test_start_stop_states(self, tmp_path):
        from rag_icd10_tpu.utils.metrics import Profiler

        p = Profiler(log_dir=str(tmp_path / "prof"))
        assert not p.active
        out = p.start()
        assert out["status"] == "started" and p.active
        again = p.start()
        assert again["status"] == "already_running"
        out = p.stop()
        assert out["status"] == "stopped" and not p.active
        assert p.stop()["status"] == "not_running"
