"""Serving benchmark: sustained HTTP QPS against the coalescing server.

Measures what a client actually sees — concurrent /query requests against
a warmed server — as opposed to device-side kernel throughput (bench.py).
The reference processes requests strictly sequentially (one embed + one
Milvus scan per request, no batching), so its ceiling on the same host is
~1/request-latency.

Usage: python -m benchmarks.serving [--clients 32] [--requests 300]
(expects the API server already running; starts one if not)
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import subprocess
import sys
import time

import aiohttp

TEXTS = [
    "急性胃肠炎",
    "高血压病3级，2型糖尿病",
    "疑似急性心肌梗死",
    "慢性阻塞性肺疾病急性加重",
    "胃癌术后，化疗后骨髓抑制",
    "肺部感染待查",
]


async def worker(session, base, n, latencies):
    for i in range(n):
        payload = {"text": TEXTS[i % len(TEXTS)], "top_k": 5}
        t0 = time.perf_counter()
        async with session.post(f"{base}/query", json=payload) as resp:
            await resp.read()
            assert resp.status == 200, resp.status
        latencies.append(time.perf_counter() - t0)


async def run(base: str, clients: int, requests: int):
    async with aiohttp.ClientSession() as session:
        # wait until healthy
        for _ in range(120):
            try:
                async with session.get(f"{base}/health") as r:
                    if (await r.json()).get("status") == "healthy":
                        break
            except aiohttp.ClientError:
                pass
            await asyncio.sleep(5)
        # warmup requests
        await worker(session, base, 3, [])
        latencies: list = []
        per_client = max(1, requests // clients)
        t0 = time.time()
        await asyncio.gather(
            *[worker(session, base, per_client, latencies) for _ in range(clients)]
        )
        wall = time.time() - t0
        lat = sorted(latencies)
        total = len(latencies)
        out = {
            "clients": clients,
            "requests": total,
            "sustained_qps": round(total / wall, 1),
            "p50_ms": round(lat[total // 2] * 1000, 1),
            "p95_ms": round(lat[int(total * 0.95)] * 1000, 1),
        }
        # per-stage timers + pipelining state from the server itself
        try:
            async with session.get(f"{base}/stats") as r:
                stats = await r.json()
            out["stage_latency"] = stats.get("stage_latency", {})
            batching = stats.get("batching", {})
            out["pipelined"] = batching.get("pipelined")
            out["avg_batch_size"] = batching.get("avg_batch_size")
        except Exception:
            pass
        return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--clients", type=int, default=32)
    parser.add_argument("--requests", type=int, default=320)
    parser.add_argument("--port", type=int, default=int(os.getenv("API_PORT", "8005")))
    parser.add_argument("--out", default=None, help="also write JSON artifact")
    args = parser.parse_args()
    base = f"http://localhost:{args.port}"

    proc = None
    try:
        import httpx

        try:
            httpx.get(f"{base}/health", timeout=3)
        except httpx.HTTPError:
            proc = subprocess.Popen(
                [sys.executable, "-u", "-m", "rag_icd10_tpu.api.app"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        result = asyncio.run(run(base, args.clients, args.requests))
        print(json.dumps({"serving": result}, ensure_ascii=False))
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"serving": result}, f, indent=2)
    finally:
        if proc is not None:
            proc.kill()


if __name__ == "__main__":
    main()
