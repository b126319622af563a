"""Stub API server for driving the web UI without a device.

Serves the real static UI (rag_icd10_tpu/api/static) plus /health,
/query, /standardize and /entities answered from the golden contract
fixtures (tests/golden/*.json) — so a browser can exercise the actual
DOM rendering paths (tab switching, score badges, per-diagnosis group
boxes) with reference-shaped payloads and zero JAX/TPU dependency.

Usage: python tests/ui_stub_server.py [port]
"""

import json
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

ROOT = Path(__file__).parent.parent
STATIC = ROOT / "rag_icd10_tpu" / "api" / "static"
GOLDEN = ROOT / "tests" / "golden"


def _fixture(name):
    return json.loads((GOLDEN / f"{name}.json").read_text(encoding="utf-8"))


class Handler(BaseHTTPRequestHandler):
    def _send(self, payload, content_type="application/json", status=200):
        body = (
            payload
            if isinstance(payload, bytes)
            else json.dumps(payload, ensure_ascii=False).encode("utf-8")
        )
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Access-Control-Allow-Origin", "*")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path in ("/ui", "/ui/", "/ui/index.html"):
            self._send(
                (STATIC / "index.html").read_bytes(), "text/html; charset=utf-8"
            )
        elif self.path == "/health":
            self._send(
                {
                    "status": "healthy",
                    "milvus_connected": True,
                    "embedding_model_loaded": True,
                    "total_records": 40474,
                }
            )
        else:
            self._send({"detail": "not found"}, status=404)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        if self.path == "/query":
            name = (
                "query_multi"
                if any(s in body.get("text", "") for s in "，,；;+ ")
                else "query_single"
            )
            self._send(_fixture(name))
        elif self.path == "/standardize":
            self._send(_fixture("standardize_multi"))
        elif self.path == "/entities":
            self._send(_fixture("entities"))
        else:
            self._send({"detail": "not found"}, status=404)

    def log_message(self, *a):  # quiet
        pass


if __name__ == "__main__":
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8006
    print(f"ui stub on http://127.0.0.1:{port}/ui")
    HTTPServer(("127.0.0.1", port), Handler).serve_forever()
