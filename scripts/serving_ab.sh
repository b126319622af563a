#!/bin/bash
# Serving benchmark A/B: host-stage pipelining ON (PIPELINE_DEPTH=2,
# default) vs OFF (depth 1 = monolithic matcher path), 64 clients.
# Produces ONE artifact with both runs so the pipelining win is a
# measured fact, not a design claim (round-3 verdict weak #6).
#
#   scripts/serving_ab.sh [OUT_JSON] [CLIENTS] [REQUESTS]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-SERVING_r04.json}
CLIENTS=${2:-64}
REQUESTS=${3:-600}
PORT=${API_PORT:-8005}

run_one() {  # $1 = depth, $2 = tmp json
  local depth=$1 out=$2
  echo "=== PIPELINE_DEPTH=$depth: starting server" >&2
  PIPELINE_DEPTH=$depth API_PORT=$PORT \
    timeout 2400 python -m rag_icd10_tpu.api.app > /tmp/serving_ab_$depth.log 2>&1 &
  local wrapper=$!
  # wait for readiness (cold start + warmup sweep can take ~7 min)
  for _ in $(seq 1 120); do
    if curl -sf -m 3 "localhost:$PORT/health" | grep -q healthy; then break; fi
    sleep 5
  done
  curl -sf -m 3 "localhost:$PORT/health" >/dev/null || {
    echo "server with depth=$depth never became healthy" >&2; exit 1; }
  timeout 1200 python -m benchmarks.serving \
    --clients "$CLIENTS" --requests "$REQUESTS" --port "$PORT" --out "$out"
  # kill the real python (the wrapper is `timeout`)
  local pid
  pid=$(ss -ltnp | grep ":$PORT" | grep -oP 'pid=\K[0-9]+' | head -1)
  kill -9 "$pid" 2>/dev/null || true
  kill -9 "$wrapper" 2>/dev/null || true
  sleep 3
}

run_one 2 /tmp/serving_on.json
run_one 1 /tmp/serving_off.json

python - "$OUT" <<'EOF'
import json, sys
on = json.load(open("/tmp/serving_on.json"))["serving"]
off = json.load(open("/tmp/serving_off.json"))["serving"]
out = {
    "pipelined_on": on,
    "pipelined_off": off,
    "pipelining_speedup": round(
        on["sustained_qps"] / off["sustained_qps"], 3
    ),
}
json.dump(out, open(sys.argv[1], "w"), indent=2)
print(json.dumps(out))
EOF
