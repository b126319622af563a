#!/bin/bash
# Round-5 post-training chain. Launched while the encoder retrain
# (train_watchdog.sh -> db/trained_r5) still owns the chip: waits for
# the watchdog to exit, then runs every remaining round-5 measurement
# serially (ONE JAX process at a time — single-core host, CLAUDE.md).
#
# Produces: db/ner, rebuilt db/icd10_store.* paired with the trained
# encoder, EVAL_r05.json, /tmp/bench_r05_{high,bf16}.json,
# BENCH_CONFIGS_r05.json, SERVING_r05.json. Logs to /tmp/post_train_r5.log.
#
# Resumable: STAMP files under /tmp/r5_done.* skip completed steps, so
# re-running after a crash continues where it left off.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/post_train_r5.log
exec >>"$LOG" 2>&1

stamp() { touch "/tmp/r5_done.$1"; }
done_already() { [ -f "/tmp/r5_done.$1" ]; }

echo "=== post_train_r5 start $(date -u +%H:%M:%S)"

# -- 0. wait for the training watchdog (and any trainer child) to exit
WD_PID=$(cat /tmp/watchdog_r5.pid 2>/dev/null || true)
if [ -n "${WD_PID}" ]; then
  while kill -0 "$WD_PID" 2>/dev/null; do sleep 30; done
fi
# belt-and-braces: wait for the trainer process itself
TR_PID=$(cat /tmp/train_watchdog.pid 2>/dev/null || true)
if [ -n "${TR_PID}" ]; then
  while kill -0 "$TR_PID" 2>/dev/null; do sleep 15; done
fi
sleep 10  # let the tunnel device claim release
echo "=== training done $(date -u +%H:%M:%S); gate:"
cat db/trained_r5/eval_gate.json 2>/dev/null || echo "(no eval_gate.json)"

[ -f db/trained_r5/params.npz ] || { echo "FATAL: no trained params"; exit 1; }
WEIGHTS=db/trained_r5

# -- 1. NER distillation (~3 min) with the silver-shape dual eval
if ! done_already ner; then
  timeout 2400 python -m rag_icd10_tpu.tools.train_ner --out db/ner \
    && stamp ner || echo "WARN: NER distill failed (continuing)"
fi

# -- 2. store rebuild paired with the trained encoder (~6 min warm)
if ! done_already store; then
  EMBEDDING_WEIGHTS_PATH=$WEIGHTS/params.npz \
  EMBEDDING_VOCAB_PATH=$WEIGHTS/vocab.txt \
  timeout 3000 python -m rag_icd10_tpu.tools.build_database --rebuild \
    && stamp store || { echo "FATAL: store rebuild failed"; exit 1; }
fi

# -- 3. tiered retrieval eval on the chip (~10 min)
if ! done_already eval; then
  timeout 3000 python -m rag_icd10_tpu.tools.eval_retrieval --out EVAL_r05.json \
    && stamp eval || echo "WARN: eval failed"
fi

# -- 4. headline bench A/B: HIGH (incumbent) vs bf16 scan + fp32 re-rank
if ! done_already bench_high; then
  timeout 1200 python bench.py >/tmp/bench_r05_high.json \
    && stamp bench_high || echo "WARN: bench high failed"
fi
if ! done_already bench_bf16; then
  BENCH_SCAN_PRECISION=bf16 timeout 1200 python bench.py >/tmp/bench_r05_bf16.json \
    && stamp bench_bf16 || echo "WARN: bench bf16 failed"
fi

# -- 5. full BASELINE config sweep (incl. HNSW config 2 on the retrained
#       embeddings, config 8 10M int8, config 9 host-tier with m=4096)
if ! done_already configs; then
  timeout 10800 python -m benchmarks.run --config 0 --out BENCH_CONFIGS_r05.json \
    && stamp configs || echo "WARN: config sweep failed"
fi

# -- 6. serving A/B at 64 clients (dispatch/finalize overlap now live)
if ! done_already serving; then
  timeout 6000 bash scripts/serving_ab.sh SERVING_r05.json 64 600 \
    && stamp serving || echo "WARN: serving A/B failed"
fi

echo "=== post_train_r5 done $(date -u +%H:%M:%S)"
