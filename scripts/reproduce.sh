#!/bin/bash
# Reproduce every checked-in artifact from scratch on a TPU host.
# Gitignored outputs (db/, trained weights) do not survive workspace
# resets; this is the full chain that produced EVAL_r05.json,
# NER_EVAL_r05.json, BENCH_CONFIGS_r05.json, SERVING_r05.json and the
# bench.py headline (BENCH_r05_ab.json is bench.py run at both
# BENCH_SCAN_PRECISION settings).
#
# Wall-clock on 1x v5e through the axon tunnel: ~5.5 h total
# (training dominates). Every step is individually resumable; the
# equivalent unattended chain is scripts/post_train_r5.sh (stamp-file
# resumable), which round 5 ran behind the training watchdog.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 0. TPU kernel compile gate (round-3 lesson: interpret-mode tests"
echo "       keep the suite green while a kernel is hardware-dead)"
timeout 1800 python scripts/tpu_smoke.py

echo "=== 1. contrastive encoder training (~2.5 h; wedge-resilient watchdog,"
echo "       checkpoints every 2k steps, tagged every 4k, EVAL-GATED on the"
echo "       4-tier blend: weights scoring below the incumbent are left"
echo "       unblessed. The round-5 recipe: level weights folded into the"
echo "       InfoNCE logits + ancestor hard negatives, no parent pairs —"
echo "       blessed at blend 0.9806 vs 0.9567 (EVAL_GATE_r05.json)"
rc=0
TRAIN_LOG=/tmp/train_reproduce.log scripts/train_watchdog.sh db/trained_r5 20000 \
  --batch 256 --weighted-loss --ancestor-frac 0.5 --no-parent-pairs \
  --eval-gate EVAL_r02.json --gate-metric blend --keep-every 4000 || rc=$?
if [ "$rc" -eq 0 ]; then
  WEIGHTS=db/trained_r5
elif [ "$rc" -eq 3 ] && [ -f db/trained/params.npz ]; then
  echo "=== gate REJECTED the candidate; continuing with the incumbent"
  WEIGHTS=db/trained
else
  echo "=== training failed (rc=$rc)"; exit "$rc"
fi
[ -f "$WEIGHTS/params.npz" ] || { echo "no weights at $WEIGHTS"; exit 1; }

echo "=== 2. distilled NER model (~3 min) + model-vs-rules silver eval"
timeout 2400 python -m rag_icd10_tpu.tools.train_ner --out db/ner
cp db/ner/eval.json NER_EVAL_r05.json

echo "=== 3. store rebuild with the blessed encoder ($WEIGHTS, ~6 min warm)"
EMBEDDING_WEIGHTS_PATH=$WEIGHTS/params.npz \
EMBEDDING_VOCAB_PATH=$WEIGHTS/vocab.txt \
timeout 3000 python -m rag_icd10_tpu.tools.build_database --rebuild

echo "=== 4. tiered retrieval eval (~10 min)"
timeout 3000 python -m rag_icd10_tpu.tools.eval_retrieval --out EVAL_r05.json

echo "=== 5. headline benchmark A/B (HIGH incumbent vs bf16 single-pass)"
timeout 1200 python bench.py
BENCH_SCAN_PRECISION=bf16 timeout 1200 python bench.py

echo "=== 6. BASELINE benchmark configs (~75 min; includes config 6 scan A/B,"
echo "       config 7/8 int8 residency and config 9 host-tier at 16.8M rows;"
echo "       HOST_TIER_DS/HOST_TIER_MS extend the config-9 ladder)"
timeout 10800 python -m benchmarks.run --config 0 --out BENCH_CONFIGS_r05.json

echo "=== 7. serving benchmark: pipelining on/off A/B at 64 clients"
timeout 6000 bash scripts/serving_ab.sh SERVING_r05.json 64 600

echo "=== done — artifacts: EVAL_r05.json NER_EVAL_r05.json BENCH_CONFIGS_r05.json SERVING_r05.json"
