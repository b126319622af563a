#!/bin/bash
# Wedge-resilient encoder training (the axon tunnel silently wedges:
# round 3 lost a 48k-step run to exactly this — the run died at 6k and
# every naive resume wedged again within minutes).
#
#   scripts/train_watchdog.sh OUT_DIR TOTAL_STEPS [extra train args...]
#
# Runs tools/train_encoder with --save-every checkpoints, watches the log
# for silence (no new step line), kills a wedged run and resumes from the
# rolling checkpoint. Resumes restore the optimizer (opt_state.npz), so
# the cosine schedule and Adam moments continue where they stopped.
set -u
OUT=${1:?out dir}; shift
STEPS=${1:?total steps}; shift
LOG=${TRAIN_LOG:-/tmp/train_watchdog.log}
FIRST_STEP_GRACE=${FIRST_STEP_GRACE:-900}   # compile+data build can take ~8 min
SILENCE_LIMIT=${SILENCE_LIMIT:-480}         # mid-run: 8 min without a step line
MAX_ATTEMPTS=${MAX_ATTEMPTS:-12}

attempt=0
while [ $attempt -lt $MAX_ATTEMPTS ]; do
  attempt=$((attempt + 1))
  resume=()
  if [ -f "$OUT/params.npz" ] && [ -f "$OUT/opt_state.npz" ]; then
    resume=(--init-from "$OUT/params.npz")
  fi
  echo "=== attempt $attempt: target $STEPS steps ${resume[*]:-(fresh)} $(date +%H:%M:%S)" | tee -a "$LOG"
  attempt_start_size=$(stat -c %s "$LOG")
  python -m rag_icd10_tpu.tools.train_encoder \
    --steps "$STEPS" --out "$OUT" "${resume[@]}" "$@" >> "$LOG" 2>&1 &
  pid=$!
  echo $pid > /tmp/train_watchdog.pid
  started=$(date +%s)
  last_size=$attempt_start_size
  last_change=$started
  wedged=0
  while kill -0 $pid 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    size=$(stat -c %s "$LOG")
    if [ "$size" != "$last_size" ]; then
      last_size=$size
      last_change=$now
    else
      silent=$((now - last_change))
      limit=$SILENCE_LIMIT
      # Grace applies until THIS attempt logs its first step: device
      # acquisition + compile through the tunnel is 5-15 min of silence
      # that looks exactly like a wedge. Scope the check to log bytes
      # appended by the current attempt (a whole-log grep matches step
      # lines from PREVIOUS attempts and starves resumes of grace).
      tail -c +$((attempt_start_size + 1)) "$LOG" | grep -q "step .*/" \
        || limit=$FIRST_STEP_GRACE
      if [ $silent -gt $limit ]; then
        echo "=== WEDGE: $silent s silent, killing $pid $(date +%H:%M:%S)" | tee -a "$LOG"
        kill -9 $pid 2>/dev/null
        wedged=1
        break
      fi
    fi
  done
  wait $pid 2>/dev/null
  rc=$?
  if [ $wedged -eq 0 ]; then
    if [ $rc -eq 2 ] && tail -c +$((attempt_start_size + 1)) "$LOG" \
        | grep -q "device acquisition timed out"; then
      # device-acquisition watchdog fired inside the trainer (tunnel
      # outage, utils/device_guard.py): retryable, same as a wedge —
      # the attempt budget bounds total patience at ~MAX_ATTEMPTS x
      # DEVICE_ACQUIRE_TIMEOUT_S (rc=2 without the signature stays
      # fatal: argparse errors also exit 2)
      echo "=== device unavailable (rc=2), retrying $(date +%H:%M:%S)" | tee -a "$LOG"
      sleep 60
      continue
    fi
    echo "=== train exited rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG"
    exit $rc
  fi
  sleep 5
done
echo "=== giving up after $MAX_ATTEMPTS attempts" | tee -a "$LOG"
exit 1
