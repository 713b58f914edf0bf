#!/usr/bin/env bash
# Full-metabolome iHMP greedy kernel search on the chip, with retries.
#
# The reference runs this workload as 40 Ray jobs under a 12 h SLURM
# limit (examples/iHMP/ihmp_waveome_hpc_run.py:176). Here one chip works
# through all 596 metabolites via the chunked checkpoint/resume sweep
# (waveome_tpu/search/sweep.py); each attempt resumes from completed
# chunks, so transient TPU-worker restarts only cost the in-flight chunk.
#
# Env overrides: DEADLINE_S (total wall budget, default 27000 = 7.5 h),
# MAX_ATTEMPTS (default 24), plus everything examples/ihmp_real.py reads.
set -u
cd "$(dirname "$0")/.."

LOG=examples/output/ihmp_real/search_full.log
DEADLINE_S=${DEADLINE_S:-27000}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-24}
START=$(date +%s)

export IHMP_MODE=search
export IHMP_SEARCH_CKPT=${IHMP_SEARCH_CKPT:-examples/output/ihmp_real/search_ckpt_full}
export IHMP_SEARCH_CHUNK=${IHMP_SEARCH_CHUNK:-32}
export IHMP_SEARCH_WARM=${IHMP_SEARCH_WARM:-1}
export IHMP_VERBOSE=${IHMP_VERBOSE:-0}
# cross-session accumulation: seed from the COMMITTED artifact JSON so a
# fresh filesystem (no checkpoint dir) continues where the last session's
# committed results end, instead of refitting from metabolite 0. Each
# attempt re-reads the file, so within this launcher run the merged JSON
# written by attempt N seeds attempt N+1 alongside the checkpoint dir.
SEED_JSON=examples/output/ihmp_real/search_results.json
if [ -z "${IHMP_SEARCH_SEED:-}" ] && [ -f "$SEED_JSON" ]; then
  export IHMP_SEARCH_SEED="$SEED_JSON"
fi
mkdir -p "$IHMP_SEARCH_CKPT"

for i in $(seq 1 "$MAX_ATTEMPTS"); do
  NOW=$(date +%s); ELAPSED=$((NOW - START)); LEFT=$((DEADLINE_S - ELAPSED))
  if [ "$LEFT" -le 300 ]; then
    echo "=== deadline reached after $ELAPSED s; stopping ===" >> "$LOG"
    break
  fi
  echo "=== full-sweep attempt $i $(date +%H:%M:%S) (budget ${LEFT}s) ===" >> "$LOG"
  # graceful in-process budget: the sweep stops starting new chunks
  # 20 min before the hard kill. The merged artifact JSON is also
  # flushed after EVERY chunk (sweep chunk_callback in ihmp_real.py),
  # so even a hard timeout kill mid-chunk only loses that chunk —
  # the margin no longer has to exceed a worst-case chunk duration.
  if [ "$LEFT" -gt 1800 ]; then
    export IHMP_SEARCH_BUDGET_S=$((LEFT - 1200))
  else
    export IHMP_SEARCH_BUDGET_S=$((LEFT / 2))
  fi
  timeout "$LEFT" python examples/ihmp_real.py >> "$LOG" 2>&1
  RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "=== full sweep COMPLETE at attempt $i $(date +%H:%M:%S) ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $i failed rc=$RC $(date +%H:%M:%S) ===" >> "$LOG"
  # a crashed TPU worker needs time to come back; probe before retrying
  sleep 60
done
echo "=== exited without completing; checkpoints preserved in $IHMP_SEARCH_CKPT ===" >> "$LOG"
exit 1
