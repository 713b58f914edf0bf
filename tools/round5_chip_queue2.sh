#!/usr/bin/env bash
# Round-5 final-session chip queue, take 2 (reprioritized after the
# ref A/B arm outgrew its 32-outcome chunk and the full-grid cells
# outgrew their per-cell budget — receipts in round5_queue.log):
#   1. ref-fidelity A/B arm retry at chunk=8 (checkpoints every 8
#      outcomes, budget-bounded) + summary
#   2. full bench (final code state — warms the persistent cache for
#      the driver's round-end run)
#   3. reduced count + Gaussian sweep re-runs (round-4 shapes = warm
#      cache) so the committed artifacts carry the round-5 fixes
#   4. iHMP 596-metabolite NB penalized rerun with stage profile
set -u
cd "$(dirname "$0")/.."
LOG=examples/output/round5_queue2.log
exec >>"$LOG" 2>&1

step () { echo; echo "=== $(date -u +%H:%M:%S) $* ==="; }

step "wait for TPU compute"
for i in $(seq 1 90); do
  if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.ones((128, 128)).sum()) == 128 * 128
EOF
  then echo "worker up after probe $i"; break; fi
  sleep 45
done

step "ref A/B arm retry (chunk=8, budget 1800s)"
IHMP_MODE=search \
IHMP_OUT=examples/output/ihmp_ab/ref \
IHMP_OUTCOMES=64 \
IHMP_SEARCH_DEPTH=5 \
IHMP_SEARCH_RESTARTS=3 \
IHMP_M=128 \
IHMP_SEARCH_CHUNK=8 \
IHMP_SEARCH_CKPT=examples/output/ihmp_ab/ref/ckpt \
IHMP_SEARCH_BUDGET_S=1800 \
timeout 2700 python examples/ihmp_real.py > examples/output/ihmp_ab/ref/run.log 2>&1
echo "ref arm rc=$?"
timeout 300 python tools/summarize_ihmp_ab.py

step "full bench (final code state)"
timeout 2400 python bench.py

step "reduced sweeps rerun"
COUNT_BUDGET_S=1500 GAUSS_BUDGET_S=1200 bash tools/rerun_reduced_sweeps.sh

step "iHMP NB penalized rerun (stage profile)"
WAVEOME_FIT_PROFILE=1 timeout 1800 python examples/ihmp_real.py

step "queue2 done"
