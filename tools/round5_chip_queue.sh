#!/usr/bin/env bash
# Round-5 serialized chip queue: the tunneled TPU worker is single-
# tenant (concurrent processes starve each other and have killed the
# worker before — ROADMAP round-3 notes), so every remaining chip job
# this session runs through ONE script, strictly in sequence:
#   1. wait for the worker to serve real compute (not just device lists)
#   2. iHMP fidelity A/B (VERDICT r4 item 2): cheap vs reference-depth
#      search arms over the same first N metabolites
#   3. full-grid Gaussian simulation sweep (VERDICT item 5) under a
#      global wall budget, then a collection pass that writes the
#      artifact with honest cells_missing
#   4. iHMP 596-metabolite NB penalized rerun with stage profiling
#      (VERDICT item 6 receipts)
#   5. full bench (warms the persistent cache for the driver's round-end
#      run — VERDICT item 4)
# Each step is bounded by `timeout`; a failed step does not block the
# next. Log: examples/output/round5_queue.log
set -u
cd "$(dirname "$0")/.."
LOG=examples/output/round5_queue.log
exec >>"$LOG" 2>&1

step () { echo; echo "=== $(date -u +%H:%M:%S) $* ==="; }

step "wait for TPU compute"
for i in $(seq 1 120); do
  if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.ones((128, 128)).sum()) == 128 * 128
EOF
  then echo "worker up after probe $i"; break; fi
  sleep 60
done

step "iHMP fidelity A/B (64 outcomes, budget ${IHMP_AB_BUDGET_S:-3300}s/arm)"
IHMP_AB_BUDGET_S=${IHMP_AB_BUDGET_S:-3300} timeout 9000 bash tools/run_ihmp_ab.sh 64

step "full-grid Gaussian sweep (global budget ${GRID_BUDGET_S:-5400}s)"
timeout "${GRID_BUDGET_S:-5400}" python examples/simulation_study.py \
  --sweep --full-grid --likelihood gaussian --max-iter 300 \
  --cell-budget-s 420
step "full-grid Gaussian collection pass"
timeout 900 python examples/simulation_study.py \
  --sweep --full-grid --likelihood gaussian --max-iter 300 \
  --cell-budget-s 3

step "iHMP NB penalized rerun (596 metabolites, stage profile)"
WAVEOME_FIT_PROFILE=1 timeout 2400 python examples/ihmp_real.py

step "final full bench (cache warm for the driver)"
WAVEOME_SEARCH_PROFILE=1 timeout 2400 python bench.py

step "queue done"
