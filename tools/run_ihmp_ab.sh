#!/usr/bin/env bash
# Fidelity A/B for the flagship iHMP greedy search (VERDICT r4 item 2):
# the committed 596-metabolite artifact ran the CHEAP config
# (max_depth=2, num_restart=1, M=128); the reference's HPC run used
# GPSearch.run_search defaults (max_depth=5 + early stopping,
# num_restart=1, M=N; ihmp_waveome_hpc_run.py:176, model_search.py:1069).
# This runs both configs over the SAME first N metabolites and writes
# per-arm artifacts for tools/summarize_ihmp_ab.py.
#
# Usage: tools/run_ihmp_ab.sh [N_OUTCOMES (default 64)]
set -u
cd "$(dirname "$0")/.."
N=${1:-64}
BUDGET=${IHMP_AB_BUDGET_S:-5400}

run_arm () {
  local name=$1 depth=$2 restarts=$3 m=$4
  local out="examples/output/ihmp_ab/$name"
  mkdir -p "$out"
  if [ -f "$out/search_results.json" ] \
     && python -c "import json,sys; d=json.load(open('$out/search_results.json')); sys.exit(0 if not d.get('partial') else 1)"; then
    echo "# arm $name already complete"
    return 0
  fi
  echo "# arm $name: depth=$depth restarts=$restarts M=$m outcomes=$N"
  IHMP_MODE=search \
  IHMP_OUT="$out" \
  IHMP_OUTCOMES=$N \
  IHMP_SEARCH_DEPTH=$depth \
  IHMP_SEARCH_RESTARTS=$restarts \
  IHMP_M=$m \
  IHMP_SEARCH_CHUNK=32 \
  IHMP_SEARCH_CKPT="$out/ckpt" \
  IHMP_SEARCH_BUDGET_S=$BUDGET \
  timeout $((BUDGET + 900)) python examples/ihmp_real.py \
    > "$out/run.log" 2>&1
  echo "# arm $name rc=$?"
}

# arm A: the committed round-4 cheap config
run_arm cheap 2 1 128
# arm B: reference-default depth (early stopping bounds the effective
# depth) + 3 restarts per candidate
run_arm ref 5 3 128

python tools/summarize_ihmp_ab.py
