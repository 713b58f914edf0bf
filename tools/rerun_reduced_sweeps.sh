#!/usr/bin/env bash
# Re-run the REDUCED-grid simulation sweeps with the round-5 fixes
# (fixed penalization factor 1.0 = the reference harness default, and
# the Gaussian selection-time noise floor) so the committed artifacts
# stop carrying the round-4 numbers (count penalized recall 0.16,
# Gaussian KL mean 2.60 overconfidence tail — VERDICT r4 items 3 and 8).
# The sweep resumes from per-cell JSONs, so the stale cells must go.
set -u
cd "$(dirname "$0")/.."
OUT=examples/output/sim_study

echo "=== $(date -u +%H:%M:%S) reduced count sweep (fresh cells) ==="
rm -f $OUT/cell_nb_r*_u8_n0.1.json $OUT/cell_nb_r*_u8_n0.5.json \
      $OUT/cell_nb_r*_u16_n0.1.json $OUT/cell_nb_r*_u16_n0.5.json
timeout "${COUNT_BUDGET_S:-2400}" python examples/simulation_study.py \
  --sweep --likelihood nb --max-iter 300 --cell-budget-s 420
timeout 600 python examples/simulation_study.py \
  --sweep --likelihood nb --max-iter 300 --cell-budget-s 3

echo "=== $(date -u +%H:%M:%S) reduced Gaussian sweep (fresh cells) ==="
rm -f $OUT/cell_gaussian_r*_u8_n0.1.json $OUT/cell_gaussian_r*_u8_n0.5.json \
      $OUT/cell_gaussian_r*_u16_n0.1.json $OUT/cell_gaussian_r*_u16_n0.5.json
timeout "${GAUSS_BUDGET_S:-1800}" python examples/simulation_study.py \
  --sweep --likelihood gaussian --max-iter 300 --cell-budget-s 420
timeout 600 python examples/simulation_study.py \
  --sweep --likelihood gaussian --max-iter 300 --cell-budget-s 3

echo "=== $(date -u +%H:%M:%S) reduced sweeps done ==="
