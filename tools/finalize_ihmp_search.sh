#!/usr/bin/env bash
# Artifact recovery for a deadline-interrupted full-metabolome iHMP
# search (tools/run_ihmp_search_full.sh): emit the results JSON +
# heatmap for the outcomes that DID complete. Zero device work — the
# sweep's resume path rebuilds every fitted model from its checkpoint
# payload, so this runs on the CPU backend and finishes in minutes.
#
# Run it AFTER the launcher has exited (it reads the same checkpoint
# dir the launcher wrote).
set -eu
cd "$(dirname "$0")/.."

export IHMP_MODE=search
export IHMP_SEARCH_FINALIZE=1
export IHMP_PLATFORM=cpu
export IHMP_SEARCH_CKPT=${IHMP_SEARCH_CKPT:-examples/output/ihmp_real/search_ckpt_full}
export IHMP_SEARCH_WARM=${IHMP_SEARCH_WARM:-1}

exec python examples/ihmp_real.py
