#!/bin/bash
# Figure-reproduction driver — parity with the reference's
# base_results/rerun-experiments.sh: re-runs the sweep experiments and
# regenerates every figure from the committed data.
#
# Usage:  bash measurements/rerun-experiments.sh [cpu|tpu]
#   cpu: validation-scale sweeps on the CPU backend (fast, no chip needed)
#   tpu: full sweeps on the attached TPU (the committed data's provenance)
set -e
cd "$(dirname "$0")/.."
MODE=${1:-tpu}

if [ "$MODE" = cpu ]; then
    python measurements/run.py quick
    python measurements/run.py scaling
else
    python measurements/run.py radix_bits
    python measurements/run.py bloom
    python measurements/run.py passes
    python measurements/run.py scaling
fi
python measurements/plot_basics.py all
