#!/bin/bash
# Corner-smoothing optimization: both objectives, sequentially.
# (Counterpart of the reference's LSF batch script; runs the built-in TPE
# driver via main.py's multirun optimization path.)
set -e
cd "$(dirname "$0")/.."

echo "=== Objective 1/2: fv_l2_error ==="
python main.py -m +experiment/optimization=corner_smoothing \
    'solver.corner_smoothing=interval(0.02,0.35)' \
    optuna.objective=fv_l2_error "$@"

echo "=== Objective 2/2: botella_vortex ==="
python main.py -m +experiment/optimization=corner_smoothing \
    'solver.corner_smoothing=interval(0.02,0.35)' \
    optuna.objective=botella_vortex "$@"
