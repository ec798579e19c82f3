#!/usr/bin/env bash
# Hyperparameter grid search; run N copies concurrently — the file-claim
# protocol shares the grid (reference tune.sh).
set -e
cd "$(dirname "$0")/.."
python tools/tune.py --config experiments/siammask_sharp/config_vot18.json \
    --dataset "${DATASET:-VOT2018}" "$@"
