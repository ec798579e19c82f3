#!/usr/bin/env bash
# Stage-1 training: SiamMask-base on the full dataset mix (reference run.sh).
set -e
cd "$(dirname "$0")/.."
python tools/train.py --config experiments/siammask_base/config.json \
    --task base --epochs 20 --batch "${BATCH:-64}" --save-dir snapshot \
    --tb-dir board "$@"
