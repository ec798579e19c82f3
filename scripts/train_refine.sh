#!/usr/bin/env bash
# Stage-2 training: refine module on top of a base checkpoint.
set -e
cd "$(dirname "$0")/.."
PRETRAINED=${1:?usage: train_refine.sh <base_checkpoint>}
shift
python tools/train.py --config experiments/siammask_sharp/config.json \
    --task sharp_refine --epochs 20 --batch "${BATCH:-64}" \
    --save-dir snapshot_refine --pretrained "$PRETRAINED" --tb-dir board "$@"
