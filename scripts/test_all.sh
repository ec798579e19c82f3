#!/usr/bin/env bash
# Sweep all checkpoints over a dataset, then evaluate (reference test_all.sh).
set -e
cd "$(dirname "$0")/.."
DATASET=${DATASET:-VOT2018}
CONFIG=${CONFIG:-experiments/siammask_sharp/config_vot18.json}
START=${START:-1}; END=${END:-20}
for e in $(seq "$START" "$END"); do
    ckpt="snapshot/checkpoint_e${e}.msgpack"
    [ -f "$ckpt" ] || continue
    python tools/test.py --config "$CONFIG" --resume "$ckpt" \
        --mask --refine --dataset "$DATASET" \
        --tracker-name "ckpt_e${e}"
done
python tools/eval.py --dataset "$DATASET" --result-dir test --tracker-prefix ckpt_
