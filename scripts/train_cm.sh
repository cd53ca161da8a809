#!/usr/bin/env bash
# Consistency-model training (reference train_cm.sh)
set -e
DATASET=${1:-VCTK}
python3 cli/train_cm.py --model consistency_training --dataset "$DATASET" "${@:2}"
