#!/usr/bin/env bash
# Batch synthesis over checkpoint steps (reference synthesize_lj.sh)
set -e
T=${T:-1}
for ((i=${START:-300000}; i<=${END:-300000}; i=i+${STRIDE:-100000})); do
  python3 cli/synthesize.py --source ./preprocessed_data/LibriTTS/val.txt \
      --restore_step $i --T $T --mode batch --dataset LibriTTS "$@"
done
