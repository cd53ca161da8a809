#!/usr/bin/env bash
# Round-4 zero-shot REDO: the first executed leg (tools/round4_queue.sh)
# exposed two defects that this protocol fixes:
#   1. cli/synthesize_zeroshot.py silently vocoded with a RANDOM-INIT
#      HiFi-GAN when no --vocoder_ckpt was given -> the scored wavs were
#      buzz (cos-to-target 0.015, MCD 16.8). Fixed: the CLI now defaults
#      to Griffin-Lim; re-vocoding the same mels scored cos 0.79/0.54.
#   2. GE2E overfits 10 synthetic speakers (loss 3e-4 @ 10k steps) and
#      collapses on held-out voices (self-cos 0.66, nearest-train-cos
#      0.99). Fixed: 32 train speakers + unseen-speaker EER validation
#      with early stopping (cli/train_ge2e.py --val_speakers).
#
# Stages are resumable: each writes a .done marker under $WORK.
set -euo pipefail
cd "$(dirname "$0")/.."

ZS=${ZS:-/tmp/zscorp2}
WORK=${WORK:-/tmp/zs_redo}
STEPS=${STEPS:-8000}
SPEAKERS=${SPEAKERS:-34}     # total voices (last HOLDOUT are zero-shot targets)
UTTS=${UTTS:-40}
HOLDOUT=${HOLDOUT:-2}
VAL_SPK=${VAL_SPK:-3}        # GE2E unseen-speaker EER validation voices
mkdir -p "$WORK"

run() {
  local name=$1; shift
  if [ -f "$WORK/$name.done" ]; then echo "== [$name] cached =="; return; fi
  echo "== [$name] start $(date +%T) =="
  "$@" 2>&1 | tee "$WORK/$name.log" | tail -4
  touch "$WORK/$name.done"
  echo "== [$name] done  $(date +%T) =="
}

# 34 voices in the 4-D profile space: 32 train (3 of them GE2E-val),
# 2 zero-shot holdout
run corpus env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python cli/gen_corpus.py --out "$ZS" --speakers "$SPEAKERS" \
    --utts_per_speaker "$UTTS" --holdout "$HOLDOUT" --val_size 16

# GE2E runs on the chip (the LSTM steps are ~30x faster than this
# host's single CPU core; the original queue's 10k steps took 20 min)
run ge2e python cli/train_ge2e.py --wav_root "$ZS/raw" --work_dir "$ZS/ge2e" \
    --total_steps 12000 --val_speakers "$VAL_SPK" --eval_every 500 --patience 4

# generalization gate: abort before burning chip time if the encoder
# still cannot separate truly-unseen voices (the holdout pair)
run ge2e_gate env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/check_ge2e_holdout.py --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" \
    --holdout_root "$ZS/raw_holdout" --train_root "$ZS/raw" \
    --min_top1 0.75 --min_margin 0.0 \
    --out "$WORK/ge2e_gate.json"

run preprocess env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python cli/preprocess.py --dataset VCTK --config_root "$ZS/config" \
    --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" --workers 1

run chip env CORPUS="$ZS" STEPS="$STEPS" OUT="$WORK" \
    bash tools/run_zeroshot_quality.sh

echo "== zero-shot redo complete: $(ls "$WORK"/zs_eval_*.json 2>/dev/null | tr '\n' ' ')=="
