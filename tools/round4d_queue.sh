#!/usr/bin/env bash
# Round-4d chip queue (after tools/round4c_queue.sh): attack the
# remaining prosody gap (VERDICT r3 #5) with a TRAIN-TIME-consistent
# masked-std run — the A/B showed masked standardization at synthesis
# already trims F0-RMSE/FFE on a padded-std-trained checkpoint; this
# trains the CWT pitch path itself with padding-invariant
# standardization (--cwt_masked_std) so train and synthesis agree.
# Reuses the /tmp/qcorp corpus + features; checkpoints/results live
# under the mst path tag so the r04 evidence stays intact.
# Ends with a post-fix bench.py validation (trained weights).
#
#   bash tools/round4d_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."

WORK=${WORK:-/tmp/r4d}
CORPUS=${CORPUS:-/tmp/qcorp}
VOC_OUT=${VOC_OUT:-/tmp/voc_run}
STEPS=${STEPS:-20000}
mkdir -p "$WORK"

run() {
  local name=$1; shift
  if [ -f "$WORK/$name.done" ]; then echo "== [$name] cached =="; return; fi
  echo "== [$name] start $(date +%T) =="
  if "$@" > "$WORK/$name.log" 2>&1; then
    touch "$WORK/$name.done"
    echo "== [$name] done  $(date +%T) =="
  else
    echo "== [$name] FAILED (see $WORK/$name.log) =="
  fi
}

run train_mst python cli/train_cm.py --model consistency_training \
    --dataset LJSpeech --config_root "$CORPUS/config" \
    --total_step "$STEPS" --bf16 --steps_per_call 8 \
    --cwt_masked_std --path_tag mst

synth_mst() {
  for T in 1 2 4; do
    python cli/synthesize.py --mode batch --source "$CORPUS/pre/val.txt" \
        --dataset LJSpeech --config_root "$CORPUS/config" --T "$T" \
        --restore_step "$STEPS" --vocoder griffinlim \
        --params_role target_model --cwt_masked_std --path_tag mst || return 1
  done
}
run synth_mst synth_mst

metrics_mst() {
  : > "$CORPUS/metrics_mst_gl.txt"
  for T in 1 2 4; do
    echo "-- step_${STEPS}_T${T}_mst (griffinlim) --" \
        | tee -a "$CORPUS/metrics_mst_gl.txt"
    python cli/all_metrics.py --single \
        --syn_root "$CORPUS/output/result/LJSpeech_cm_mst/step_${STEPS}_T${T}" \
        --raw_folder "$CORPUS/raw/SYN" --data_type LJSpeech \
        --metrics mcd mcd_dctmel ffe ssim f0_rmse 2>&1 | tail -6 \
        | tee -a "$CORPUS/metrics_mst_gl.txt"
  done
}
run metrics_mst metrics_mst

vocode_mst() {
  local GEN
  GEN=$(ls "$VOC_OUT"/hifigan/hifigan_gen_*.npz 2>/dev/null | tail -1) || return 0
  [ -n "$GEN" ] || return 0
  : > "$VOC_OUT/metrics_mst.txt"
  for T in 1 2 4; do
    local SRC="$CORPUS/output/result/LJSpeech_cm_mst/step_${STEPS}_T${T}"
    python tools/vocode_dir.py --mel_dir "$SRC" --ckpt "$GEN" \
        --out "$VOC_OUT/hifigan_mst_T${T}" || return 1
    echo "-- hifigan_mst_T${T} --" | tee -a "$VOC_OUT/metrics_mst.txt"
    python cli/all_metrics.py --single --syn_root "$VOC_OUT/hifigan_mst_T${T}" \
        --raw_folder "$CORPUS/raw/SYN" --data_type LJSpeech \
        --metrics mcd mcd_dctmel ffe ssim f0_rmse 2>&1 | tail -6 \
        | tee -a "$VOC_OUT/metrics_mst.txt"
  done
}
run vocode_mst vocode_mst

# post-fix bench validation: trained weights must now match the
# random-init RTF (the param-upload regression is gone)
run bench_check python bench.py

echo "== round-4d queue complete =="
