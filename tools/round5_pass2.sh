#!/usr/bin/env bash
# Round-5 pass 2 — relaunch after the 07:52 process kill, reorganized for
# the remaining ~2.7h of chip time. Differences vs rev C
# (tools/round5_pass1c.sh):
#   * The HiFi-GAN vocoder leg runs in its OWN chip lane, concurrent with
#     the CT tail (the axon tunnel multiplexes clients at ~70% speed
#     each) — rev C ran them serially and would not have fit.
#   * zs_preprocess (pure CPU) restarts immediately; it failed earlier
#     only because the GE2E embedder did not exist yet.
#   * zs gate / chip leg decisions are made interactively by the
#     session, not hardcoded here (the rev-C gate failed at top1 0.667).
# Every stage keeps the marker-resume pattern so a crash or stall-guard
# kill loses nothing.
set -uo pipefail
cd "$(dirname "$0")/.."

QC=${QC:-/tmp/qcorp}
VOC_OUT=${VOC_OUT:-/tmp/voc_run}
ZS=${ZS:-/tmp/zscorp4}
LOGS=${LOGS:-/tmp/r5_logs}
DEADLINE=${DEADLINE:?epoch seconds}
mkdir -p "$LOGS"

log() { echo "$(date -u +%H:%M:%S) $*" >> "$LOGS/pass2.log"; }

# run <name> <cmd...>: marker-gated, retry-looped until DEADLINE
run() {
  local name=$1; shift
  local marker="$LOGS/.r5_$name.done"
  while [ ! -f "$marker" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
    log "[$name] start"
    if "$@" >>"$LOGS/$name.log" 2>&1; then
      touch "$marker"; log "[$name] done"
    else
      log "[$name] FAILED (see $LOGS/$name.log), retrying in 15s"
      sleep 15
    fi
  done
  [ -f "$marker" ]
}

wait_marker() { # wait_marker <path> [timeout_s]
  local t=${2:-7200} i=0
  while [ ! -f "$1" ] && [ "$i" -lt "$t" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
    sleep 10; i=$((i+10))
  done
  [ -f "$1" ]
}

CPU_ENV=(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu)

# ---------------- CPU lane: zero-shot preprocess -----------------------
zs_cpu_lane() {
  run zs_preprocess "${CPU_ENV[@]}" python cli/preprocess.py \
      --dataset VCTK --config_root "$ZS/config" \
      --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" --workers 1
}

# ---------------- chip lane V: HiFi-GAN vocoder ------------------------
voc_lane() {
  run voc_train python cli/train_hifigan.py --wav_root "$QC/raw" \
      --work_dir "$VOC_OUT/hifigan" --total_steps 10000 --resume \
      --save_every 2500 --log_every 200
  # vocode the CM val mels once the main lane has synthesized them
  wait_marker "$QC/.stage_synth_ct.done" || return 0
  voc_eval() {
    local GEN
    GEN=$(ls "$VOC_OUT"/hifigan/hifigan_gen_*.npz | tail -1) || return 1
    for T in 1 2 4; do
      python tools/vocode_dir.py \
          --mel_dir "$QC/output/result/LJSpeech_cm/step_20000_T${T}" \
          --ckpt "$GEN" --out "$VOC_OUT/hifigan_step_20000_T${T}" || return 1
    done
    mkdir -p "$VOC_OUT/gtmel"
    python - "$QC" "$VOC_OUT" <<'EOF'
import os, shutil, sys
corpus, out = sys.argv[1], sys.argv[2]
val = [l.split("|")[0] for l in open(os.path.join(corpus, "pre", "val.txt"))]
for b in val:
    shutil.copy(os.path.join(corpus, "pre", "mel", f"SYN-mel-{b}.npy"),
                os.path.join(out, "gtmel", f"SYN-mel-{b}.npy"))
EOF
    python tools/vocode_dir.py --mel_dir "$VOC_OUT/gtmel" --ckpt "$GEN" \
        --out "$VOC_OUT/hifigan_gtmel" || return 1
    : > "$VOC_OUT/metrics.txt"
    for D in hifigan_step_20000_T1 hifigan_step_20000_T2 \
             hifigan_step_20000_T4 hifigan_gtmel; do
      echo "-- $D --" | tee -a "$VOC_OUT/metrics.txt"
      "${CPU_ENV[@]}" python cli/all_metrics.py --single \
          --syn_root "$VOC_OUT/$D" --raw_folder "$QC/raw/SYN" \
          --data_type LJSpeech \
          --metrics mcd mcd_dctmel ffe ssim f0_rmse 2>&1 | tail -6 \
          | tee -a "$VOC_OUT/metrics.txt"
    done
  }
  run voc_eval voc_eval
}

# ---------------- chip lane M: main quality sequence -------------------
main_lane() {
  run qA env CORPUS="$QC" CT_STEPS=20000 RUN_VOCODER=0 RUN_CD=0 \
      bash tools/run_quality_pipeline.sh
  run collect1 python tools/collect_quality_r05.py --out QUALITY_r05.json

  # maskstd A/B needs the trained generator for its neural-vocoded side
  wait_marker "$LOGS/.r5_voc_train.done" || return 0
  run maskstd_ab env CORPUS="$QC" CT_STEPS=20000 VOC_OUT="$VOC_OUT" \
      bash tools/run_maskstd_ab.sh
  run collect2 python tools/collect_quality_r05.py --out QUALITY_r05.json
}

echo $$ > /tmp/r5_queue.pid
log "== pass2 supervisor pid $$ deadline $(date -u -d @"$DEADLINE" +%H:%M:%S) =="

zs_cpu_lane &
voc_lane &
main_lane &
wait
log "== pass2 lanes complete =="
