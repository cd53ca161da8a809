#!/usr/bin/env bash
# Round-5 queue, revision C — deadline-driven reprioritization of rev B
# after two tunnel-wedge stalls ate ~50 min of chip time:
#
#   1. GE2E FIRST (its serial CPU preprocess is the zero-shot critical
#      path; it overlaps ALL subsequent chip stages)
#   2. qcorp CT tail + synthesis + GL metrics
#   3. HiFi-GAN vocoder leg (needed by quality artifact + serving)
#   4. maskstd A/B -> first artifact collection
#   5. zero-shot chip leg (VERDICT #2) BEFORE serve/bench
#   6. serve sweep, bench x2
#   7. CD-on-CT leg (r04-protocol comparability; demoted — the r04 run
#      already showed it's a protocol demo, and true-CD-from-EDM is
#      below it in the VERDICT ranking)
#   8. det-prosody flagship leg, roofline, ablation, EDM (run in that
#      order with whatever chip time remains)
#
# Stages resume via $LOGS/.r5_* markers + --restore_step -1 / --resume.
# zs_preprocess / zs_chip are gated on the GE2E holdout gate passing.
set -uo pipefail
cd "$(dirname "$0")/.."

QC=${QC:-/tmp/qcorp}
DET=${DET:-/tmp/qcorp_det}
VOC_OUT=${VOC_OUT:-/tmp/voc_run}
ZS=${ZS:-/tmp/zscorp4}
ZSWORK=${ZSWORK:-/tmp/zs_redo3}
LOGS=${LOGS:-/tmp/r5_logs}
mkdir -p "$LOGS" "$ZSWORK"

run() { # run <name> <cmd...>
  local name=$1; shift
  local marker="$LOGS/.r5_$name.done"
  if [ -f "$marker" ]; then echo "== [$name] already done =="; return 0; fi
  echo "== [$name] start $(date -u +%H:%M:%S) =="
  if "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$marker"
    echo "== [$name] done  $(date -u +%H:%M:%S) =="
  else
    echo "== [$name] FAILED (see $LOGS/$name.log) =="
    return 1
  fi
}

CPU_ENV=(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu)

metrics_dir() { # metrics_dir <syn_dir> <raw_dir> <out_txt> <label>
  echo "-- $4 --" | tee -a "$3"
  python cli/all_metrics.py --single --syn_root "$1" \
      --raw_folder "$2" --data_type LJSpeech \
      --metrics mcd mcd_dctmel ffe ssim f0_rmse 2>&1 | tail -6 | tee -a "$3"
}

# ---- 1. zero-shot embedder first: its serial preprocess overlaps
#         everything below ---------------------------------------------
run zs_ge2e python cli/train_ge2e.py --wav_root "$ZS/raw" \
    --work_dir "$ZS/ge2e" --total_steps 12000 --val_speakers 6 \
    --eval_every 500 --patience 4

run zs_gate "${CPU_ENV[@]}" python tools/check_ge2e_holdout.py \
    --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" \
    --holdout_root "$ZS/raw_holdout" --train_root "$ZS/raw" \
    --min_top1 0.75 --min_margin 0.0 --out "$ZSWORK/ge2e_gate.json"

if [ -f "$LOGS/.r5_zs_gate.done" ] && [ ! -f "$LOGS/.r5_zs_preprocess.done" ]; then
  ( if "${CPU_ENV[@]}" python cli/preprocess.py --dataset VCTK \
        --config_root "$ZS/config" \
        --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" --workers 1 \
        >"$LOGS/zs_preprocess.log" 2>&1; then
      touch "$LOGS/.r5_zs_preprocess.done"
    fi ) &
  echo "== [zs_preprocess] running in CPU lane (pid $!) =="
fi

# ---- 2. qcorp CT tail + GL synthesis/metrics --------------------------
run qA env CORPUS="$QC" CT_STEPS=20000 RUN_VOCODER=0 RUN_CD=0 \
    bash tools/run_quality_pipeline.sh

# ---- 3. HiFi-GAN vocoder leg ------------------------------------------
run voc env CORPUS="$QC" OUT="$VOC_OUT" CT_STEPS=20000 \
    bash tools/run_vocoder_quality.sh

# ---- 4. maskstd A/B + first artifact snapshot --------------------------
run maskstd_ab env CORPUS="$QC" CT_STEPS=20000 VOC_OUT="$VOC_OUT" \
    bash tools/run_maskstd_ab.sh

run collect1 python tools/collect_quality_r05.py --out QUALITY_r05.json

# ---- 5. zero-shot chip leg (VERDICT #2) --------------------------------
zs_wait_preprocess() {
  [ -f "$LOGS/.r5_zs_gate.done" ] || {
    echo "GE2E gate did not pass; skipping zero-shot"; return 1; }
  for i in $(seq 1 720); do
    [ -f "$LOGS/.r5_zs_preprocess.done" ] && return 0
    sleep 10
  done
  echo "zs preprocess never finished"; return 1
}
run zs_wait2 zs_wait_preprocess

if [ -f "$LOGS/.r5_zs_wait2.done" ]; then
  run zs_chip env CORPUS="$ZS" STEPS=8000 OUT="$ZSWORK" \
      bash tools/run_zeroshot_quality.sh
fi

run collect2 python tools/collect_quality_r05.py --out QUALITY_r05.json

# ---- 6. serving re-sweep + bench x2 ------------------------------------
serve_sweep() {
  local GEN
  GEN=$(ls "$VOC_OUT"/hifigan/hifigan_gen_*.npz | tail -1)
  env CORPUS="$QC" STEP=20000 PORT=18325 VOC=hifigan VOC_CKPT="$GEN" \
      OUT=SERVE_r05.json bash tools/run_serve_bench.sh
}
run serve serve_sweep

run bench1 python bench.py
run bench2 python bench.py

# ---- 7. CD-on-CT comparability leg (demoted) ---------------------------
run qD env CORPUS="$QC" CT_STEPS=20000 CD_STEPS=4000 \
    RUN_VOCODER=0 RUN_CD=1 bash tools/run_quality_pipeline.sh

run collect3 python tools/collect_quality_r05.py --out QUALITY_r05.json

# ---- 8. det-prosody flagship leg, roofline, ablation, EDM --------------
run det_pipeline env CORPUS="$DET" CT_STEPS=20000 RUN_VOCODER=0 RUN_CD=0 \
    GEN_ARGS="--det_prosody" CT_ARGS="--cwt_masked_std" \
    bash tools/run_quality_pipeline.sh

det_vocode() {
  local GEN
  GEN=$(ls "$VOC_OUT"/hifigan/hifigan_gen_*.npz | tail -1)
  : > "$DET/metrics_det_hifigan.txt"
  for T in 1 2 4; do
    local SRC="step_20000_T${T}"
    python tools/vocode_dir.py \
        --mel_dir "$DET/output/result/LJSpeech_cm/$SRC" \
        --ckpt "$GEN" --out "$DET/hifigan_$SRC" || return 1
    metrics_dir "$DET/hifigan_$SRC" "$DET/raw/SYN" \
        "$DET/metrics_det_hifigan.txt" "det hifigan_$SRC"
  done
  mkdir -p "$DET/gtmel"
  python - "$DET" <<'EOF'
import os, shutil, sys
det = sys.argv[1]
val = [l.split("|")[0] for l in open(os.path.join(det, "pre", "val.txt"))]
for b in val:
    shutil.copy(os.path.join(det, "pre", "mel", f"SYN-mel-{b}.npy"),
                os.path.join(det, "gtmel", f"SYN-mel-{b}.npy"))
EOF
  python tools/vocode_dir.py --mel_dir "$DET/gtmel" --ckpt "$GEN" \
      --out "$DET/hifigan_gtmel" || return 1
  metrics_dir "$DET/hifigan_gtmel" "$DET/raw/SYN" \
      "$DET/metrics_det_hifigan.txt" "det hifigan_gtmel (floor)"
}
run det_vocode det_vocode

run roofline python tools/roofline.py --out ROOFLINE_r05.json

run collect4 python tools/collect_quality_r05.py --out QUALITY_r05.json

abl_one() { # abl_one <sampler> <seed> <tag>
  local SAMP=$1 SEED=$2 TAG=$3
  python cli/train_cm.py --model consistency_training --dataset LJSpeech \
      --config_root "$QC/config" --total_step 20000 --bf16 \
      --steps_per_call 8 --restore_step -1 --schedule_sampler "$SAMP" \
      --seed "$SEED" --log_every 1000 --path_tag "$TAG" \
  && python cli/synthesize.py --mode batch --source "$QC/pre/val.txt" \
      --dataset LJSpeech --config_root "$QC/config" --T 1 \
      --restore_step 20000 --vocoder griffinlim \
      --params_role target_model --path_tag "$TAG" \
  && python cli/all_metrics.py --single \
      --syn_root "$QC/output/result/LJSpeech_cm_${TAG}/step_20000_T1" \
      --raw_folder "$QC/raw/SYN" --data_type LJSpeech \
      --metrics mcd mcd_dctmel ffe ssim f0_rmse
}
run abl_lsm_s42   abl_one loss-second-moment 42   abl_lsm_s42
run abl_uni_s42   abl_one uniform            42   abl_uni_s42
run abl_lsm_s1337 abl_one loss-second-moment 1337 abl_lsm_s1337
run abl_uni_s1337 abl_one uniform            1337 abl_uni_s1337

run edm_teacher python cli/train_cm.py --model edm --dataset LJSpeech \
    --config_root "$DET/config" --total_step 12000 --bf16 \
    --steps_per_call 8 --restore_step -1 --weight_schedule karras \
    --cwt_masked_std --path_tag edm

edm_synth_metrics() {
  python cli/synthesize.py --mode batch --source "$DET/pre/val.txt" \
      --dataset LJSpeech --config_root "$DET/config" --T 1 \
      --sampler heun --sample_steps 18 --restore_step 12000 \
      --vocoder griffinlim --params_role target_model --path_tag edm \
      || return 1
  : > "$DET/metrics_edm.txt"
  metrics_dir "$DET/output/result/LJSpeech_cm_edm/step_12000_T1_heun18" \
      "$DET/raw/SYN" "$DET/metrics_edm.txt" "edm teacher heun18 (gl)"
}
run edm_synth edm_synth_metrics

run cd_edm python cli/train_cm.py --model consistency_distillation \
    --teacher_path "$DET/output/ckpt/LJSpeech_edm/CMDenoiserTTS/step_00012000" \
    --teacher_role target_model --dataset LJSpeech \
    --config_root "$DET/config" --total_step 6000 --bf16 \
    --steps_per_call 8 --restore_step -1 --cwt_masked_std --path_tag cdedm

cdedm_synth_metrics() {
  : > "$DET/metrics_cdedm.txt"
  for T in 1 2 4; do
    python cli/synthesize.py --mode batch --source "$DET/pre/val.txt" \
        --dataset LJSpeech --config_root "$DET/config" --T "$T" \
        --restore_step 6000 --vocoder griffinlim \
        --params_role target_model --path_tag cdedm || return 1
    metrics_dir "$DET/output/result/LJSpeech_cm_cdedm/step_6000_T${T}" \
        "$DET/raw/SYN" "$DET/metrics_cdedm.txt" "cd-from-edm T${T} (gl)"
  done
}
run cdedm_synth cdedm_synth_metrics

# ---- final collection ---------------------------------------------------
rm -f "$LOGS/.r5_collect_final.done"
run collect_final python tools/collect_quality_r05.py --out QUALITY_r05.json

echo "== round-5 queue (rev C) complete =="
