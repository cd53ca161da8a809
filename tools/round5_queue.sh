#!/usr/bin/env bash
# Round-5 execution queue — regenerate & COMMIT the round-4 evidence
# (/tmp was wiped between rounds) plus the round-4 VERDICT's new legs:
#
#   1. qcorp quality pipeline @ CT 20k (r04-comparable: random prosody,
#      maskstd OFF at train) + HiFi-GAN vocoder leg + CD-on-CT leg
#      + maskstd synthesis A/B                       [VERDICT #1]
#   2. DET-prosody corpus leg: text-predictable accents + fixed f0
#      register, CT 20k trained WITH --cwt_masked_std (the flagship
#      config), HiFi-GAN vocoded + per-corpus floors  [VERDICT #6]
#   3. EDM diffusion teacher (20k) + TRUE consistency distillation
#      from it (8k) on the det corpus                 [VERDICT #7]
#   4. zero-shot redo3: 130 voices, like-for-like GE2E holdout gate
#      (CPU corpus gen runs in a parallel lane)       [VERDICT #2]
#   5. LSM ablation with power: 3 samplers x 2 seeds x 20k steps
#      + per-noise-level loss curves                  [VERDICT #5]
#   6. serving re-sweep (HiFi-GAN on-device, all buckets primed)
#                                                     [VERDICT #4]
#   7. bench.py driver-style x2 (reproducibility check) [VERDICT #3]
#
# One TPU chip: all device jobs are serialized in this script; only
# pure-CPU stages (corpus gen) run in a parallel lane.  Stages are
# resumable via .done markers under $LOGS.
set -uo pipefail
cd "$(dirname "$0")/.."

QC=${QC:-/tmp/qcorp}           # r04-comparable corpus
DET=${DET:-/tmp/qcorp_det}     # deterministic-prosody corpus
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

# ---- parallel CPU lane: the zero-shot corpus (no chip, no GE2E needed)
if [ ! -f "$LOGS/.r5_zs_corpus.done" ]; then
  ( if "${CPU_ENV[@]}" python cli/gen_corpus.py --out "$ZS" --speakers 130 \
        --utts_per_speaker 20 --holdout 2 --val_size 16 \
        >"$LOGS/zs_corpus.log" 2>&1; then
      touch "$LOGS/.r5_zs_corpus.done"
    fi ) &
  ZS_CORPUS_PID=$!
  echo "== [zs_corpus] running in CPU lane (pid $ZS_CORPUS_PID) =="
fi

# ---- 1. qcorp quality pipeline (r04-comparable) -----------------------
run quality env CORPUS="$QC" CT_STEPS=20000 CD_STEPS=4000 \
    RUN_VOCODER=1 RUN_CD=1 VOC_OUT="$VOC_OUT" \
    bash tools/run_quality_pipeline.sh

run maskstd_ab env CORPUS="$QC" CT_STEPS=20000 VOC_OUT="$VOC_OUT" \
    bash tools/run_maskstd_ab.sh

# first artifact snapshot (re-collected at the end with everything)
run collect1 python tools/collect_quality_r05.py --out QUALITY_r05.json

# ---- 2. det-prosody flagship leg --------------------------------------
run det_pipeline env CORPUS="$DET" CT_STEPS=20000 RUN_VOCODER=0 RUN_CD=0 \
    GEN_ARGS="--det_prosody" CT_ARGS="--cwt_masked_std" \
    bash tools/run_quality_pipeline.sh
# (synthesize adopts cwt_masked_std from the checkpoint's run_config)

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
  # per-corpus floors through the SAME qcorp-trained vocoder
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

# ---- 3. EDM diffusion teacher + TRUE consistency distillation ---------
run edm_teacher python cli/train_cm.py --model edm --dataset LJSpeech \
    --config_root "$DET/config" --total_step 20000 --bf16 \
    --steps_per_call 8 --restore_step -1 --weight_schedule karras --cwt_masked_std \
    --path_tag edm

edm_synth_metrics() {
  # teacher quality: heun multi-step sampling from the EMA (target) role
  python cli/synthesize.py --mode batch --source "$DET/pre/val.txt" \
      --dataset LJSpeech --config_root "$DET/config" --T 1 \
      --sampler heun --sample_steps 18 --restore_step 20000 \
      --vocoder griffinlim --params_role target_model --path_tag edm \
      || return 1
  : > "$DET/metrics_edm.txt"
  metrics_dir "$DET/output/result/LJSpeech_cm_edm/step_20000_T1_heun18" \
      "$DET/raw/SYN" "$DET/metrics_edm.txt" "edm teacher heun18 (gl)"
}
run edm_synth edm_synth_metrics

run cd_edm python cli/train_cm.py --model consistency_distillation \
    --teacher_path "$DET/output/ckpt/LJSpeech_edm/CMDenoiserTTS/step_00020000" \
    --teacher_role target_model --dataset LJSpeech \
    --config_root "$DET/config" --total_step 8000 --bf16 \
    --steps_per_call 8 --restore_step -1 --cwt_masked_std --path_tag cdedm

cdedm_synth_metrics() {
  : > "$DET/metrics_cdedm.txt"
  for T in 1 2 4; do
    python cli/synthesize.py --mode batch --source "$DET/pre/val.txt" \
        --dataset LJSpeech --config_root "$DET/config" --T "$T" \
        --restore_step 8000 --vocoder griffinlim \
        --params_role target_model --path_tag cdedm || return 1
    metrics_dir "$DET/output/result/LJSpeech_cm_cdedm/step_8000_T${T}" \
        "$DET/raw/SYN" "$DET/metrics_cdedm.txt" "cd-from-edm T${T} (gl)"
  done
}
run cdedm_synth cdedm_synth_metrics

# ---- 4. zero-shot redo3 (chip stages; corpus from the CPU lane) -------
zs_wait_corpus() {
  for i in $(seq 1 720); do
    [ -f "$LOGS/.r5_zs_corpus.done" ] && return 0
    sleep 10
  done
  echo "zs corpus never finished"; return 1
}
run zs_wait zs_wait_corpus

run zs_ge2e python cli/train_ge2e.py --wav_root "$ZS/raw" \
    --work_dir "$ZS/ge2e" --total_steps 12000 --val_speakers 6 \
    --eval_every 500 --patience 4

run zs_gate "${CPU_ENV[@]}" python tools/check_ge2e_holdout.py \
    --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" \
    --holdout_root "$ZS/raw_holdout" --train_root "$ZS/raw" \
    --min_top1 0.75 --min_margin 0.0 --out "$ZSWORK/ge2e_gate.json"

run zs_preprocess "${CPU_ENV[@]}" python cli/preprocess.py --dataset VCTK \
    --config_root "$ZS/config" --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" \
    --workers 1

run zs_chip env CORPUS="$ZS" STEPS=8000 OUT="$ZSWORK" \
    bash tools/run_zeroshot_quality.sh

# ---- 5. LSM ablation with power: 3 samplers x 2 seeds x 20k -----------
abl_one() { # abl_one <sampler> <seed> <tag>
  local SAMP=$1 SEED=$2 TAG=$3
  python cli/train_cm.py --model consistency_training --dataset LJSpeech \
      --config_root "$DET/config" --total_step 20000 --bf16 \
      --steps_per_call 8 --restore_step -1 --schedule_sampler "$SAMP" --seed "$SEED" \
      --cwt_masked_std --path_tag "$TAG" \
  && python cli/synthesize.py --mode batch --source "$DET/pre/val.txt" \
      --dataset LJSpeech --config_root "$DET/config" --T 1 \
      --restore_step 20000 --vocoder griffinlim \
      --params_role target_model --path_tag "$TAG" \
  && python cli/all_metrics.py --single \
      --syn_root "$DET/output/result/LJSpeech_cm_${TAG}/step_20000_T1" \
      --raw_folder "$DET/raw/SYN" --data_type LJSpeech \
      --metrics mcd mcd_dctmel ffe ssim f0_rmse
}
for SAMP in uniform linear12 loss-second-moment; do
  case $SAMP in
    uniform) S=uni;; linear12) S=l12;; *) S=lsm;;
  esac
  for SEED in 42 1337; do
    run "abl_${S}_s${SEED}" abl_one "$SAMP" "$SEED" "abl_${S}_s${SEED}"
  done
done

# ---- 6. serving re-sweep: HiFi-GAN on-device, all buckets primed ------
serve_sweep() {
  local GEN
  GEN=$(ls "$VOC_OUT"/hifigan/hifigan_gen_*.npz | tail -1)
  env CORPUS="$QC" STEP=20000 PORT=18325 VOC=hifigan VOC_CKPT="$GEN" \
      OUT=SERVE_r05.json bash tools/run_serve_bench.sh
}
run serve serve_sweep

# ---- 7. bench.py driver-style, twice (reproducibility gate) -----------
run bench1 python bench.py
run bench2 python bench.py

# ---- final collection --------------------------------------------------
rm -f "$LOGS/.r5_collect_final.done"
run collect_final python tools/collect_quality_r05.py --out QUALITY_r05.json

echo "== round-5 queue complete =="
