#!/usr/bin/env bash
# Round-5 queue, revision B — same legs as round5_queue.sh but with the
# zero-shot GE2E stage moved directly after CT training so the SERIAL
# zero-shot preprocess (CPU-only: the GE2E embedder is not fork-safe,
# preprocessor.py:218) overlaps the ~2.5 h of remaining chip work
# (vocoder + CD + maskstd + serve + bench) instead of starting after it.
# Cuts the zero-shot critical path by the full preprocess duration.
#
# Chip stages remain strictly serialized; only corpus gen / preprocess
# run in the CPU lane.  All stages resume via $LOGS/.r5_* markers and
# the trainers' --restore_step -1 / --resume auto-resume.
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

# ---- 1a. qcorp CT + GL synthesis/metrics (no vocoder/CD yet) ----------
run qA env CORPUS="$QC" CT_STEPS=20000 RUN_VOCODER=0 RUN_CD=0 \
    bash tools/run_quality_pipeline.sh

# ---- 1b. zero-shot GE2E now, so its SERIAL CPU preprocess overlaps the
#          rest of the chip queue -------------------------------------
run zs_ge2e python cli/train_ge2e.py --wav_root "$ZS/raw" \
    --work_dir "$ZS/ge2e" --total_steps 12000 --val_speakers 6 \
    --eval_every 500 --patience 4

run zs_gate "${CPU_ENV[@]}" python tools/check_ge2e_holdout.py \
    --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" \
    --holdout_root "$ZS/raw_holdout" --train_root "$ZS/raw" \
    --min_top1 0.75 --min_margin 0.0 --out "$ZSWORK/ge2e_gate.json"

if [ ! -f "$LOGS/.r5_zs_preprocess.done" ]; then
  ( if "${CPU_ENV[@]}" python cli/preprocess.py --dataset VCTK \
        --config_root "$ZS/config" \
        --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" --workers 1 \
        >"$LOGS/zs_preprocess.log" 2>&1; then
      touch "$LOGS/.r5_zs_preprocess.done"
    fi ) &
  echo "== [zs_preprocess] running in CPU lane (pid $!) =="
fi

# ---- 1c. vocoder + CD legs of the quality pipeline (stage markers
#          under $QC skip the already-done CT/synth/metrics) -----------
run qB env CORPUS="$QC" CT_STEPS=20000 CD_STEPS=4000 \
    RUN_VOCODER=1 RUN_CD=1 VOC_OUT="$VOC_OUT" \
    bash tools/run_quality_pipeline.sh

run maskstd_ab env CORPUS="$QC" CT_STEPS=20000 VOC_OUT="$VOC_OUT" \
    bash tools/run_maskstd_ab.sh

# first artifact snapshot (re-collected at the end with everything)
run collect1 python tools/collect_quality_r05.py --out QUALITY_r05.json

# ---- 2. serving re-sweep: HiFi-GAN on-device, all buckets primed ------
serve_sweep() {
  local GEN
  GEN=$(ls "$VOC_OUT"/hifigan/hifigan_gen_*.npz | tail -1)
  env CORPUS="$QC" STEP=20000 PORT=18325 VOC=hifigan VOC_CKPT="$GEN" \
      OUT=SERVE_r05.json bash tools/run_serve_bench.sh
}
run serve serve_sweep

# ---- 3. bench.py driver-style, twice (reproducibility gate) -----------
run bench1 python bench.py
run bench2 python bench.py

# ---- 4. zero-shot chip leg (preprocess should be done by now) ---------
zs_wait_preprocess() {
  for i in $(seq 1 720); do
    [ -f "$LOGS/.r5_zs_preprocess.done" ] && return 0
    sleep 10
  done
  echo "zs preprocess never finished"; return 1
}
run zs_wait2 zs_wait_preprocess

run zs_chip env CORPUS="$ZS" STEPS=8000 OUT="$ZSWORK" \
    bash tools/run_zeroshot_quality.sh

run collect2 python tools/collect_quality_r05.py --out QUALITY_r05.json

# ---- 5. det-prosody flagship leg --------------------------------------
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

# ---- 6. roofline measurements (chip, quick — warm graphs) -------------
run roofline python tools/roofline.py --out ROOFLINE_r05.json

run collect3 python tools/collect_quality_r05.py --out QUALITY_r05.json

# ---- 7. LSM ablation (qcorp, warm graphs; runs only if time remains;
#         linear12/seed-42/20k = the qA CT run) ------------------------
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

# ---- 8. EDM teacher + true CD (lowest VERDICT rank) -------------------
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

# ---- final collection --------------------------------------------------
rm -f "$LOGS/.r5_collect_final.done"
run collect_final python tools/collect_quality_r05.py --out QUALITY_r05.json

echo "== round-5 queue (rev B) complete =="
