#!/usr/bin/env bash
# Round-4 execution queue: serializes every chip-side run the round-3
# VERDICT asked for (one TPU chip — no concurrent device jobs).
#
#   1. quality pipeline at CT_STEPS=20000 (prosody-gap leg) + HiFi-GAN
#      vocoder leg + consistency-distillation leg   [VERDICT #1 #2 #5]
#   2. schedule-sampler ablation: uniform / linear12 / loss-second-moment
#      x 6000 steps, T=1 synthesis + metrics        [VERDICT #3]
#   3. zero-shot identity leg (multi-speaker corpus, GE2E, CT, zs synth,
#      identity eval)                               [VERDICT #4]
#
# Stages are resumable via .done markers. Logs under /tmp/r4_logs/.
set -uo pipefail
cd "$(dirname "$0")/.."

CORPUS=${CORPUS:-/tmp/qcorp}
LOGS=/tmp/r4_logs
mkdir -p "$LOGS"

run() { # run <name> <cmd...>
  local name=$1; shift
  local marker="$LOGS/.r4_$name.done"
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

# ---- 1. main quality pipeline (CT 20k + vocoder + CD) ----------------
run quality env CORPUS="$CORPUS" CT_STEPS=20000 CD_STEPS=4000 \
    RUN_VOCODER=1 RUN_CD=1 VOC_OUT=/tmp/voc_run \
    bash tools/run_quality_pipeline.sh

# ---- 2. schedule-sampler ablation ------------------------------------
# 3 runs x 6000 steps on the same corpus; distinct --path_tag so the
# checkpoints/results never clobber; T=1 synthesis + metrics per run.
abl_one() { # abl_one <sampler-name> <tag>
  local SAMP=$1 TAG=$2
  python cli/train_cm.py --model consistency_training --dataset LJSpeech \
      --config_root "$CORPUS/config" --total_step 6000 --bf16 \
      --steps_per_call 8 --schedule_sampler "$SAMP" --path_tag "$TAG" \
  && python cli/synthesize.py --mode batch --source "$CORPUS/pre/val.txt" \
      --dataset LJSpeech --config_root "$CORPUS/config" --T 1 \
      --restore_step 6000 --vocoder griffinlim \
      --params_role target_model --path_tag "$TAG" \
  && python cli/all_metrics.py --single \
      --syn_root "$CORPUS/output/result/LJSpeech_cm_${TAG}/step_6000_T1" \
      --raw_folder "$CORPUS/raw/SYN" --data_type LJSpeech \
      --metrics mcd mcd_dctmel ffe ssim f0_rmse
}
run abl_uniform  abl_one uniform            abl_uni
run abl_linear12 abl_one linear12           abl_l12
run abl_lsm      abl_one loss-second-moment abl_lsm

# ---- 3. zero-shot identity leg ---------------------------------------
ZS=${ZS:-/tmp/zscorp}
run zs_corpus env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python cli/gen_corpus.py --out "$ZS" --speakers 12 \
    --utts_per_speaker 50 --holdout 2
run zs_ge2e python cli/train_ge2e.py --wav_root "$ZS/raw" \
    --work_dir "$ZS/ge2e"
run zs_preprocess env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python cli/preprocess.py --dataset VCTK --config_root "$ZS/config" \
    --embedder_ckpt "$ZS/ge2e/ge2e_params.npy" --workers 1
run zs_chip env CORPUS="$ZS" STEPS=8000 OUT=/tmp/zs_run \
    bash tools/run_zeroshot_quality.sh

echo "== round-4 queue complete =="
