#!/usr/bin/env bash
# One-command quality-parity harness: the moment reference assets exist
# (a trained reference checkpoint + corpus), this produces the MCD/F0
# table comparable to BASELINE.md — convert -> synthesize val set at
# T=1/2/4 -> CalOneModel CSV.
#
# Reference flow being reproduced: synthesize_lj.sh + all_metrics_ljspeech.py.
#
# Usage:
#   scripts/parity_run.sh <dataset> <model.pt|orbax_step_dir> \
#       [--vocoder <generator.pth.tar>] [--raw <raw_wav_folder>] \
#       [--config_root <dir>] [--metrics "mcd mcd24 f0_rmse ffe ssim"] \
#       [--steps "1 2 4"]
#
# Example:
#   scripts/parity_run.sh LJSpeech ckpts/model300000.pt \
#       --vocoder hifigan/generator_LJSpeech.pth.tar \
#       --raw raw_data/LJSpeech
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET=${1:?usage: parity_run.sh <dataset> <model.pt> [options]}
CKPT=${2:?need a reference model .pt (or converted orbax step dir)}
shift 2

VOCODER="" RAW="" CONFIG_ROOT="" METRICS="mcd mcd24 mcd_dctmel f0_rmse f0_corr ffe ssim" STEPS="1 2 4"
while [[ $# -gt 0 ]]; do
  case "$1" in
    --vocoder) VOCODER="$2"; shift 2 ;;
    --raw) RAW="$2"; shift 2 ;;
    --config_root) CONFIG_ROOT="$2"; shift 2 ;;
    --metrics) METRICS="$2"; shift 2 ;;
    --steps) STEPS="$2"; shift 2 ;;
    *) echo "unknown option $1" >&2; exit 2 ;;
  esac
done

CR_FLAG=()
[[ -n "$CONFIG_ROOT" ]] && CR_FLAG=(--config_root "$CONFIG_ROOT")

# resolve config paths (val.txt source, result root, raw default)
eval "$(python - "$DATASET" ${CONFIG_ROOT:+$CONFIG_ROOT} <<'EOF'
import sys
from cmtts_tpu.core.config import load_configs
cfg = load_configs(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
print(f'PRE_DIR="{cfg.data.preprocessed_path}"')
print(f'RESULT_ROOT="{cfg.train.result_path}_cm"')
print(f'RAW_DEFAULT="{cfg.data.raw_path}/{sys.argv[1]}"')
EOF
)"
RAW=${RAW:-$RAW_DEFAULT}

# 1. convert the reference torch checkpoint (no-op if already an orbax dir)
if [[ "$CKPT" == *.pt ]]; then
  python cli/convert_checkpoint.py --dataset "$DATASET" "${CR_FLAG[@]}" \
      --model_pt "$CKPT"
  STEP=$(python -c "
import re, sys
m = re.search(r'(\d+)(?=\.pt$)', '$CKPT')
print(int(m.group(1)) if m else 0)")
else
  STEP=$(python -c "
import re
m = re.search(r'step_(\d+)', '$CKPT')
print(int(m.group(1)) if m else 0)")
fi
echo "==> parity run: dataset=$DATASET step=$STEP metrics='$METRICS'"

# 2. synthesize the validation set at each sampler budget
VOC_FLAG=()
[[ -n "$VOCODER" ]] && VOC_FLAG=(--vocoder_ckpt "$VOCODER")
for T in $STEPS; do
  python cli/synthesize.py --mode batch --source "$PRE_DIR/val.txt" \
      --dataset "$DATASET" "${CR_FLAG[@]}" --T "$T" \
      --restore_step "$STEP" "${VOC_FLAG[@]}"
done

# 3. metric table over every step_*_T* results dir -> CSV
python cli/all_metrics.py --syn_root "$RESULT_ROOT" --raw_folder "$RAW" \
    --data_type "$DATASET" --metrics $METRICS
echo "==> parity table written under $RESULT_ROOT"
