#!/usr/bin/env bash
# RTF benchmark (reference rtf_cm.sh)
set -e
python3 cli/p_rtf_cm.py --source ./preprocessed_data/VCTK/val.txt \
    --restore_step ${RESTORE_STEP:-300000} --mode batch --dataset VCTK "$@"
