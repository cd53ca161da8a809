#!/usr/bin/env bash
# Single-text synthesis (reference single_synthesize_lj.sh)
set -e
python3 cli/synthesize.py --text "${TEXT:-hello world}" --T ${T:-1} \
    --restore_step ${RESTORE_STEP:-300000} --mode single --dataset LJSpeech "$@"
