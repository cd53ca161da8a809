#!/usr/bin/env bash
# Zero-shot: LibriTTS-trained model onto an LJSpeech voice via a
# reference wav (reference synthesize_lib2lj.sh)
set -e
python3 cli/synthesize_zeroshot.py --mode batch --dataset LibriTTS \
    --source ./preprocessed_data/LJSpeech/val.txt \
    --ref_wav "${REF_WAV:?set REF_WAV=path/to/reference.wav}" \
    --restore_step ${RESTORE_STEP:-300000} --T ${T:-1} --tag lib2lj "$@"
