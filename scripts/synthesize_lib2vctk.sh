#!/usr/bin/env bash
# Zero-shot: LibriTTS-trained model onto VCTK speakers via precomputed
# embeddings (reference synthesize_lib2vctk.sh)
set -e
python3 cli/synthesize_zeroshot.py --mode batch --dataset LibriTTS \
    --source ./preprocessed_data/VCTK/val.txt \
    --spker_embed "${SPKER_EMBED:?set SPKER_EMBED=path/to/<spk>-spker_embed.npy}" \
    --restore_step ${RESTORE_STEP:-300000} --T ${T:-1} --tag lib2vctk "$@"
