#!/usr/bin/env bash
# Corpus normalization + feature extraction (reference deal_data_Lj.sh)
set -e
python3 cli/prepare_align.py --dataset VCTK
python3 cli/preprocess.py --dataset VCTK
