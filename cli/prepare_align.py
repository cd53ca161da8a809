"""Corpus normalization driver (reference ``prepare_align.py`` surface)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_root", type=str, default=None)
    args = parser.parse_args()

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.data.prepare import PREPARERS

    cfg = load_configs(args.dataset, args.config_root)
    PREPARERS[cfg.data.dataset](cfg)


if __name__ == "__main__":
    main()
