"""Feature-extraction driver (reference ``preprocess.py`` surface)."""

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

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # host-side pipeline

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.data.preprocessor import Preprocessor

    cfg = load_configs(args.dataset, args.config_root)
    Preprocessor(cfg).build_from_path()


if __name__ == "__main__":
    main()
