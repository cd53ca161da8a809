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
    parser.add_argument("--embedder_ckpt", type=str, default=None,
                        help="DeepSpeaker .h5 or GE2E encoder.pt checkpoint "
                             "(random-init embedder if omitted)")
    parser.add_argument("--workers", type=int, default=1,
                        help="parallel feature-extraction processes "
                             "(0 = cpu count; ignored with a speaker "
                             "embedder)")
    args = parser.parse_args()
    if args.workers == 0:
        args.workers = os.cpu_count() or 1

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # host-side pipeline

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.data.preprocessor import Preprocessor

    cfg = load_configs(args.dataset, args.config_root)
    embedder = None
    if cfg.model.multi_speaker and cfg.model.speaker_embedder != "none":
        from cmtts_tpu.models.speaker import PreDefinedEmbedder

        embedder = PreDefinedEmbedder(cfg, args.embedder_ckpt)
        if args.embedder_ckpt is None:
            print("WARNING: no --embedder_ckpt; speaker embeddings use a "
                  "random-init encoder")
    Preprocessor(cfg, speaker_embedder=embedder).build_from_path(
        workers=args.workers)


if __name__ == "__main__":
    main()
