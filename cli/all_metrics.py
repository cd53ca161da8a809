"""Offline metric harness driver (reference ``all_metrics.py`` __main__ +
``all_metrics_ljspeech.py``).

    python cli/all_metrics.py --syn_root output/result/LJSpeech_cm \
        --raw_folder raw_data/LJSpeech --data_type LJSpeech \
        --metrics mcd ffe ssim
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--syn_root", type=str, required=True,
                        help="folder containing per-step result subdirs, or "
                             "a single results dir (with --single)")
    parser.add_argument("--raw_folder", type=str, required=True)
    parser.add_argument("--data_type", type=str, default="LJSpeech",
                        choices=["LJSpeech", "VCTK", "LibriTTS"])
    parser.add_argument("--metrics", nargs="+", required=True,
                        help="e.g. mcd mcd24 mcd_dctmel ffe ssim f0_rmse "
                             "f0_corr mfcc_cos si_sdr fid_mel fid_mfcc "
                             "precision_mel recall_mel speaker_cos "
                             "mfcc_gmm_kl wer mb_mos ld_mos")
    parser.add_argument("--single", action="store_true",
                        help="treat --syn_root as one results dir")
    parser.add_argument("--file_find_type", type=str, default=None,
                        choices=[None, "key_step", "only_end"])
    parser.add_argument("--max_pairs", type=int, default=None)
    parser.add_argument("--mos_ckpt", type=str, default=None,
                        help="local MBNet torch checkpoint for mb_mos")
    parser.add_argument("--ld_ckpt", type=str, default=None,
                        help="local LDNet torch checkpoint for ld_mos")
    parser.add_argument("--ld_config", type=str, default=None,
                        help="LDNet config.yml accompanying --ld_ckpt")
    parser.add_argument("--asr_model", type=str, default=None,
                        help="local whisper-weights dir (or hub id) for wer")
    parser.add_argument("--speaker_embedder_ckpt", type=str, default=None,
                        help="GE2E checkpoint (.npy from cli/train_ge2e.py "
                             "or torch .pt) for speaker_cos; random-init "
                             "encoder if omitted (reference uses "
                             "Resemblyzer, all_metrics.py:561-601)")
    parser.add_argument("--meta_txt", nargs="*", default=None,
                        help="train/val.txt metadata files supplying "
                             "reference transcripts for wer")
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from cmtts_tpu.metrics import Cal, CalOneModel

    mos_kw = dict(mos_ckpt=args.mos_ckpt, ld_ckpt=args.ld_ckpt,
                  ld_config=args.ld_config, transcriber=args.asr_model,
                  meta_txt=args.meta_txt)
    if args.speaker_embedder_ckpt:
        from cmtts_tpu.models.speaker import GE2EInference, load_ge2e_params

        inf = GE2EInference(load_ge2e_params(args.speaker_embedder_ckpt))
        mos_kw["speaker_embedder"] = inf.embed_utterance
    if args.single:
        cal = Cal(args.syn_root, data_type=args.data_type,
                  raw_folder=args.raw_folder, max_pairs=args.max_pairs,
                  **mos_kw)
        vals = cal.get_metrics_by_list(args.metrics)
        for name, val in zip(args.metrics, vals):
            print(f"{name}: {val:.6f}")
    else:
        tool = CalOneModel(args.syn_root, raw_folder=args.raw_folder,
                           data_type=args.data_type,
                           file_find_type=args.file_find_type,
                           max_pairs=args.max_pairs, **mos_kw)
        csv_path = tool.get_model_metrics_by_list(args.metrics)
        print(f"wrote {csv_path}")


if __name__ == "__main__":
    main()
