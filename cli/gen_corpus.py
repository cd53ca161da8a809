"""Generate the deterministic parametric corpus + a patched config root.

Produces everything the standard pipeline needs under one root dir:

    <root>/raw/SYN/*.wav|.lab          (prepare_align output layout)
    <root>/pre/TextGrid/LJSpeech/*.TextGrid
    <root>/config/LJSpeech/*.yaml      (paths pointed into <root>)

Then:  python cli/preprocess.py --dataset LJSpeech --config_root <root>/config
       python cli/train_cm.py  --model consistency_training --dataset LJSpeech \
           --config_root <root>/config ...

Usage: python cli/gen_corpus.py --out /tmp/syncorpus [--n 200] [--seed 1234]
           [--val_size 16] [--batch_size 32] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_config_root(root: str, repo_cfg_dir: str, val_size: int,
                      batch_size: int, tiny: bool = False,
                      max_seq_len: int | None = None,
                      save_step: int | None = None,
                      log_step: int | None = None) -> str:
    """Copy config/LJSpeech/*.yaml with paths re-pointed into ``root``."""
    import yaml

    cfg_dir = os.path.join(root, "config", "LJSpeech")
    os.makedirs(cfg_dir, exist_ok=True)

    with open(os.path.join(repo_cfg_dir, "preprocess.yaml")) as f:
        pre = yaml.safe_load(f)
    pre["path"]["raw_path"] = os.path.join(root, "raw")
    pre["path"]["preprocessed_path"] = os.path.join(root, "pre")
    pre["preprocessing"]["val_size"] = val_size
    with open(os.path.join(repo_cfg_dir, "model.yaml")) as f:
        model = yaml.safe_load(f)
    if max_seq_len:
        model["max_seq_len"] = max_seq_len
    if tiny:
        model["transformer"]["encoder_layer"] = 1
        model["transformer"]["encoder_hidden"] = 32
        model["transformer"]["decoder_hidden"] = 32
        model["denoiser"]["residual_layers"] = 2
        model["denoiser"]["residual_channels"] = 32
    with open(os.path.join(repo_cfg_dir, "train.yaml")) as f:
        train = yaml.safe_load(f)
    train["path"] = {k: os.path.join(root, "output", os.path.basename(v))
                     for k, v in train["path"].items()}
    train["optimizer"]["batch_size"] = batch_size
    if save_step:
        train["step"]["save_step"] = save_step
    if log_step:
        train["step"]["log_step"] = log_step
    for name, blob in (("preprocess.yaml", pre), ("model.yaml", model),
                       ("train.yaml", train)):
        with open(os.path.join(cfg_dir, name), "w") as f:
            yaml.safe_dump(blob, f, sort_keys=False)
    return os.path.join(root, "config")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--val_size", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--words_min", type=int, default=3)
    ap.add_argument("--words_max", type=int, default=7)
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the model config for CPU smoke runs")
    ap.add_argument("--save_step", type=int, default=None)
    ap.add_argument("--log_step", type=int, default=None)
    args = ap.parse_args()

    from cmtts_tpu.data.synthcorpus import generate_corpus

    raw = os.path.join(args.out, "raw")
    pre = os.path.join(args.out, "pre")
    names = generate_corpus(raw, pre, n_utts=args.n, seed=args.seed,
                            n_words=(args.words_min, args.words_max))
    repo_cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "config", "LJSpeech")
    cfg_root = write_config_root(args.out, repo_cfg, args.val_size,
                                 args.batch_size, tiny=args.tiny,
                                 save_step=args.save_step,
                                 log_step=args.log_step)
    print(f"==> {len(names)} utterances under {raw}")
    print(f"==> config root: {cfg_root}")


if __name__ == "__main__":
    main()
