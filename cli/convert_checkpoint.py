"""Convert reference PyTorch checkpoints into this framework's Orbax
layout, so a user of XiangLi2022/CM-TTS can switch and synthesize
directly from their trained models.

    python cli/convert_checkpoint.py --dataset LJSpeech \
        --model_pt  .../model300000.pt \
        [--target_pt .../target_model300000.pt] \
        [--ema_pt .../ema_0.9999_300000.pt ...] \
        [--step 300000]

    # HiFi-GAN vocoder (weight norm folded):
    python cli/convert_checkpoint.py --dataset LJSpeech \
        --hifigan_pt .../generator_LJSpeech.pth.tar --hifigan_out gen.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_root", type=str, default=None)
    parser.add_argument("--model_pt", type=str, default=None)
    parser.add_argument("--target_pt", type=str, default=None)
    parser.add_argument("--ema_pt", type=str, nargs="*", default=[])
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step (parsed from the filename "
                             "when omitted, reference train_util.py:935-947)")
    parser.add_argument("--out", type=str, default=None,
                        help="checkpoint root (default: cfg.train.ckpt_path)")
    parser.add_argument("--hifigan_pt", type=str, default=None)
    parser.add_argument("--hifigan_out", type=str, default=None)
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from cmtts_tpu.core.config import load_configs

    cfg = load_configs(args.dataset, args.config_root)

    if args.hifigan_pt:
        from cmtts_tpu.models.hifigan import HiFiGANConfig, load_hifigan_params

        params = load_hifigan_params(args.hifigan_pt, cfg)
        out = args.hifigan_out or (args.hifigan_pt + ".npz")
        flat = {}

        def walk(node, prefix=""):
            for k, v in node.items():
                key = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    walk(v, key)
                else:
                    flat[key] = np.asarray(v)

        walk(params)
        np.savez(out, **flat)
        print(f"==> HiFi-GAN params -> {out}")

    if args.model_pt:
        import re

        import jax
        import orbax.checkpoint as ocp

        from cmtts_tpu.convert.from_torch import load_torch_cm_checkpoint

        step = args.step
        if step is None:
            m = re.search(r"(\d+)\.pt$", os.path.basename(args.model_pt))
            step = int(m.group(1)) if m else 0

        payload = {"step": step,
                   "model": load_torch_cm_checkpoint(args.model_pt, cfg)}
        payload["target_model"] = (
            load_torch_cm_checkpoint(args.target_pt, cfg)
            if args.target_pt else payload["model"])
        for i, ema in enumerate(args.ema_pt):
            payload[f"ema_{i}"] = load_torch_cm_checkpoint(ema, cfg)
        for i in range(len(args.ema_pt), len(cfg.train.cm.ema_rate)):
            payload[f"ema_{i}"] = payload["model"]
        # fresh optimizer state: resuming TRAINING from a converted torch
        # ckpt restarts optimizer moments (the reference's opt.pt is
        # torch-RAdam-specific)
        from cmtts_tpu.train.state import make_optimizer

        payload["opt"] = jax.device_get(
            make_optimizer(cfg.train.cm.lr).init(payload["model"]))

        root = args.out or cfg.train.ckpt_path
        path = os.path.join(os.path.abspath(root), "CMDenoiserTTS",
                            f"step_{step:08d}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        print(f"==> converted checkpoint -> {path}")
        print(f"    synthesize with: python cli/synthesize.py --dataset "
              f"{args.dataset} --restore_step {step} ...")


if __name__ == "__main__":
    main()
