"""Validation-loss CLI (reference ``evaluate.py`` surface: ``evaluate_cm``
runs the conditioning net + variance losses over val.txt, mel term
stubbed — reference evaluate.py:268-366)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def evaluate_cm(cfg, params, max_batches=None):
    import jax
    import jax.numpy as jnp

    from cmtts_tpu.cm.losses import variance_loss
    from cmtts_tpu.data.dataset import FeatureDataset, batch_iterator
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.text import sil_phonemes_ids

    model = CMTTS(cfg)
    sil_ids = tuple(sil_phonemes_ids())

    @jax.jit
    def eval_batch(params, batch):
        cond_out = model.apply(
            {"params": params},
            speakers=batch["speakers"], texts=batch["texts"],
            src_lens=batch["src_lens"], t_mel=batch["mels"].shape[1],
            mel2ph=batch["mel2ph"], d_targets=batch["d_targets"],
            p_targets=batch["p_targets"], e_targets=batch["e_targets"],
            spker_embeds=batch.get("spker_embeds"),
            deterministic=True, method=CMTTS.condition)
        total, losses = variance_loss(cond_out, batch, cfg, sil_ids)
        return total, losses

    dataset = FeatureDataset("val.txt", cfg, sort=False, drop_last=False)
    totals, all_losses = [], {}
    n = 0
    for batch in batch_iterator(dataset, cfg.train.batch_size, group_size=1,
                                shuffle=False, epochs=1):
        clean = {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}
        total, losses = eval_batch(params, clean)
        totals.append(float(total))
        for k, v in losses.items():
            all_losses.setdefault(k, []).append(float(v))
        n += 1
        if max_batches and n >= max_batches:
            break
    summary = {"total": float(np.mean(totals))}
    summary.update({k: float(np.mean(v)) for k, v in all_losses.items()})
    return summary


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_root", type=str, default=None)
    parser.add_argument("--max_batches", type=int, default=None)
    args = parser.parse_args()

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.train.checkpoint import restore_checkpoint

    cfg = load_configs(args.dataset, args.config_root)
    payload = restore_checkpoint(cfg.train.ckpt_path, args.restore_step or None)
    summary = evaluate_cm(cfg, payload["model"], args.max_batches)
    print("validation losses:")
    for k, v in summary.items():
        print(f"  {k}: {v:.5f}")


if __name__ == "__main__":
    main()
