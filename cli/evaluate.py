"""Validation-loss CLI (reference ``evaluate.py`` surface: ``evaluate_cm``
runs the conditioning net + variance losses over val.txt — reference
evaluate.py:268-366 stubs the mel term at :299; here the fused one-step
sampler adds a true validation mel L1 (``--mel_loss``, on by default)
since the limitation needn't be inherited)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def evaluate_cm(cfg, params, max_batches=None, with_mel=True, seed=42):
    import jax
    from cmtts_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from cmtts_tpu.cm.losses import variance_loss
    from cmtts_tpu.data.dataset import FeatureDataset, batch_iterator
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.text import sil_phonemes_ids

    model = CMTTS(cfg)
    sil_ids = tuple(sil_phonemes_ids())
    synth_step = None
    if with_mel:
        from cmtts_tpu.train.loop import make_synthesize_step

        synth_step = make_synthesize_step(model, cfg)

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

    dataset = FeatureDataset("val.txt", cfg, sort=False, drop_last=False,
                             cache_in_ram=False)  # single pass
    totals, all_losses = [], {}
    n = 0
    for batch in batch_iterator(dataset, cfg.train.batch_size, group_size=1,
                                shuffle=False, epochs=1):
        clean = {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}
        total, losses = eval_batch(params, clean)
        totals.append(float(total))
        for k, v in losses.items():
            all_losses.setdefault(k, []).append(float(v))
        if synth_step is not None:
            _, mel_l1 = synth_step(
                params, clean,
                jax.random.fold_in(jax.random.PRNGKey(seed), n))
            all_losses.setdefault("mel_onestep_l1", []).append(float(mel_l1))
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
    parser.add_argument("--no_mel_loss", action="store_true",
                        help="skip the one-step synthesis mel L1 "
                             "(reference-faithful variance-only mode)")
    parser.add_argument("--params_role", type=str, default="target_model",
                        help="checkpoint role to evaluate (the one-step "
                             "sampler uses the target network in training)")
    parser.add_argument("--path_tag", type=str, default="",
                        help="checkpoint-dir suffix (matches train_cm "
                             "--path_tag, e.g. a distillation run)")
    args = parser.parse_args()

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.train.checkpoint import restore_checkpoint

    cfg = load_configs(args.dataset, args.config_root)
    if args.path_tag:
        import dataclasses

        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ckpt_path=cfg.train.ckpt_path + f"_{args.path_tag}"))
    payload = restore_checkpoint(cfg.train.ckpt_path, args.restore_step or None)
    if args.params_role not in payload:
        raise SystemExit(f"role {args.params_role!r} not in checkpoint "
                         f"(roles: {sorted(payload)})")
    role = args.params_role
    summary = evaluate_cm(cfg, payload[role], args.max_batches,
                          with_mel=not args.no_mel_loss)
    print("validation losses:")
    for k, v in summary.items():
        print(f"  {k}: {v:.5f}")


if __name__ == "__main__":
    main()
