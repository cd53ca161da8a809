"""The jitted consistency-training step.

One fused XLA graph per batch bucket: sample indices -> perturb -> student
denoise -> Euler/Heun to t2 -> target denoise -> loss -> grad -> RAdam ->
EMA x3 -> target-EMA.  Parity with the reference step
(``train_util.py:729-879`` + ``karras_diffusion.py:139-297``), minus the
fp16 loss-scaling machinery (bf16/f32 on TPU needs none — SURVEY §7
hard-part 8).

Under a data-parallel mesh the same function is jitted with sharded batch
/ replicated state; XLA inserts the gradient all-reduce (no DDP hooks).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from cmtts_tpu.cm.karras import KarrasSchedule
from cmtts_tpu.cm.losses import (
    consistency_loss,
    make_denoise_fn,
    masked_mel_l1,
    progdist_loss,
)
from cmtts_tpu.cm.sampling import sample_mel
from cmtts_tpu.core.config import Config
from cmtts_tpu.models.cmtts import CMTTS
from cmtts_tpu.text import sil_phonemes_ids
from cmtts_tpu.train.state import CMTrainState, tree_ema


def schedule_from_config(cfg: Config) -> KarrasSchedule:
    cm = cfg.train.cm
    return KarrasSchedule(
        sigma_data=cm.sigma_data,
        sigma_max=cm.sigma_max,
        sigma_min=cm.sigma_min,
        rho=cm.rho,
        distillation="consistency" in cm.training_mode,
    )


def make_apply_fn(model: CMTTS) -> Callable:
    def apply_fn(params, x_scaled, rescaled_t, batch, rng, deterministic):
        return model.apply(
            {"params": params},
            x_scaled,
            rescaled_t,
            speakers=batch.get("speakers"),
            texts=batch["texts"],
            src_lens=batch["src_lens"],
            mel2ph=batch.get("mel2ph"),
            d_targets=batch.get("d_targets"),
            p_targets=batch.get("p_targets"),
            e_targets=batch.get("e_targets"),
            spker_embeds=batch.get("spker_embeds"),
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng},
        )
    return apply_fn


def make_train_step(model: CMTTS, cfg: Config, tx: optax.GradientTransformation,
                    num_scales: int, donate: bool = True,
                    teacher_params=None, remat: bool = False):
    """Build the jitted train step.

    Signature: (state, batch, probs, rng, target_ema) ->
               (state, metrics dict with per-sample 'indices'/'loss_per_sample'
                for the LSM sampler update).

    ``teacher_params`` (frozen CMTTS params) switches consistency
    TRAINING (Euler step against ground-truth x0) to consistency
    DISTILLATION (Heun step against the teacher's denoiser); with
    ``training_mode: progdist`` the progressive-distillation loss is
    used instead (reference train_util.py:802-879 loss dispatch).

    ``remat=True`` rematerializes the forward under ``jax.checkpoint`` —
    the TPU-idiomatic replacement for the reference's per-module
    CheckpointFunction (cm_tool/nn.py:142-188): trade FLOPs for HBM so
    bigger mel buckets / batches fit.
    """
    sched = schedule_from_config(cfg)
    sil_ids = tuple(sil_phonemes_ids())
    apply_fn = make_apply_fn(model)
    if remat:
        apply_fn = jax.checkpoint(
            apply_fn, static_argnums=(5,),
            policy=jax.checkpoint_policies.dots_saveable)
    ema_rates = cfg.train.cm.ema_rate
    training_mode = cfg.train.cm.training_mode
    if training_mode in ("consistency_distillation", "progdist") and \
            teacher_params is None:
        raise ValueError(f"{training_mode} requires teacher_params")

    def step_fn(state: CMTrainState, batch: dict, probs: jnp.ndarray,
                rng: jnp.ndarray, target_ema: jnp.ndarray):
        x_start = batch["mels"]
        B = x_start.shape[0]
        rng_idx, rng_noise, rng_drop = jax.random.split(rng, 3)

        indices = jax.random.categorical(rng_idx, jnp.log(probs)[None, :],
                                         shape=(B,))
        # unbiased importance weights 1/(K p_i) (resample.py:65-81)
        weights = 1.0 / (probs.shape[0] * probs[indices])
        noise = jax.random.normal(rng_noise, x_start.shape, x_start.dtype)

        teacher_denoise = None
        if teacher_params is not None:
            denoise = make_denoise_fn(apply_fn, sched)

            def teacher_denoise(x_t, sigma):
                out, _ = denoise(teacher_params, x_t, sigma, batch, rng_drop,
                                 True)
                return jax.lax.stop_gradient(out)

        def loss_fn(params):
            if training_mode == "progdist":
                total, aux = progdist_loss(
                    apply_fn, params, teacher_denoise, x_start, noise,
                    indices, num_scales, batch, cfg, sched, sil_ids, rng_drop)
            else:
                total, aux = consistency_loss(
                    apply_fn, params, state.target_params, x_start, noise,
                    indices, num_scales, batch, cfg, sched, sil_ids, rng_drop,
                    teacher_denoise=teacher_denoise)
            loss = (total * weights).mean()
            return loss, (total, aux)

        (loss, (total, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema_params = tuple(
            tree_ema(e, params, r) for e, r in zip(state.ema_params, ema_rates))
        target_params = tree_ema(state.target_params, params, target_ema)

        new_state = CMTrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            target_params=target_params,
        )
        metrics = {
            "loss": loss,
            "cm_loss": (aux["cm_loss"] * weights).mean(),
            "tts_loss": aux["tts_loss"],
            "grad_norm": optax.global_norm(grads),
            "indices": indices,
            "loss_per_sample": total,
        }
        for k in ("pdur", "sdur", "C", "uv", "f0_mean", "f0_std", "energy", "f0"):
            if k in aux:
                metrics[k] = aux[k]
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_synthesize_step(model: CMTTS, cfg: Config):
    """Eval-time one-step synthesis from the *target* network with
    teacher-forced conditioning + masked mel L1 (reference
    ``train_util.py:718-727`` + ``train_cm.py:98-108``)."""
    sched = schedule_from_config(cfg)

    def synth_fn(target_params, batch, rng):
        cond_out = model.apply(
            {"params": target_params},
            speakers=batch.get("speakers"),
            texts=batch["texts"],
            src_lens=batch["src_lens"],
            t_mel=batch["mels"].shape[1],
            mel2ph=batch.get("mel2ph"),
            d_targets=batch.get("d_targets"),
            p_targets=batch.get("p_targets"),
            e_targets=batch.get("e_targets"),
            spker_embeds=batch.get("spker_embeds"),
            deterministic=True,
            method=CMTTS.condition,
        )

        def denoise(x_t, sigma):
            c_skip, c_out, c_in = sched.active_scalings(sigma)
            out = model.apply(
                {"params": target_params},
                c_in[:, None, None] * x_t,
                sched.rescale_t(sigma),
                cond_out["cond"],
                cond_out["speaker_emb"],
                method=CMTTS.denoise,
            )
            return c_out[:, None, None] * out + c_skip[:, None, None] * x_t

        mel = sample_mel(denoise, batch["mels"].shape, rng, sched, "onestep")
        mel_loss = masked_mel_l1(mel, batch["mels"], batch["mel_lens"],
                                 batch["mels"].shape[1])
        return mel, mel_loss

    return jax.jit(synth_fn)
