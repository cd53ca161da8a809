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
    edm_loss,
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


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def make_train_step(model: CMTTS, cfg: Config, tx: optax.GradientTransformation,
                    num_scales: int, donate: bool = True,
                    teacher_params=None, remat: bool = False,
                    microbatch: int | None = None,
                    compute_dtype=None, scan_steps: int | None = None,
                    teacher_sched: KarrasSchedule | None = None,
                    edm_p_mean: float = -1.2, edm_p_std: float = 1.2):
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

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the model forward in
    that dtype — parameters and float batch inputs are cast at the apply
    boundary and outputs cast back, so master params, the optimizer, the
    EMA trees and every loss stay f32 (the TPU-idiomatic replacement for
    the reference's loss-scaled fp16 ``MixedPrecisionTrainer``,
    train_util.py / SURVEY §7.8: bf16 needs no loss scaling).  Cast
    gradients flow back to the f32 leaves through the cast's transpose.

    ``microbatch`` (default: ``cfg.train.cm.microbatch``; <=0 disables)
    accumulates gradients over ``B // microbatch`` slices via
    ``lax.scan`` — the TPU-idiomatic replacement for the reference's
    DDP ``no_sync`` microbatching (train_util.py:805-879, SURVEY §2.8).
    Accumulated grads equal the full-batch grads (mean of equal-sized
    microbatch means) exactly when per-sample losses are independent;
    batch-level masked means (variance losses over ragged lengths)
    renormalize per microbatch — the same semantics as the reference's
    per-microbatch masked means under DDP no_sync.  Slices are
    interleaved (``batch[i::k]``) so that under a batch-sharded mesh
    every device contributes equally to every microbatch (no
    cross-device resharding in the scan).
    """
    sched = schedule_from_config(cfg)
    if teacher_sched is None:
        # CD against a CT teacher (round-4 stand-in) keeps boundary
        # scalings; a TRUE diffusion (edm) teacher must be driven with
        # the plain EDM scalings it was trained under — pass
        # teacher_sched=KarrasSchedule(..., distillation=False)
        teacher_sched = sched
    sil_ids = tuple(sil_phonemes_ids())
    apply_fn = make_apply_fn(model)
    if compute_dtype is not None:
        base_apply = apply_fn

        def apply_fn(params, x_scaled, rescaled_t, batch, rng, deterministic):  # noqa: F811
            # batch targets stay f32 on purpose: pitch/energy bucketize on
            # the TARGET values during teacher forcing, and bf16's ~3
            # decimal digits can flip values near a bin boundary into the
            # neighboring bucket — the same reason pipeline.py keeps the
            # conditioning net f32 at inference.  bf16 params + f32
            # inputs promote the (small) cond net back to f32 compute;
            # the denoiser (the FLOPs) runs bf16 from x_scaled onward.
            out, cond = base_apply(
                _cast_floats(params, compute_dtype),
                x_scaled.astype(compute_dtype),
                rescaled_t,
                batch,
                rng, deterministic)
            return (out.astype(jnp.float32),
                    _cast_floats(cond, jnp.float32))
    if remat:
        apply_fn = jax.checkpoint(
            apply_fn, static_argnums=(5,),
            policy=jax.checkpoint_policies.dots_saveable)
    ema_rates = cfg.train.cm.ema_rate
    training_mode = cfg.train.cm.training_mode
    if training_mode in ("consistency_distillation", "progdist") and \
            teacher_params is None:
        raise ValueError(f"{training_mode} requires teacher_params")
    if microbatch is None:
        microbatch = cfg.train.cm.microbatch

    def micro_loss(params, target_params, mb):
        """Loss over one microbatch pytree {x_start, noise, indices,
        weights, batch}; returns (scalar loss, (per-sample total, aux))."""
        b = mb["batch"]
        teacher_denoise = None
        if teacher_params is not None:
            denoise = make_denoise_fn(apply_fn, teacher_sched)

            def teacher_denoise(x_t, sigma):
                out, _ = denoise(teacher_params, x_t, sigma, b,
                                 mb["rng_drop"], True)
                return jax.lax.stop_gradient(out)

        if training_mode == "edm":
            # mb["indices"] carries the CONTINUOUS lognormal sigmas in
            # edm mode (same pytree slot so the microbatch scan layout
            # is mode-independent)
            total, aux = edm_loss(
                apply_fn, params, mb["x_start"], mb["noise"], mb["indices"],
                b, cfg, sched, sil_ids, mb["rng_drop"])
        elif training_mode == "progdist":
            total, aux = progdist_loss(
                apply_fn, params, teacher_denoise, mb["x_start"], mb["noise"],
                mb["indices"], num_scales, b, cfg, sched, sil_ids,
                mb["rng_drop"])
        else:
            total, aux = consistency_loss(
                apply_fn, params, target_params, mb["x_start"], mb["noise"],
                mb["indices"], num_scales, b, cfg, sched, sil_ids,
                mb["rng_drop"], teacher_denoise=teacher_denoise)
        # mb["weights"] already folds in the sample_valid zero/renorm
        # (done globally in step_fn so microbatch accumulation stays
        # exactly equal to the unpadded batch's gradient)
        loss = (total * mb["weights"]).mean()
        return loss, (total, aux)

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def step_fn(state: CMTrainState, batch: dict, probs: jnp.ndarray,
                rng: jnp.ndarray, target_ema: jnp.ndarray):
        x_start = batch["mels"]
        B = x_start.shape[0]
        rng_idx, rng_noise, rng_drop = jax.random.split(rng, 3)

        if training_mode == "edm":
            # continuous lognormal sigmas (reference LogNormalSampler,
            # resample.py:240-260); schedule-sampler probs are unused
            indices = jnp.clip(
                jnp.exp(edm_p_mean
                        + edm_p_std * jax.random.normal(rng_idx, (B,))),
                sched.sigma_min, sched.sigma_max)
            weights = jnp.ones((B,))
        else:
            indices = jax.random.categorical(
                rng_idx, jnp.log(probs)[None, :], shape=(B,))
            # unbiased importance weights 1/(K p_i) (resample.py:65-81)
            weights = 1.0 / (probs.shape[0] * probs[indices])
        sv = batch.get("sample_valid")
        if sv is not None:
            # padded duplicate rows (pod batch padding): zero their cm
            # contribution and renormalize to the real-sample count over
            # the FULL batch — so with or without microbatch accumulation
            # the gradient equals the unpadded batch's exactly (the
            # variance losses are masked inside variance_loss; their
            # masked means renormalize per microbatch, matching the
            # reference's DDP no_sync semantics)
            weights = weights * sv * (B / jnp.maximum(sv.sum(), 1.0))
        noise = jax.random.normal(rng_noise, x_start.shape, x_start.dtype)

        data = {"x_start": x_start, "noise": noise, "indices": indices,
                "weights": weights, "batch": batch, "rng_drop": rng_drop}

        if 0 < microbatch < B:
            if B % microbatch != 0:
                raise ValueError(
                    f"batch size {B} not divisible by microbatch {microbatch}")
            k = B // microbatch
        else:
            k = 1
        if k <= 1:
            (loss, (total, aux)), grads = grad_fn(
                state.params, state.target_params, data)
        else:
            def to_micro(x):
                # (B, ...) -> (k, B//k, ...) with microbatch i = x[i::k]
                return jnp.moveaxis(
                    x.reshape((B // k, k) + x.shape[1:]), 1, 0)

            mb_data = jax.tree.map(to_micro, {key: data[key] for key in
                                              ("x_start", "noise", "indices",
                                               "weights", "batch")})
            mb_data["rng_drop"] = jax.random.split(rng_drop, k)

            def body(carry, mb):
                g_acc, loss_acc = carry
                (mb_loss, (mb_total, mb_aux)), g = grad_fn(
                    state.params, state.target_params, mb)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, loss_acc + mb_loss), (mb_total, mb_aux)

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, loss_sum), (total_st, aux_st) = jax.lax.scan(
                body, (zeros, jnp.zeros(())), mb_data)
            grads = jax.tree.map(lambda g: g / k, g_sum)
            loss = loss_sum / k
            mb_sz = B // k

            def restore(a):
                # per-sample (k, mb, ...) -> original order (B, ...);
                # scalars (k,) -> mean over microbatches
                if a.ndim >= 2 and a.shape[1] == mb_sz:
                    return jnp.moveaxis(a, 0, 1).reshape((B,) + a.shape[2:])
                return a.mean(0)

            total = restore(total_st)
            aux = jax.tree.map(restore, aux_st)

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
        if training_mode != "edm" and num_scales - 1 <= 8:
            # per-noise-level cm-loss curves — the mechanism by which the
            # LSM sampler reweights (reference log_loss_dict quartiles,
            # train_util.py:975-981; with start_scales=3 there are only
            # 2 grid indices, so log each one).  Sum+count pairs so the
            # host can form exact means over any logging window.
            for ki in range(num_scales - 1):
                msk = (indices == ki).astype(jnp.float32)
                metrics[f"cm_i{ki}_sum"] = (aux["cm_loss"] * msk).sum()
                metrics[f"cm_i{ki}_cnt"] = msk.sum()
        for k in ("pdur", "sdur", "C", "uv", "f0_mean", "f0_std", "energy", "f0"):
            if k in aux:
                metrics[k] = aux[k]
        return new_state, metrics

    if scan_steps and scan_steps > 1:
        K = int(scan_steps)

        def scan_fn(state: CMTrainState, batches: dict, probs: jnp.ndarray,
                    rng: jnp.ndarray, target_emas: jnp.ndarray):
            """K train steps in ONE dispatch: ``batches`` leaves have a
            leading K axis, ``target_emas`` is (K,).  Collapses K host
            round-trips (the dominant cost through a TPU tunnel — device
            time is ~40% of wall at K=1) into one XLA while-loop."""
            rngs = jax.random.split(rng, K)

            def body(st, x):
                return step_fn(st, x["batch"], probs, x["rng"],
                               x["target_ema"])

            final, metrics = jax.lax.scan(
                body, state, {"batch": batches, "rng": rngs,
                              "target_ema": target_emas})
            return final, metrics

        return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_synthesize_step(model: CMTTS, cfg: Config, with_viz: bool = False):
    """Eval-time one-step synthesis from the *target* network with
    teacher-forced conditioning + masked mel L1 (reference
    ``train_util.py:718-727`` + ``train_cm.py:98-108``).

    ``with_viz`` additionally returns the variance-track comparison
    payload for training-time TB figures (reference
    ``synth_one_sample_diff``, utils/tools.py:294-345): denormed
    target/predicted f0 contours (cwt/frame/ph, expanded to mel frames),
    target/predicted cwt spectrograms, and mel-frame energy tracks."""
    sched = schedule_from_config(cfg)

    def _expand_ph(x_ph, mel2ph):
        # phoneme-level track -> mel frames via mel2ph gather (reference
        # expand_f0_ph / expand, utils/pitch_tools.py + tools.py:336-341)
        padded = jnp.concatenate([jnp.zeros_like(x_ph[:, :1]), x_ph], axis=1)
        return jnp.take_along_axis(padded, mel2ph, axis=1)

    def _viz(cond_out, batch):
        from cmtts_tpu.audio.pitch import cwt2f0_norm_jnp, denorm_f0_jnp

        pc = cfg.pitch
        viz = {}
        p_pred = cond_out["p_pred"]
        mel2ph = cond_out["mel2ph"]
        if p_pred is not None:
            # teacher-forced condition => f0_denorm is the TARGET track
            if pc.pitch_type == "cwt":
                cwt_out = p_pred["cwt"]
                f0n = cwt2f0_norm_jnp(
                    cwt_out[..., :10], p_pred["f0_mean"],
                    p_pred["f0_std"] * cfg.model.variance_predictor.cwt_std_scale,
                    mel2ph.shape[1], pc.pitch_norm, pc.f0_mean, pc.f0_std,
                    pc.pitch_norm_eps,
                    # same standardization the model conditioned on
                    # (variance.py:222) — padded-std plots misrepresent
                    # a cwt_masked_std run by up to ~350 cents
                    mask=(mel2ph > 0) if pc.cwt_masked_std else None)
                uv_pred = (cwt_out[..., -1] > 0) if pc.use_uv else None
                viz["f0_pred"] = denorm_f0_jnp(
                    f0n, uv_pred, pc.pitch_norm, pc.f0_mean, pc.f0_std,
                    pc.use_uv)
                viz["f0_target"] = p_pred["f0_denorm"]
                viz["cwt_pred"] = cwt_out[..., :10]
                viz["cwt_target"] = batch["p_targets"]["cwt_spec"]
            elif pc.pitch_type == "frame":
                pp = p_pred["pitch_pred"]
                uv_pred = (pp[..., 1] > 0) if pc.use_uv else None
                viz["f0_pred"] = denorm_f0_jnp(
                    pp[..., 0], uv_pred, pc.pitch_norm, pc.f0_mean,
                    pc.f0_std, pc.use_uv, pitch_padding=mel2ph == 0)
                viz["f0_target"] = p_pred["f0_denorm"]
            else:  # 'ph': predictions/targets live at phoneme rate
                f0p = denorm_f0_jnp(
                    p_pred["pitch_pred"][..., 0], None, pc.pitch_norm,
                    pc.f0_mean, pc.f0_std, use_uv=False)
                viz["f0_pred"] = _expand_ph(f0p, mel2ph)
                viz["f0_target"] = _expand_ph(p_pred["f0_denorm"], mel2ph)
        e_pred = cond_out["e_pred"]
        if e_pred is not None:
            e_tgt = batch["e_targets"]
            if cfg.energy.feature == "phoneme_level":
                e_pred = _expand_ph(e_pred, mel2ph)
                e_tgt = _expand_ph(e_tgt, mel2ph)
            viz["e_pred"] = e_pred
            viz["e_target"] = e_tgt
        return viz

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
        if with_viz:
            return mel, mel_loss, _viz(cond_out, batch)
        return mel, mel_loss

    return jax.jit(synth_fn)
