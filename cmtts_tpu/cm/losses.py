"""Training losses: consistency (CT/CD) + variance-adaptor losses.

Parity sources:
- consistency loss: reference ``karras_diffusion.py:139-297``
- variance losses: reference ``CMLoss`` (``model/loss.py:151-369``)

All losses are pure functions of (params, batch, rng); the per-sample
consistency loss vector is returned so the loss-second-moment sampler can
update its history (reference ``resample.py:117-237``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from cmtts_tpu.cm.karras import (
    KarrasSchedule,
    append_dims,
    get_weightings,
    mean_flat,
)
from cmtts_tpu.core.config import Config


# ---------------------------------------------------------------------------
# Variance (TTS) losses
# ---------------------------------------------------------------------------

def _masked_mean(x, mask):
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def duration_loss(log_d_pred, d_targets, texts, src_valid, cfg: Config,
                  sil_ids: tuple[int, ...], sample_valid=None):
    """Phone/word/sentence duration losses (model/loss.py:253-295).
    ``sample_valid`` (B,) zeros padded duplicate rows exactly."""
    ls = cfg.train.loss
    losses = {}
    nonpad = src_valid.astype(jnp.float32)
    dur_gt = d_targets.astype(jnp.float32) * nonpad

    pdur = (log_d_pred - jnp.log(dur_gt + 1.0)) ** 2
    losses["pdur"] = _masked_mean(pdur, nonpad) * ls.lambda_ph_dur

    dur_pred = jnp.clip(jnp.exp(log_d_pred) - 1.0, min=0.0)

    if ls.lambda_word_dur > 0:
        is_sil = jnp.zeros_like(texts, dtype=bool)
        for sid in sil_ids:
            is_sil = is_sil | (texts == sid)
        is_sil = is_sil.astype(jnp.float32)
        word_id = (jnp.cumsum(is_sil, -1) * (1.0 - is_sil)).astype(jnp.int32)
        n_words = texts.shape[1] + 1

        def scatter_row(ids, vals):
            return jax.ops.segment_sum(vals, ids, num_segments=n_words)

        word_dur_p = jax.vmap(scatter_row)(word_id, dur_pred)[:, 1:]
        word_dur_g = jax.vmap(scatter_row)(word_id, dur_gt)[:, 1:]
        wdur = (jnp.log(word_dur_p + 1.0) - jnp.log(word_dur_g + 1.0)) ** 2
        w_nonpad = (word_dur_g > 0).astype(jnp.float32)
        losses["wdur"] = _masked_mean(wdur, w_nonpad) * ls.lambda_word_dur

    if ls.lambda_sent_dur > 0:
        sent_p = dur_pred.sum(-1)
        sent_g = dur_gt.sum(-1)
        sdur = (jnp.log(sent_p + 1.0) - jnp.log(sent_g + 1.0)) ** 2
        if sample_valid is not None:
            losses["sdur"] = _masked_mean(sdur, sample_valid) * ls.lambda_sent_dur
        else:
            losses["sdur"] = sdur.mean() * ls.lambda_sent_dur

    return losses


def _bce_with_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def pitch_loss(p_pred: dict, p_targets: dict, mel_valid, src_valid, cfg: Config,
               sample_valid=None):
    """CWT / frame / ph pitch losses (model/loss.py:297-358)."""
    ls = cfg.train.loss
    pc = cfg.pitch
    losses = {}
    sv = sample_valid
    if pc.pitch_type == "cwt":
        cwt_pred = p_pred["cwt"][..., :10]
        cwt_gt = p_targets["cwt_spec"]
        cwt_err = (jnp.abs(cwt_pred - cwt_gt) if ls.cwt_loss == "l1"
                   else (cwt_pred - cwt_gt) ** 2)
        if sv is not None:
            losses["C"] = _masked_mean(
                cwt_err, jnp.broadcast_to(sv[:, None, None], cwt_err.shape)
            ) * ls.lambda_f0
        else:
            losses["C"] = cwt_err.mean() * ls.lambda_f0
        if pc.use_uv:
            uv_logits = p_pred["cwt"][..., -1]
            bce = _bce_with_logits(uv_logits, p_targets["uv"])
            losses["uv"] = _masked_mean(bce, mel_valid) * ls.lambda_uv
        f0m_err = jnp.abs(p_pred["f0_mean"] - p_targets["f0_mean"])
        f0s_err = jnp.abs(p_pred["f0_std"] - p_targets["f0_std"])
        if sv is not None:
            losses["f0_mean"] = _masked_mean(f0m_err, sv) * ls.lambda_f0
            losses["f0_std"] = _masked_mean(f0s_err, sv) * ls.lambda_f0
        else:
            losses["f0_mean"] = f0m_err.mean() * ls.lambda_f0
            losses["f0_std"] = f0s_err.mean() * ls.lambda_f0
    elif pc.pitch_type == "frame":
        pred = p_pred["pitch_pred"]
        nonpad = mel_valid
        if pc.use_uv:
            bce = _bce_with_logits(pred[..., 1], p_targets["uv"])
            losses["uv"] = _masked_mean(bce, nonpad) * ls.lambda_uv
            nonpad = nonpad * (p_targets["uv"] == 0).astype(jnp.float32)
        diff = pred[..., 0] - p_targets["f0"]
        err = jnp.abs(diff) if ls.pitch_loss == "l1" else diff ** 2
        losses["f0"] = _masked_mean(err, nonpad) * ls.lambda_f0
    else:  # 'ph'
        diff = p_pred["pitch_pred"][..., 0] - p_targets["f0"]
        err = jnp.abs(diff) if ls.pitch_loss == "l1" else diff ** 2
        losses["f0"] = _masked_mean(err, src_valid) * ls.lambda_f0
    return losses


def energy_loss(e_pred, e_targets, src_valid, mel_valid, cfg: Config):
    """Masked L1 on energy (model/loss.py:360-369)."""
    mask = src_valid if cfg.energy.feature == "phoneme_level" else mel_valid
    return _masked_mean(jnp.abs(e_pred - e_targets), mask)


def variance_loss(cond_out: dict, batch: dict, cfg: Config,
                  sil_ids: tuple[int, ...]):
    """Total variance-adaptor loss (reference CMLoss.forward,
    model/loss.py:169-218): duration + pitch + energy (mel term is zero
    during CM training — the mel is learned by the consistency loss)."""
    src_valid = 1.0 - cond_out["src_pad_mask"].astype(jnp.float32)
    mel_valid = 1.0 - cond_out["mel_pad_mask"].astype(jnp.float32)
    sample_valid = batch.get("sample_valid")
    if sample_valid is not None:
        # padded duplicate rows (pod batch padding) contribute zero:
        # their frames/phones leave every masked mean (sharding.py
        # pad_batch_to_multiple)
        src_valid = src_valid * sample_valid[:, None]
        mel_valid = mel_valid * sample_valid[:, None]

    losses = duration_loss(
        cond_out["log_d_pred"], batch["d_targets"], batch["texts"], src_valid,
        cfg, sil_ids, sample_valid=sample_valid)
    if cfg.model.variance_embedding.use_pitch_embed:
        losses.update(pitch_loss(
            cond_out["p_pred"], batch["p_targets"], mel_valid, src_valid, cfg,
            sample_valid=sample_valid))
    if cfg.model.variance_embedding.use_energy_embed:
        losses["energy"] = energy_loss(
            cond_out["e_pred"], batch["e_targets"], src_valid, mel_valid, cfg)

    total = sum(losses.values())
    return total, losses


# ---------------------------------------------------------------------------
# Consistency loss
# ---------------------------------------------------------------------------

def make_denoise_fn(apply_fn: Callable, sched: KarrasSchedule):
    """Wrap a CMTTS apply into EDM-parameterized denoising
    (karras_diffusion.py:392-407)."""

    def denoise(params, x_t, sigma, batch, rng, deterministic):
        c_skip, c_out, c_in = sched.active_scalings(sigma)
        model_out, cond_out = apply_fn(
            params,
            append_dims(c_in, x_t.ndim) * x_t,
            sched.rescale_t(sigma),
            batch,
            rng,
            deterministic,
        )
        denoised = append_dims(c_out, x_t.ndim) * model_out + \
            append_dims(c_skip, x_t.ndim) * x_t
        return denoised, cond_out

    return denoise


def consistency_loss(
    apply_fn: Callable,
    params,
    target_params,
    x_start: jnp.ndarray,          # (B, L, n_mels) ground-truth mel
    noise: jnp.ndarray,            # (B, L, n_mels)
    indices: jnp.ndarray,          # (B,) int in [0, num_scales-1)
    num_scales: int,
    batch: dict,
    cfg: Config,
    sched: KarrasSchedule,
    sil_ids: tuple[int, ...],
    dropout_rng,
    mel_valid=None,
    teacher_denoise=None,          # optional CD teacher denoiser closure
):
    """Consistency-training (or distillation) loss.

    Returns (per_sample_total (B,), aux dict).  Semantics parity with
    reference ``consistency_losses`` (karras_diffusion.py:139-297):

    - t, t2 from the Karras index grid;
    - student denoises x_t; CT steps to x_t2 with the *ground truth* x0
      as the Euler denoiser (:194-211); CD uses the teacher (Heun);
    - target network denoises x_t2 under stop_gradient, with the SAME
      dropout rng as the student (:229,239 — rng state reset);
    - distance l1/l2 -> mean over non-batch dims, weighted by
      weight_schedule(snr);
    - total = 10 * cm + variance losses (:284-296).
    """
    denoise = make_denoise_fn(apply_fn, sched)

    t = sched.t_of_index(indices, num_scales)
    t2 = sched.t_of_index(indices + 1, num_scales)

    dims = x_start.ndim
    x_t = x_start + noise * append_dims(t, dims)

    distiller, cond_out = denoise(
        params, x_t, t, batch, dropout_rng, False)

    tts_total, tts_losses = variance_loss(cond_out, batch, cfg, sil_ids)

    if teacher_denoise is None:
        # CT: Euler step toward t2 using ground-truth x0 as the denoiser.
        d = (x_t - x_start) / append_dims(t, dims)
        x_t2 = x_t + d * append_dims(t2 - t, dims)
    else:
        # CD: Heun step with the frozen teacher.
        den1 = teacher_denoise(x_t, t)
        d = (x_t - den1) / append_dims(t, dims)
        x_mid = x_t + d * append_dims(t2 - t, dims)
        den2 = teacher_denoise(x_mid, t2)
        d2 = (x_mid - den2) / append_dims(t2, dims)
        x_t2 = x_t + (d + d2) * append_dims((t2 - t) / 2.0, dims)
    x_t2 = jax.lax.stop_gradient(x_t2)

    distiller_target, _ = denoise(
        target_params, x_t2, t2, batch, dropout_rng, False)
    distiller_target = jax.lax.stop_gradient(distiller_target)

    snrs = sched.snr(t)
    weights = get_weightings(cfg.train.cm.weight_schedule, snrs, sched.sigma_data)

    loss_norm = cfg.train.cm.loss_norm
    backward_mel = loss_norm.endswith("+mel_loss")
    if backward_mel:
        loss_norm = loss_norm.split("+")[0]

    diffs = distiller - distiller_target
    if loss_norm == "l1":
        cm = mean_flat(jnp.abs(diffs)) * weights
    elif loss_norm == "l2":
        cm = mean_flat(diffs ** 2) * weights
    elif loss_norm == "mel_loss":
        if mel_valid is None:
            mel_valid = 1.0 - cond_out["mel_pad_mask"].astype(jnp.float32)
        w = mel_valid[..., None]
        cm = (jnp.abs(diffs) * w).sum() / jnp.maximum(w.sum() * diffs.shape[-1], 1.0)
        cm = jnp.broadcast_to(cm, (x_start.shape[0],))
    else:
        raise ValueError(f"Unknown loss norm {loss_norm}")

    total = 10.0 * cm + tts_total
    if backward_mel:
        if mel_valid is None:
            mel_valid = 1.0 - cond_out["mel_pad_mask"].astype(jnp.float32)
        w = (jnp.abs(x_start).sum(-1, keepdims=True) != 0).astype(jnp.float32)
        bm = (jnp.abs(distiller - x_start) * w).sum() / jnp.maximum(w.sum() * x_start.shape[-1], 1.0)
        total = total + bm

    aux = {"cm_loss": cm, "tts_loss": tts_total, **tts_losses}
    return total, aux


def edm_loss(
    apply_fn: Callable,
    params,
    x_start: jnp.ndarray,          # (B, L, n_mels) ground-truth mel
    noise: jnp.ndarray,
    sigmas: jnp.ndarray,           # (B,) continuous EDM noise levels
    batch: dict,
    cfg: Config,
    sched: KarrasSchedule,
    sil_ids: tuple[int, ...],
    dropout_rng,
):
    """EDM denoising-score-matching loss — trains the true DIFFUSION
    teacher for consistency distillation (reference
    ``KarrasDenoiser.training_losses``, karras_diffusion.py:104-137,
    driven with the lognormal sigma sampler, resample.py:240-260).

    The schedule must use the plain (non-boundary) EDM scalings
    (``distillation=False``): x_t = x0 + sigma*noise, loss =
    w(snr) * mean (D(x_t, sigma) - x0)^2 + the variance-adaptor losses
    (the TTS conditioning still has to learn duration/pitch/energy).
    Returns (per_sample_total (B,), aux) like consistency_loss.
    """
    denoise = make_denoise_fn(apply_fn, sched)
    dims = x_start.ndim

    x_t = x_start + noise * append_dims(sigmas, dims)
    denoised, cond_out = denoise(params, x_t, sigmas, batch, dropout_rng,
                                 False)
    tts_total, tts_losses = variance_loss(cond_out, batch, cfg, sil_ids)

    snrs = sched.snr(sigmas)
    weights = get_weightings(cfg.train.cm.weight_schedule, snrs,
                             sched.sigma_data)
    mse = mean_flat(append_dims(weights, dims) * (denoised - x_start) ** 2)

    total = mse + tts_total
    aux = {"cm_loss": mse, "tts_loss": tts_total, **tts_losses}
    return total, aux


def progdist_loss(
    apply_fn: Callable,
    params,
    teacher_denoise: Callable,         # (x_t, sigma) -> denoised, frozen
    x_start: jnp.ndarray,
    noise: jnp.ndarray,
    indices: jnp.ndarray,              # (B,) int in [0, num_scales)
    num_scales: int,
    batch: dict,
    cfg: Config,
    sched: KarrasSchedule,
    sil_ids: tuple[int, ...],
    dropout_rng,
):
    """Progressive distillation: the student at t matches the denoiser
    implied by TWO teacher Euler half-steps t -> t2 -> t3 (reference
    ``progdist_losses``, karras_diffusion.py:299-390).

    Returns (per_sample_total (B,), aux dict) like consistency_loss.
    """
    denoise = make_denoise_fn(apply_fn, sched)
    dims = x_start.ndim

    def t_of(idx_float):
        lo = sched.sigma_max ** (1 / sched.rho)
        hi = sched.sigma_min ** (1 / sched.rho)
        return (lo + idx_float / num_scales * (hi - lo)) ** sched.rho

    idx = indices.astype(jnp.float32)
    t = t_of(idx)
    t2 = t_of(idx + 0.5)
    t3 = t_of(idx + 1.0)

    x_t = x_start + noise * append_dims(t, dims)
    denoised_x, cond_out = denoise(params, x_t, t, batch, dropout_rng, False)
    tts_total, tts_losses = variance_loss(cond_out, batch, cfg, sil_ids)

    def euler(x, ta, tb):
        d = (x - teacher_denoise(x, ta)) / append_dims(ta, dims)
        return x + d * append_dims(tb - ta, dims)

    x_t2 = jax.lax.stop_gradient(euler(x_t, t, t2))
    x_t3 = jax.lax.stop_gradient(euler(x_t2, t2, t3))
    target_x = jax.lax.stop_gradient(
        x_t - append_dims(t, dims) * (x_t3 - x_t) / append_dims(t3 - t, dims))

    snrs = sched.snr(t)
    weights = get_weightings(cfg.train.cm.weight_schedule, snrs,
                             sched.sigma_data)
    loss_norm = cfg.train.cm.loss_norm.split("+")[0]
    diffs = denoised_x - target_x
    if loss_norm == "l1":
        cm = mean_flat(jnp.abs(diffs)) * weights
    elif loss_norm == "l2":
        cm = mean_flat(diffs ** 2) * weights
    else:
        raise ValueError(f"Unknown loss norm {loss_norm}")

    total = 10.0 * cm + tts_total
    aux = {"cm_loss": cm, "tts_loss": tts_total, **tts_losses}
    return total, aux


def masked_mel_l1(mel_pred, mel_target, mel_lens, max_len: int):
    """Eval-time masked mel L1 with nonzero-row weights (reference
    MelLoss, model/loss.py:38-92)."""
    mask = (jnp.arange(max_len)[None, :] < mel_lens[:, None]).astype(jnp.float32)
    mel_pred = mel_pred * mask[..., None]
    mel_target = mel_target * mask[..., None]
    w = (jnp.abs(mel_target).sum(-1, keepdims=True) != 0).astype(jnp.float32)
    w = jnp.broadcast_to(w, mel_target.shape)
    return (jnp.abs(mel_pred - mel_target) * w).sum() / jnp.maximum(w.sum(), 1.0)


def masked_mel_l2(mel_pred, mel_target, mel_lens, max_len: int):
    """Masked mel MSE (reference MelLossL2, model/loss.py:95-149)."""
    mask = (jnp.arange(max_len)[None, :] < mel_lens[:, None]).astype(jnp.float32)
    mel_pred = mel_pred * mask[..., None]
    mel_target = mel_target * mask[..., None]
    w = (jnp.abs(mel_target).sum(-1, keepdims=True) != 0).astype(jnp.float32)
    w = jnp.broadcast_to(w, mel_target.shape)
    return (((mel_pred - mel_target) ** 2) * w).sum() / jnp.maximum(w.sum(), 1.0)
