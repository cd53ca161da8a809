"""Consistency training/distillation for the image-domain UNet.

The reference carries generic image-CM training loops inherited from
openai/consistency_models (``model/cm_tool/train_util.py:31-589``
TrainLoop/CMTrainLoop) whose loss math lives in
``karras_diffusion.py:139-297`` (``consistency_losses``) — the same
Euler/Heun step-to-target objective the TTS path uses, minus the TTS
variance losses.  This module provides that objective over
:class:`cmtts_tpu.models.unet.ImageUNet` plus a fused jitted train step
(grad -> RAdam -> EMA -> target-EMA), sharing the schedule, weighting,
EMA and sampler machinery with the TTS trainer.

Note the reference repo ships no image *dataset* pipeline or training
CLI — this is the engine-level capability, exercised by tests; feed it
(B, H, W, C) images in [-1, 1].
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from cmtts_tpu.cm.karras import (
    KarrasSchedule,
    append_dims,
    get_weightings,
    mean_flat,
)
from cmtts_tpu.train.state import CMTrainState, tree_ema


def make_image_denoise(apply_fn: Callable, sched: KarrasSchedule):
    """EDM-parameterized denoiser (karras_diffusion.py:392-407)."""

    def denoise(params, x_t, sigma, model_kwargs):
        c_skip, c_out, c_in = sched.active_scalings(sigma)
        out = apply_fn(params, append_dims(c_in, x_t.ndim) * x_t,
                       sched.rescale_t(sigma), **model_kwargs)
        return append_dims(c_out, x_t.ndim) * out + \
            append_dims(c_skip, x_t.ndim) * x_t

    return denoise


def image_consistency_loss(apply_fn, params, target_params, x_start, noise,
                           indices, num_scales: int, sched: KarrasSchedule,
                           loss_norm: str = "l2",
                           weight_schedule: str = "uniform",
                           model_kwargs=None, teacher_denoise=None):
    """Per-sample CT/CD loss (reference ``consistency_losses``,
    karras_diffusion.py:139-297, image branch: lpips is replaced by
    l1/l2 — LPIPS needs pretrained VGG weights absent from this
    environment; the reference's own TTS path uses l1).

    Returns (per-sample loss (B,), aux dict)."""
    model_kwargs = model_kwargs or {}
    denoise = make_image_denoise(apply_fn, sched)
    dims = x_start.ndim

    t = sched.t_of_index(indices, num_scales)
    t2 = sched.t_of_index(indices + 1, num_scales)

    x_t = x_start + noise * append_dims(t, dims)
    distiller = denoise(params, x_t, t, model_kwargs)

    if teacher_denoise is None:
        # CT: Euler toward t2 with ground-truth x0 (:194-211)
        d = (x_t - x_start) / append_dims(t, dims)
        x_t2 = x_t + d * append_dims(t2 - t, dims)
    else:
        # CD: Heun with the frozen teacher (:213-227)
        den1 = teacher_denoise(x_t, t)
        d = (x_t - den1) / append_dims(t, dims)
        x_mid = x_t + d * append_dims(t2 - t, dims)
        den2 = teacher_denoise(x_mid, t2)
        d2 = (x_mid - den2) / append_dims(t2, dims)
        x_t2 = x_t + (d + d2) * append_dims((t2 - t) / 2.0, dims)
    x_t2 = jax.lax.stop_gradient(x_t2)

    distiller_target = jax.lax.stop_gradient(
        denoise(target_params, x_t2, t2, model_kwargs))

    snrs = sched.snr(t)
    weights = get_weightings(weight_schedule, snrs, sched.sigma_data)
    diffs = distiller - distiller_target
    if loss_norm == "l1":
        loss = mean_flat(jnp.abs(diffs)) * weights
    elif loss_norm == "l2":
        loss = mean_flat(diffs ** 2) * weights
    else:
        raise ValueError(f"unsupported image loss norm '{loss_norm}'")
    return loss, {"cm_loss": loss}


def make_image_train_step(model, sched: KarrasSchedule, num_scales: int,
                          tx: optax.GradientTransformation,
                          ema_rates=(0.999,), loss_norm: str = "l2",
                          weight_schedule: str = "uniform",
                          teacher_params=None, class_cond: bool = False,
                          donate: bool = True):
    """Fused jitted image-CM step: grad -> optimizer -> EMA -> target-EMA
    (the CMTrainLoop step semantics, train_util.py:700-879, minus DDP —
    shard the batch over a mesh for data parallelism)."""

    def apply_fn(params, x, t, y=None):
        return model.apply({"params": params}, x, t, y)

    teacher_denoise = None
    if teacher_params is not None:
        den = make_image_denoise(apply_fn, sched)

        def teacher_denoise_(x_t, sigma, kw={}):
            return jax.lax.stop_gradient(
                den(teacher_params, x_t, sigma, kw))
        teacher_denoise = teacher_denoise_

    def loss_fn(params, target_params, batch, rng):
        rng_idx, rng_noise = jax.random.split(rng)
        x = batch["images"]
        B = x.shape[0]
        indices = jax.random.randint(rng_idx, (B,), 0, num_scales - 1)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        kw = {"y": batch["labels"]} if class_cond else {}
        per_sample, aux = image_consistency_loss(
            apply_fn, params, target_params, x, noise, indices, num_scales,
            sched, loss_norm, weight_schedule, kw, teacher_denoise)
        return per_sample.mean(), aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step_fn(state: CMTrainState, batch: dict, rng, target_ema):
        (loss, aux), grads = grad_fn(state.params, state.target_params,
                                     batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = tuple(tree_ema(e, params, r)
                           for e, r in zip(state.ema_params, ema_rates))
        target_params = tree_ema(state.target_params, params, target_ema)
        new_state = CMTrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params, target_params=target_params)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
