"""Consistency-model samplers (inference), fused for TPU.

Parity source: reference ``karras_diffusion.py:410-891``.  The key
TPU-first change: the conditioning network runs ONCE, and the samplers
drive only the bare denoiser (the reference re-runs the full cond-net
inside every sampler step, ``synthesize.py:111-147`` + ``tts_net.py:75``
— pure waste, the conditioning is deterministic given the text).  All
steps are unrolled inside a single jitted graph; T <= 4 in practice.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from cmtts_tpu.cm.karras import KarrasSchedule, append_dims

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (x_t, sigma[B]) -> x0_hat


def _bcast(sigma, batch: int):
    return jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (batch,))


def sample_onestep(denoise: DenoiseFn, x_T: jnp.ndarray, sched: KarrasSchedule):
    """Single denoise at sigma_max (karras_diffusion.py:800-811)."""
    return denoise(x_T, _bcast(sched.sigma_max, x_T.shape[0]))


def sample_our_multistep(denoise: DenoiseFn, x_T, sched: KarrasSchedule, T: int):
    """Re-apply the one-step denoiser T times at sigma_max
    (karras_diffusion.py:814-826)."""
    x = x_T
    for _ in range(T):
        x = denoise(x, _bcast(sched.sigma_max, x.shape[0]))
    return x


def stochastic_iterative(
    denoise: DenoiseFn,
    x_T,
    sched: KarrasSchedule,
    ts: Sequence[int],
    steps: int,
    rng,
    s_noise_scale: float = 0.85,
):
    """Multistep consistency sampling: denoise, re-noise to the next level
    (karras_diffusion.py:829-854).  T=2 uses ts=(0,0,1), T=4 uses
    ts=(0,0,0,0,1), both with steps=2 (synthesize.py:122-147)."""
    B = x_T.shape[0]
    grid = sched.ts_grid(jnp.asarray(ts, jnp.float32), steps)
    x = x_T
    for i in range(len(ts) - 1):
        t = grid[i]
        x0 = denoise(x, _bcast(t, B))
        next_t = grid[i + 1]
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = x0 + noise * jnp.sqrt(
            jnp.maximum(next_t ** 2 - sched.sigma_min ** 2, 0.0)) * s_noise_scale
    return x


def sample_euler(denoise: DenoiseFn, x_T, sigmas):
    """Euler ODE sampler (karras_diffusion.py:711-743)."""
    x = x_T
    B = x_T.shape[0]
    for i in range(len(sigmas) - 1):
        sigma = sigmas[i]
        denoised = denoise(x, _bcast(sigma, B))
        d = (x - denoised) / append_dims(jnp.asarray(sigma), x.ndim)
        x = x + d * (sigmas[i + 1] - sigma)
    return x


def sample_heun(denoise: DenoiseFn, x_T, sigmas, rng=None, s_churn=0.0,
                s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0):
    """Heun (EDM Algorithm 2) sampler (karras_diffusion.py:654-708).

    sigmas is a host-side float sequence (static), so churn control flow
    unrolls at trace time.
    """
    x = x_T
    B = x_T.shape[0]
    n = len(sigmas) - 1
    for i in range(n):
        sigma = float(sigmas[i])
        sigma_next = float(sigmas[i + 1])
        gamma = min(s_churn / n, 2 ** 0.5 - 1) if s_tmin <= sigma <= s_tmax else 0.0
        sigma_hat = sigma * (gamma + 1)
        if gamma > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            eps = jax.random.normal(sub, x.shape, x.dtype) * s_noise
            x = x + eps * (sigma_hat ** 2 - sigma ** 2) ** 0.5
        denoised = denoise(x, _bcast(sigma_hat, B))
        d = (x - denoised) / sigma_hat
        dt = sigma_next - sigma_hat
        if sigma_next == 0:
            x = x + d * dt
        else:
            x2 = x + d * dt
            denoised2 = denoise(x2, _bcast(sigma_next, B))
            d2 = (x2 - denoised2) / sigma_next
            x = x + (d + d2) / 2 * dt
    return x


def sample_dpm(denoise: DenoiseFn, x_T, sigmas, rng=None, s_churn=0.0,
               s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0):
    """DPM-Solver-2-style midpoint sampler (karras_diffusion.py:746-797)."""
    x = x_T
    B = x_T.shape[0]
    n = len(sigmas) - 1
    for i in range(n):
        sigma = float(sigmas[i])
        sigma_next = float(sigmas[i + 1])
        gamma = min(s_churn / n, 2 ** 0.5 - 1) if s_tmin <= sigma <= s_tmax else 0.0
        sigma_hat = sigma * (gamma + 1)
        if gamma > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            eps = jax.random.normal(sub, x.shape, x.dtype) * s_noise
            x = x + eps * (sigma_hat ** 2 - sigma ** 2) ** 0.5
        denoised = denoise(x, _bcast(sigma_hat, B))
        d = (x - denoised) / sigma_hat
        sigma_mid = ((sigma_hat ** (1 / 3) + sigma_next ** (1 / 3)) / 2) ** 3
        dt_1 = sigma_mid - sigma_hat
        dt_2 = sigma_next - sigma_hat
        x2 = x + d * dt_1
        denoised2 = denoise(x2, _bcast(sigma_mid, B))
        d2 = (x2 - denoised2) / sigma_mid
        x = x + d2 * dt_2
    return x


def sample_euler_ancestral(denoise: DenoiseFn, x_T, sigmas, rng):
    """Ancestral Euler sampler (karras_diffusion.py:604-632)."""
    x = x_T
    B = x_T.shape[0]
    for i in range(len(sigmas) - 1):
        sigma = float(sigmas[i])
        sigma_next = float(sigmas[i + 1])
        denoised = denoise(x, _bcast(sigma, B))
        sigma_up = (sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2) / sigma ** 2) ** 0.5
        sigma_down = (sigma_next ** 2 - sigma_up ** 2) ** 0.5
        d = (x - denoised) / sigma
        x = x + d * (sigma_down - sigma)
        if sigma_next > 0:
            rng, sub = jax.random.split(rng)
            x = x + jax.random.normal(sub, x.shape, x.dtype) * sigma_up
    return x


def sample_mel(
    denoise: DenoiseFn,
    shape: tuple,
    rng,
    sched: KarrasSchedule,
    sampler: str = "onestep",
    T: int = 1,
    steps: int = 2,
    ts: Sequence[int] | None = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_noise: float = 1.0,
    s_tmax: float = float("inf"),
):
    """Draw x_T ~ N(0, sigma_max^2) and run the chosen sampler
    (karras_sample_tts, karras_diffusion.py:480-577; the image entry
    karras_sample additionally forwards ``s_tmax``).

    ``denoise`` must already close over the (precomputed) conditioning.
    """
    rng, sub = jax.random.split(rng)
    x_T = jax.random.normal(sub, shape, jnp.float32) * sched.sigma_max

    if sampler == "onestep":
        return sample_onestep(denoise, x_T, sched)
    if sampler == "our_multistep":
        return sample_our_multistep(denoise, x_T, sched, T)
    if sampler == "multistep":
        if ts is None:
            ts = default_ts(T)
        return stochastic_iterative(denoise, x_T, sched, ts, steps, rng)

    import numpy as np

    # host-side numpy (not jnp): the heun/dpm loops branch on concrete
    # sigma values (s_tmin <= sigma <= s_tmax), and steps/sigma_* are
    # static — so the grid must stay concrete even under jit
    ramp = np.linspace(0.0, 1.0, steps)
    lo, hi = sched.sigma_min ** (1 / sched.rho), sched.sigma_max ** (1 / sched.rho)
    sigmas = np.append((hi + ramp * (lo - hi)) ** sched.rho, 0.0)
    if sampler == "euler":
        return sample_euler(denoise, x_T, sigmas)
    if sampler == "heun":
        return sample_heun(denoise, x_T, sigmas, rng, s_churn, s_tmin,
                           s_tmax, s_noise)
    if sampler == "dpm":
        return sample_dpm(denoise, x_T, sigmas, rng, s_churn, s_tmin,
                          s_tmax, s_noise)
    if sampler == "ancestral":
        return sample_euler_ancestral(denoise, x_T, sigmas, rng)
    raise ValueError(f"unknown sampler {sampler}")


def default_ts(T: int) -> tuple[int, ...]:
    """The reference's CLI mapping of --T to multistep ts
    (synthesize.py:111-147): T=1 onestep; T=2 -> (0,0,1); T=4 -> (0,0,0,0,1)."""
    if T == 2:
        return (0, 0, 1)
    if T == 4:
        return (0, 0, 0, 0, 1)
    return tuple([0] * T + [1])
