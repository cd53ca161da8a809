"""Karras/EDM consistency-model math as pure functions.

Parity source: reference ``model/cm_tool/karras_diffusion.py:19-102,
213-225, 392-407, 580-586``.  All functions are shape-polymorphic jnp and
jit-safe; ``KarrasSchedule`` is a frozen hyperparameter bundle.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class KarrasSchedule:
    sigma_data: float = 0.5
    sigma_max: float = 80.0
    sigma_min: float = 0.002
    rho: float = 7.0
    distillation: bool = True  # consistency modes use boundary scalings

    # -- scalings ----------------------------------------------------------
    def scalings(self, sigma):
        """EDM pre/post-conditioning (karras_diffusion.py:81-85)."""
        sd2 = self.sigma_data ** 2
        c_skip = sd2 / (sigma ** 2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma ** 2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + sd2)
        return c_skip, c_out, c_in

    def boundary_scalings(self, sigma):
        """CM boundary-condition scalings: identity at sigma_min
        (karras_diffusion.py:87-102)."""
        sd2 = self.sigma_data ** 2
        c_skip = sd2 / ((sigma - self.sigma_min) ** 2 + sd2)
        c_out = (sigma - self.sigma_min) * self.sigma_data / jnp.sqrt(sigma ** 2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + sd2)
        return c_skip, c_out, c_in

    def active_scalings(self, sigma):
        return self.boundary_scalings(sigma) if self.distillation else self.scalings(sigma)

    def rescale_t(self, sigma):
        """sigma -> network timestep input: 250 * ln(sigma)
        (karras_diffusion.py:404)."""
        return 1000.0 * 0.25 * jnp.log(sigma + 1e-44)

    def snr(self, sigma):
        return sigma ** -2.0

    # -- discretization ----------------------------------------------------
    def t_of_index(self, indices, num_scales: int):
        """Training grid: index i in [0, N-1) -> sigma (karras_diffusion.py:217-225)."""
        lo = self.sigma_min ** (1.0 / self.rho)
        hi = self.sigma_max ** (1.0 / self.rho)
        t = hi + indices.astype(jnp.float32) / (num_scales - 1) * (lo - hi)
        return t ** self.rho

    def ts_grid(self, ts, steps: int):
        """Multistep-sampler grid over `steps` levels
        (stochastic_iterative_sampler, karras_diffusion.py:843-850)."""
        lo = self.sigma_min ** (1.0 / self.rho)
        hi = self.sigma_max ** (1.0 / self.rho)
        t = (hi + jnp.asarray(ts, jnp.float32) / (steps - 1) * (lo - hi)) ** self.rho
        # parity note: the reference clips only the NEXT level
        # (karras_diffusion.py:851, `np.clip(next_t, t_min, t_max)`);
        # clipping the whole grid is a superset with no behavioral
        # difference for any shipped ts (t0 = sigma_max is in range by
        # construction, and every later level lies strictly inside).
        return jnp.clip(t, self.sigma_min, self.sigma_max)


def get_sigmas_karras(n: int, sigma_min: float, sigma_max: float, rho: float = 7.0):
    """Karras noise schedule with appended 0 (karras_diffusion.py:580-586)."""
    ramp = jnp.linspace(0.0, 1.0, n)
    lo = sigma_min ** (1.0 / rho)
    hi = sigma_max ** (1.0 / rho)
    sigmas = (hi + ramp * (lo - hi)) ** rho
    return jnp.concatenate([sigmas, jnp.zeros((1,))])


def get_weightings(weight_schedule: str, snrs, sigma_data: float):
    """Loss weight per noise level (karras_diffusion.py:19-32)."""
    if weight_schedule == "snr":
        return snrs
    if weight_schedule == "snr+1":
        return snrs + 1.0
    if weight_schedule == "karras":
        return snrs + 1.0 / sigma_data ** 2
    if weight_schedule == "truncated-snr":
        return jnp.clip(snrs, min=1.0)
    if weight_schedule == "uniform":
        return jnp.ones_like(snrs)
    raise NotImplementedError(weight_schedule)


def append_dims(x, ndim: int):
    """Right-pad shape with singleton dims (cm_tool/nn.py:97-104)."""
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def mean_flat(x):
    """Mean over all non-batch dims (cm_tool/nn.py:90-94)."""
    return x.mean(axis=tuple(range(1, x.ndim)))
