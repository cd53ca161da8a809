import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.cm.karras import KarrasSchedule
from cmtts_tpu.cm.sampling import (
    default_ts,
    sample_mel,
    sample_onestep,
    sample_our_multistep,
    stochastic_iterative,
)


SCHED = KarrasSchedule()


def perfect_denoiser(x0):
    """A denoiser that always returns the true x0."""
    def denoise(x_t, sigma):
        return jnp.broadcast_to(x0, x_t.shape)
    return denoise


def test_default_ts():
    assert default_ts(2) == (0, 0, 1)
    assert default_ts(4) == (0, 0, 0, 0, 1)


def test_onestep_with_perfect_denoiser():
    x0 = jnp.ones((2, 8, 4))
    rng = jax.random.PRNGKey(0)
    out = sample_mel(perfect_denoiser(x0), (2, 8, 4), rng, SCHED, "onestep")
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_multistep_terminates_at_x0():
    # final re-noise amplitude is sqrt(t_min^2 - t_min^2) = 0 -> exact x0
    x0 = jnp.full((1, 4, 2), 0.7)
    rng = jax.random.PRNGKey(1)
    out = sample_mel(perfect_denoiser(x0), (1, 4, 2), rng, SCHED,
                     "multistep", T=2, steps=2, ts=(0, 0, 1))
    np.testing.assert_allclose(np.asarray(out), 0.7, rtol=1e-5)


def test_our_multistep():
    x0 = jnp.zeros((1, 4, 2))
    rng = jax.random.PRNGKey(2)
    out = sample_mel(perfect_denoiser(x0), (1, 4, 2), rng, SCHED,
                     "our_multistep", T=4)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_euler_heun_dpm_run():
    x0 = jnp.full((1, 4, 2), 0.3)
    for sampler in ("euler", "heun", "dpm", "ancestral"):
        rng = jax.random.PRNGKey(3)
        out = sample_mel(perfect_denoiser(x0), (1, 4, 2), rng, SCHED,
                         sampler, steps=5)
        # ODE samplers with a perfect denoiser converge to x0
        np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-3)


def test_x_T_scale():
    # with an identity denoiser, onestep returns x_T whose std ~ sigma_max
    def identity(x_t, sigma):
        return x_t
    rng = jax.random.PRNGKey(4)
    out = sample_mel(identity, (4, 64, 16), rng, SCHED, "onestep")
    assert 60.0 < float(np.asarray(out).std()) < 100.0
