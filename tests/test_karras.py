import numpy as np
import jax.numpy as jnp
import pytest

from cmtts_tpu.cm.karras import (
    KarrasSchedule,
    get_sigmas_karras,
    get_weightings,
    append_dims,
    mean_flat,
)


SCHED = KarrasSchedule()


def test_scalings_golden():
    # EDM scalings at sigma = sigma_data: c_skip = 1/2, c_in = 1/sqrt(2*sd^2)
    c_skip, c_out, c_in = SCHED.scalings(jnp.asarray(0.5))
    assert float(c_skip) == pytest.approx(0.5)
    assert float(c_out) == pytest.approx(0.5 * 0.5 / np.sqrt(0.5))
    assert float(c_in) == pytest.approx(1.0 / np.sqrt(0.5))


def test_boundary_scalings_identity_at_sigma_min():
    # At sigma = sigma_min the consistency function must be the identity:
    # c_skip = 1, c_out = 0 (karras_diffusion.py:87-102)
    c_skip, c_out, c_in = SCHED.boundary_scalings(jnp.asarray(SCHED.sigma_min))
    assert float(c_skip) == pytest.approx(1.0)
    assert float(c_out) == pytest.approx(0.0, abs=1e-9)


def test_rescale_t():
    # rescaled_t = 250 * ln(sigma) (karras_diffusion.py:404)
    t = SCHED.rescale_t(jnp.asarray(80.0))
    assert float(t) == pytest.approx(250.0 * np.log(80.0), rel=1e-5)


def test_t_of_index_grid():
    # index 0 -> sigma_max; index N-1 -> sigma_min
    N = 3
    t0 = SCHED.t_of_index(jnp.asarray([0]), N)
    t2 = SCHED.t_of_index(jnp.asarray([N - 1]), N)
    assert float(t0[0]) == pytest.approx(80.0, rel=1e-4)
    assert float(t2[0]) == pytest.approx(0.002, rel=1e-3)
    # monotone decreasing
    ts = np.asarray(SCHED.t_of_index(jnp.arange(N), N))
    assert (np.diff(ts) < 0).all()


def test_sigmas_karras():
    s = np.asarray(get_sigmas_karras(40, 0.002, 80.0, 7.0))
    assert len(s) == 41
    assert s[0] == pytest.approx(80.0, rel=1e-4)
    assert s[-2] == pytest.approx(0.002, rel=1e-3)
    assert s[-1] == 0.0


def test_weightings():
    snrs = jnp.asarray([1.0, 4.0])
    np.testing.assert_allclose(get_weightings("uniform", snrs, 0.5), [1, 1])
    np.testing.assert_allclose(get_weightings("snr", snrs, 0.5), [1, 4])
    np.testing.assert_allclose(get_weightings("snr+1", snrs, 0.5), [2, 5])
    np.testing.assert_allclose(get_weightings("karras", snrs, 0.5), [5, 8])
    np.testing.assert_allclose(get_weightings("truncated-snr", jnp.asarray([0.5, 4.0]), 0.5), [1, 4])


def test_append_dims_mean_flat():
    x = jnp.ones((2, 3, 4))
    assert append_dims(jnp.ones((2,)), 3).shape == (2, 1, 1)
    assert mean_flat(x).shape == (2,)


def test_ts_grid_t2():
    # T=2 multistep: ts=(0,0,1), steps=2 -> [sigma_max, sigma_max, sigma_min]
    grid = np.asarray(SCHED.ts_grid(jnp.asarray([0, 0, 1]), steps=2))
    assert grid[0] == pytest.approx(80.0, rel=1e-4)
    assert grid[1] == pytest.approx(80.0, rel=1e-4)
    assert grid[2] == pytest.approx(0.002, rel=1e-3)
