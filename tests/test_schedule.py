"""Golden-value tests for EDM schedules against hand-computed formulas
(ref: gecco-jax/src/gecco_jax/models/diffusion.py:63-171)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gecco_tpu.diffusion import LogNormalSchedule, LogUniformSchedule, Schedule
from gecco_tpu.diffusion.schedule import low_discrepancy_uniform


def test_preconditioner_golden():
    sched = Schedule(sigma_data=0.5)
    sigma = jnp.array(2.0)
    sd = 0.5
    np.testing.assert_allclose(sched.c_skip(sigma), sd**2 / (4 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(
        sched.c_out(sigma), 2.0 * sd / np.sqrt(sd**2 + 4.0), rtol=1e-6
    )
    np.testing.assert_allclose(sched.c_in(sigma), 1 / np.sqrt(4 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(sched.c_noise(sigma), 2.0, rtol=1e-6)
    np.testing.assert_allclose(
        sched.loss_weight(sigma), (4 + sd**2) / (2.0 * sd) ** 2, rtol=1e-6
    )


def test_preconditioner_consistency():
    """EDM identity: c_skip^2 + c_out^2 * (sd^2+sigma^2)/sd^2 ... sanity:
    variance preservation at the characteristic points."""
    sched = Schedule(sigma_data=1.0)
    # at sigma -> 0: c_skip -> 1, c_out -> 0, c_in -> 1
    np.testing.assert_allclose(sched.c_skip(jnp.array(1e-6)), 1.0, atol=1e-5)
    np.testing.assert_allclose(sched.c_out(jnp.array(0.0)), 0.0, atol=1e-8)
    np.testing.assert_allclose(sched.c_in(jnp.array(0.0)), 1.0, atol=1e-6)


def test_karras_grid_endpoints():
    sched = Schedule(sigma_max=165.0, sigma_min=0.002, n_solver_steps=128)
    grid = sched.solver_grid()
    assert grid.shape == (128,)
    np.testing.assert_allclose(grid[0], 165.0, rtol=1e-5)
    np.testing.assert_allclose(grid[-1], 0.002, rtol=1e-4)
    assert np.all(np.diff(np.asarray(grid)) < 0)  # strictly decreasing

    ext = sched.extended_solver_grid()
    assert ext.shape == (129,)
    # the extended grid steps PAST sigma_min (models/stochastic.py semantics)
    assert float(ext[-1]) < 0.002
    assert float(ext[-1]) > 0.0


def test_karras_grid_formula():
    sched = Schedule(sigma_max=80.0, sigma_min=0.002, n_solver_steps=10, rho=7.0)
    i = 3
    a = 80.0 ** (1 / 7)
    b = 0.002 ** (1 / 7)
    expected = (a + i / 9 * (b - a)) ** 7
    np.testing.assert_allclose(sched.t_i(jnp.array(float(i))), expected, rtol=1e-5)


def test_low_discrepancy_strata():
    key = jax.random.PRNGKey(0)
    n = 64
    u = low_discrepancy_uniform(key, n, 0.0, 1.0)
    u = np.sort(np.asarray(u))
    # exactly one sample per stratum [i/n, (i+1)/n)
    strata = np.floor(u * n).astype(int)
    assert (strata == np.arange(n)).all()


def test_log_uniform_range():
    sched = LogUniformSchedule(sigma_max=165.0, sigma_min=0.002)
    s = sched.sample_sigma(jax.random.PRNGKey(1), 512)
    assert float(s.min()) >= 0.002
    assert float(s.max()) <= 165.0
    # roughly log-uniform: mean of log close to midpoint
    np.testing.assert_allclose(
        np.mean(np.log(np.asarray(s))),
        (np.log(0.002) + np.log(165.0)) / 2,
        atol=0.1,
    )


def test_log_normal_moments():
    sched = LogNormalSchedule(sigma_log_mean=0.3, sigma_log_std=0.5)
    s = sched.sample_sigma(jax.random.PRNGKey(2), 20000)
    logs = np.log(np.asarray(s))
    np.testing.assert_allclose(logs.mean(), 0.3, atol=0.02)
    np.testing.assert_allclose(logs.std(), 0.5, atol=0.02)


def test_sample_latent_scale():
    sched = Schedule(sigma_max=80.0)
    z = sched.sample_latent(jax.random.PRNGKey(3), (4096,))
    np.testing.assert_allclose(np.std(np.asarray(z)), 80.0, rtol=0.05)
