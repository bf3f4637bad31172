"""Sampler convergence on an analytic distribution.

For data ~ N(0, s^2 I) the optimal EDM denoiser is
D(x, sigma) = x * s^2 / (s^2 + sigma^2) in closed form, so the samplers can
be validated without training (SURVEY.md §4 test strategy)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from gecco_tpu.diffusion import Diffusion, Schedule
from gecco_tpu.diffusion.samplers import heun_sampler
from gecco_tpu.utils import module, static

S_DATA = 0.8  # ground-truth data std


@module
class AnalyticNet:
    """Network whose preconditioned output makes denoise() the optimal
    Gaussian denoiser. Receives t = c_noise = sigma."""

    s: float = static(default=S_DATA)

    def __call__(self, t, x, ctx=None, hs=None, return_h=False, key=None):
        sigma = t[:, None, None]
        sd = 1.0  # schedule sigma_data
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / jnp.sqrt(sd**2 + sigma**2)
        target_d = x * self.s**2 / (self.s**2 + sigma**2)
        # denoise = c_skip * (c_in*x_orig)... our x is already c_in-scaled;
        # recover original: x_orig = x / c_in
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd**2)
        x_orig = x / c_in
        target_d = x_orig * self.s**2 / (self.s**2 + sigma**2)
        f = (target_d - c_skip * x_orig) / c_out
        if return_h:
            return f, jnp.zeros((1, x.shape[0], 1, 1))
        return f


def _model(n_steps=64, sigma_max=20.0):
    sched = Schedule(sigma_max=sigma_max, sigma_min=0.002, n_solver_steps=n_steps)
    return Diffusion.init(AnalyticNet(), sched)


def test_denoiser_is_optimal():
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 3)) * 5.0
    sigma = jnp.full((4,), 2.0)
    d = model.denoise(sigma, x)
    expected = np.asarray(x) * S_DATA**2 / (S_DATA**2 + 4.0)
    np.testing.assert_allclose(np.asarray(d), expected, rtol=1e-4, atol=1e-5)


def test_ode_sampler_matches_data_std():
    model = _model()
    samples = jax.jit(lambda m, k: m.sample(k, (64, 128, 3)))(
        model, jax.random.PRNGKey(1)
    )
    assert np.isfinite(np.asarray(samples)).all()
    np.testing.assert_allclose(float(samples.std()), S_DATA, rtol=0.05)
    # Gaussianity: Kolmogorov-Smirnov on the marginals
    flat = np.asarray(samples).ravel() / S_DATA
    _, pvalue = scipy.stats.kstest(flat[:2000], "norm")
    assert pvalue > 0.01, pvalue


def test_sde_sampler_matches_data_std():
    model = _model()
    samples = jax.jit(
        lambda m, k: m.sample_stochastic(k, (64, 128, 3), s_churn=0.5)
    )(model, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(samples)).all()
    np.testing.assert_allclose(float(samples.std()), S_DATA, rtol=0.05)


def test_ode_deterministic_in_latent():
    """Same key => identical samples (the ODE path adds zero churn noise)."""
    model = _model()
    s1 = model.sample(jax.random.PRNGKey(3), (2, 16, 3))
    s2 = model.sample(jax.random.PRNGKey(3), (2, 16, 3))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_sample_details_trajectory():
    model = _model(n_steps=16)
    details = model.sample(jax.random.PRNGKey(4), (2, 8, 3), return_details=True)
    assert details.trajectory_diff.shape == (15, 2, 8, 3)
    np.testing.assert_allclose(
        np.asarray(details.trajectory_diff[-1]), np.asarray(details.sample_diff)
    )


def test_logp_matches_analytic_gaussian():
    """For a linear (Gaussian) model the Hutchinson estimator is exact and
    the augmented ODE must recover the true logpdf."""
    model = _model(n_steps=128, sigma_max=40.0)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 3)) * S_DATA
    logp = jax.jit(lambda m, k, x: m.evaluate_logp(k, x))(
        model, jax.random.PRNGKey(6), x
    )
    expected = scipy.stats.norm(scale=S_DATA).logpdf(np.asarray(x)).sum(axis=(-2, -1))
    np.testing.assert_allclose(np.asarray(logp), expected, rtol=0.02)


def test_heun_sampler_trajectory_shapes():
    def denoise_fn(sigma, x):
        return x * S_DATA**2 / (S_DATA**2 + sigma**2)

    sigmas = Schedule(sigma_max=10.0, n_solver_steps=8).solver_grid()
    x0 = 10.0 * jax.random.normal(jax.random.PRNGKey(7), (2, 8, 3))
    x, traj = heun_sampler(
        denoise_fn, sigmas, x0, jax.random.PRNGKey(8), save_trajectory=True
    )
    assert x.shape == (2, 8, 3)
    assert traj.shape == (7, 2, 8, 3)


def test_inpaint_prefers_known_distribution():
    """Completion conditioned on points from N(0, s^2) should land near the
    data distribution."""
    model = _model(n_steps=32)
    known = S_DATA * jax.random.normal(jax.random.PRNGKey(9), (2, 64, 3))
    out = jax.jit(
        lambda m, k, kn: m.sample_inpaint(k, kn, 32, s_churn=0.5, n_substeps=2)
    )(model, jax.random.PRNGKey(10), known)
    assert out.shape == (2, 32, 3)
    np.testing.assert_allclose(float(out.std()), S_DATA, rtol=0.2)


def test_upsample_statistics():
    model = _model(n_steps=32)
    data = S_DATA * jax.random.normal(jax.random.PRNGKey(11), (2, 64, 3))
    out = jax.jit(lambda m, k, d: m.upsample(k, d, 48, n_substeps=2))(
        model, jax.random.PRNGKey(12), data
    )
    assert out.shape == (2, 48, 3)
    np.testing.assert_allclose(float(out.std()), S_DATA, rtol=0.2)


def test_upsample_unaligned_n_new():
    """n_new need not be a multiple of the fused kernels' 128-point tile:
    upsample generates up to the next multiple internally (points are
    exchangeable, so this is exact) and slices back — the reference's
    n_new=100_000 notebook protocol works verbatim."""
    model = _model(n_steps=16)
    data = S_DATA * jax.random.normal(jax.random.PRNGKey(13), (2, 64, 3))
    out = jax.jit(lambda m, k, d: m.upsample(k, d, 200, n_substeps=1))(
        model, jax.random.PRNGKey(14), data
    )
    assert out.shape == (2, 200, 3)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(float(out.std()), S_DATA, rtol=0.2)
