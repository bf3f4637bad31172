"""The reference-style benchmark baseline must compute the SAME function as
the optimized framework (same weights), so that bench.py's ``vs_baseline``
compares implementations, not models."""

import jax
import jax.numpy as jnp
import numpy as np

from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
from gecco_tpu.baselines import ref_denoise, ref_sample
from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork


def _model(ref_jax_compat: bool):
    key = jax.random.PRNGKey(0)
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk,
        n_layers=2,
        feature_dim=64,
        num_inducers=8,
        embed_dim=1,
        num_heads=4,
        compute_dtype=jnp.float32,
        ref_jax_compat=ref_jax_compat,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=64)
    sched = LogUniformSchedule(sigma_max=10.0, sigma_min=0.002, n_solver_steps=8)
    return Diffusion.init(
        net, sched, reparam=GaussianReparam.init([0.0] * 3, [1.0] * 3)
    )


def test_ref_denoise_matches_optimized_fp32():
    model = _model(ref_jax_compat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 3))
    sigma = jnp.array([0.1, 1.0, 5.0, 9.0])

    ours = model.denoise(sigma, x)
    ref = ref_denoise(model, sigma, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4, atol=1e-5)


def test_ref_jax_compat_changes_function():
    """The compat flag must actually flip the second-MLP input: the default
    (torch-style) model and the jax-compat model disagree at equal weights."""
    compat = _model(ref_jax_compat=True)
    default = _model(ref_jax_compat=False)  # same seed -> same weights
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 3))

    out_compat = np.asarray(compat.denoise(1.0, x))
    out_default = np.asarray(default.denoise(1.0, x))
    assert not np.allclose(out_compat, out_default, rtol=1e-4)
    # and the ref arm matches the compat one, not the default one
    ref = np.asarray(ref_denoise(compat, 1.0, x))
    np.testing.assert_allclose(out_compat, ref, rtol=2e-4, atol=1e-5)
    assert not np.allclose(out_default, ref, rtol=1e-4)


def test_ref_sample_matches_optimized_sampler():
    """Same weights, same keys-per-example seeding: the reference-structure
    sampler and our scan sampler integrate the same ODE; outputs must agree
    closely (both deterministic Heun on the same grid)."""
    model = _model(ref_jax_compat=True)
    key = jax.random.PRNGKey(2)
    shape = (2, 32, 3)

    ref_out = np.asarray(ref_sample(model, key, shape, n_solver_steps=8))
    assert ref_out.shape == shape
    assert np.isfinite(ref_out).all()

    # our sampler draws one latent for the whole batch; the ref arm draws
    # per-example keys — same distribution, different draws. Check the ODE
    # core instead: integrate our heun_sampler from the ref arm's latent.
    from gecco_tpu.diffusion.samplers import heun_sampler

    sigmas = model.schedule.solver_grid(8)
    keys = jax.random.split(key, shape[0])
    latent = jax.vmap(
        lambda k: sigmas[0] * jax.random.normal(k, shape[1:], jnp.float32)
    )(keys)
    ours_diff, _ = heun_sampler(
        lambda s, x: model.denoise(s, x),
        sigmas,
        latent,
        jax.random.PRNGKey(0),
        heun_on_last=True,
    )
    ours = np.asarray(model.reparam.diffusion_to_data(ours_diff, None))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)
