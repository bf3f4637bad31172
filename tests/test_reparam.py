"""Reparameterisation round-trips and analytic ladj vs autodiff
(ref: gecco-jax/src/gecco_jax/models/reparam.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gecco_tpu.reparam import GaussianReparam, Reparam, UVLReparam
from gecco_tpu.types import Context3d


def _autodiff_ladj(fn, points):
    """Reference-style per-point jacrev + slogdet (reparam.py:27-48)."""

    def single(p):
        jac = jax.jacrev(fn)(p)
        return jnp.linalg.slogdet(jac)[1]

    return jax.vmap(single)(points).sum()


def test_identity_reparam():
    r = Reparam()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 3))
    np.testing.assert_array_equal(np.asarray(r.data_to_diffusion(x, None)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(r.ladj_data_to_diffusion(x, None)), 0.0)


def test_gaussian_roundtrip_and_ladj():
    r = GaussianReparam.init(mean=[0.1, -0.2, 0.3], std=[1.5, 0.7, 2.0])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3))
    diff = r.data_to_diffusion(x, None)
    back = r.diffusion_to_data(diff, None)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-6)

    ladj = r.ladj_data_to_diffusion(x, None)
    expected = _autodiff_ladj(lambda p: r.data_to_diffusion(p[None], None)[0], x[0])
    np.testing.assert_allclose(np.asarray(ladj[0]), np.asarray(expected), rtol=1e-3)

    # inverse ladj is the negation
    ladj_inv = r.ladj_diffusion_to_data(diff, None)
    np.testing.assert_allclose(
        np.asarray(ladj + ladj_inv), np.zeros(2), atol=1e-4
    )


def test_gaussian_from_data():
    pts = np.random.default_rng(0).normal(2.0, 3.0, size=(10, 100, 3)).astype(np.float32)
    r = GaussianReparam.from_data(pts)
    np.testing.assert_allclose(np.asarray(r.mean), pts.reshape(-1, 3).mean(0), rtol=1e-4)
    diff = r.data_to_diffusion(jnp.asarray(pts), None)
    assert abs(float(diff.mean())) < 0.05
    np.testing.assert_allclose(float(diff.std()), 1.0, atol=0.05)


def _frustum_points(key, b=2, n=12):
    """Random points safely inside the unit-image frustum."""
    K = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])
    K = jnp.broadcast_to(K, (b, 3, 3))
    uv = jax.random.uniform(key, (b, n, 2), minval=0.2, maxval=0.8)
    depth = jax.random.uniform(jax.random.fold_in(key, 1), (b, n), minval=1.0, maxval=3.0)
    # unproject through K: x = (u - 0.5) * z, y = (v - 0.5) * z, with ray-norm depth
    r = UVLReparam.init()
    hwd = jnp.concatenate([uv[..., ::-1], depth[..., None]], axis=-1)
    xyz = r.hwd_to_xyz(hwd, K)
    return xyz, Context3d(image=None, K=K)


def test_uvl_roundtrip():
    xyz, ctx = _frustum_points(jax.random.PRNGKey(2))
    r = UVLReparam.init()
    uvl = r.data_to_diffusion(xyz, ctx)
    back = r.diffusion_to_data(uvl, ctx)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyz), rtol=1e-4, atol=1e-4)


def test_uvl_ladj_vs_autodiff():
    xyz, ctx = _frustum_points(jax.random.PRNGKey(3), b=1, n=6)
    r = UVLReparam.init()

    ladj = r.ladj_data_to_diffusion(xyz, ctx)

    def fn(p):
        return r.data_to_diffusion(p[None, None], Context3d(None, ctx.K[:1]))[0, 0]

    expected = _autodiff_ladj(fn, xyz[0])
    np.testing.assert_allclose(np.asarray(ladj[0]), np.asarray(expected), rtol=1e-3)


def test_uvl_ladj_inverse_consistency():
    xyz, ctx = _frustum_points(jax.random.PRNGKey(4), b=1, n=6)
    r = UVLReparam.init()
    uvl = r.data_to_diffusion(xyz, ctx)
    total = r.ladj_data_to_diffusion(xyz, ctx) + r.ladj_diffusion_to_data(uvl, ctx)
    np.testing.assert_allclose(np.asarray(total), np.zeros(1), atol=1e-3)


def test_uvl_diffusion_to_hw_in_unit_square():
    xyz, ctx = _frustum_points(jax.random.PRNGKey(5))
    r = UVLReparam.init()
    uvl = r.data_to_diffusion(xyz, ctx)
    hw = r.diffusion_to_hw(uvl, ctx.K)
    assert float(hw.min()) >= 0.0
    assert float(hw.max()) <= 1.0
