"""Geometry tests (ref: gecco-jax/src/gecco_jax/geometry.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gecco_tpu.geometry import distance_matrix, project_points, unproject_points


def test_distance_matrix_brute_force():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (2, 10, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 3))
    dm = distance_matrix(a, b)
    brute = np.linalg.norm(
        np.asarray(a)[:, :, None, :] - np.asarray(b)[:, None, :, :], axis=-1
    )
    np.testing.assert_allclose(np.asarray(dm), brute, rtol=1e-4, atol=1e-5)


def test_distance_matrix_nan_safe():
    a = jnp.zeros((5, 3))
    dm = distance_matrix(a, a)
    assert np.isfinite(np.asarray(dm)).all()


def test_project_unproject_roundtrip():
    K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])
    key = jax.random.PRNGKey(2)
    xyz = jax.random.uniform(key, (100, 3), minval=-1.0, maxval=1.0)
    xyz = xyz.at[:, 2].set(xyz[:, 2] + 3.0)  # in front of the camera

    wh = project_points(xyz, K)
    depth = jnp.linalg.norm(xyz, axis=-1)
    back = unproject_points(wh, depth, K, normalized=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyz), rtol=1e-4, atol=1e-4)


def test_project_batched_broadcast():
    K = jnp.eye(3)[None].repeat(4, axis=0)  # [4, 3, 3]
    xyz = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 3)) + jnp.array([0, 0, 5.0])
    wh = project_points(xyz, K[:, None, :, :])
    assert wh.shape == (4, 16, 2)
    expected = np.asarray(xyz)[..., :2] / np.asarray(xyz)[..., 2:]
    np.testing.assert_allclose(np.asarray(wh), expected, rtol=1e-4, atol=1e-5)
