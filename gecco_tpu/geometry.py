"""Pinhole camera geometry and pairwise distances, batched.

Parity with gecco-jax/src/gecco_jax/geometry.py:8-83 — rewritten for batched
``[..., N, 3]`` inputs using einsum (MXU-friendly) instead of per-point
``jnp.vectorize``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "distance_matrix",
    "project_points",
    "unproject_points",
]


def distance_matrix(a: jnp.ndarray, b: jnp.ndarray, squared: bool = False) -> jnp.ndarray:
    """Pairwise distances between point sets.

    ``a: [..., N, D]``, ``b: [..., M, D]`` -> ``[..., N, M]``. NaN-safe via
    clamping at zero (geometry.py:18-19).
    """
    aa = jnp.einsum("...nd,...nd->...n", a, a)
    bb = jnp.einsum("...md,...md->...m", b, b)
    ab = jnp.einsum("...nd,...md->...nm", a, b)

    dist_sqr = aa[..., :, None] + bb[..., None, :] - 2 * ab
    dist_sqr = jnp.maximum(dist_sqr, 0.0)

    if squared:
        return dist_sqr
    return jnp.sqrt(dist_sqr)


def project_points(
    xyz: jnp.ndarray, camera_matrix: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Project 3-D points through a pinhole camera (geometry.py:79-83).

    ``xyz: [..., 3]``, ``camera_matrix: [..., 3, 3]`` (broadcastable over the
    leading axes) -> image-plane ``(w, h)`` coordinates ``[..., 2]``.

    The dehomogenisation guards against tiny ``z`` exactly like the
    reference's ``convert_points_from_homogeneous`` (geometry.py:39-52).
    """
    xyw = jnp.einsum("...ae,...e->...a", camera_matrix, xyz)
    z = xyw[..., 2:]
    scale = jnp.where(jnp.abs(z) > eps, 1.0 / (z + eps), 1.0)
    return xyw[..., :2] * scale


def unproject_points(
    wh: jnp.ndarray,
    depth: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    normalized: bool = True,
) -> jnp.ndarray:
    """Lift image coordinates + depth back to 3-D (geometry.py:56-76).

    ``wh: [..., 2]``, ``depth: [...]``, ``camera_matrix: [..., 3, 3]``.
    With ``normalized=True`` the ray direction is unit-normalised so ``depth``
    is the Euclidean distance from the camera (the reference's convention).
    """
    ones = jnp.ones_like(wh[..., :1])
    uvw = jnp.concatenate([wh, ones], axis=-1)
    inv_k = jnp.linalg.inv(camera_matrix)
    xyw = jnp.einsum("...ae,...e->...a", inv_k, uvw)
    if normalized:
        xyw = xyw / jnp.linalg.norm(xyw, axis=-1, keepdims=True)
    return xyw * depth[..., None]
