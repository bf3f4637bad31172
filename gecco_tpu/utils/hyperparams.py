"""Dataset-driven hyperparameter fitting.

The reference fits sigma_max and reparam statistics interactively
(gecco-torch/notebooks/find_hyperparameters.ipynb: sigma_max = max pairwise
distance in diffusion space; gecco-jax/release-notebooks/compute-sigma.ipynb)
— these are the scripted equivalents.
"""

from __future__ import annotations

import numpy as np

from gecco_tpu.geometry import distance_matrix
from gecco_tpu.reparam import GaussianReparam

__all__ = ["fit_sigma_max", "fit_gaussian_reparam", "fit_uvl_stats"]


def _collect_points(loader, n_batches):
    batches = []
    for i, batch in enumerate(loader):
        batches.append(np.asarray(batch.points))
        if n_batches is not None and i + 1 >= n_batches:
            break
    return np.concatenate(batches, axis=0)


def fit_gaussian_reparam(loader, n_batches: int = 16) -> GaussianReparam:
    """Per-axis mean/std over a data sample (reparam.py:121-148 statistics)."""
    pts = _collect_points(loader, n_batches)
    flat = pts.reshape(-1, pts.shape[-1])
    return GaussianReparam.init(flat.mean(axis=0), flat.std(axis=0))


def fit_sigma_max(loader, reparam=None, ctx=None, n_batches: int = 16) -> float:
    """sigma_max = max pairwise distance between diffusion-space points
    (find_hyperparameters.ipynb final cell): noise at sigma_max must be able
    to carry any point to any other."""
    import jax.numpy as jnp

    pts = _collect_points(loader, n_batches)
    x = jnp.asarray(pts)
    if reparam is not None:
        x = reparam.data_to_diffusion(x, ctx)
    # max over per-cloud pairwise distances (block over clouds to bound memory)
    best = 0.0
    for i in range(x.shape[0]):
        d = distance_matrix(x[i], x[i])
        best = max(best, float(d.max()))
    return best


def fit_uvl_stats(loader, reparam, n_batches: int = 16):
    """Fit uvl_mean/uvl_std for UVLReparam from conditional data: push
    (points, K) through the unnormalised uvl map and take moments
    (reparam.py:184-185 were fit this way)."""
    import jax.numpy as jnp

    base = reparam.replace(
        uvl_mean=jnp.zeros(3), uvl_std=jnp.ones(3)
    )
    uvls = []
    for i, batch in enumerate(loader):
        xyz = jnp.asarray(np.asarray(batch.points))
        uvl = base.data_to_diffusion(xyz, batch.ctx)
        uvls.append(np.asarray(uvl).reshape(-1, 3))
        if n_batches is not None and i + 1 >= n_batches:
            break
    flat = np.concatenate(uvls, axis=0)
    flat = flat[np.isfinite(flat).all(axis=1)]
    return reparam.replace(
        uvl_mean=jnp.asarray(flat.mean(axis=0)),
        uvl_std=jnp.asarray(flat.std(axis=0)),
    )
