"""2-D diffusion visualisations for toy data and trajectory debugging.

Parity with gecco-jax/src/gecco_jax/vis/vis2d.py:21-384: trajectory plots,
sample scatter figures, and denoising-quality figures over noise levels, all
logged to tensorboard as matplotlib figures."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "plot_trajectories_2d",
    "make_sample_figures_callback",
    "make_denoise_callback",
    "make_logp_callback",
]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_trajectories_2d(trajectory, max_lines: int = 256):
    """Plot per-point diffusion trajectories ``[T, N, 2]``
    (vis2d.py:21-66)."""
    plt = _plt()
    traj = np.asarray(trajectory)
    fig, ax = plt.subplots(tight_layout=True)
    n = min(traj.shape[1], max_lines)
    for i in range(n):
        ax.plot(traj[:, i, 0], traj[:, i, 1], lw=0.3, alpha=0.5, color="C0")
    ax.scatter(traj[-1, :n, 0], traj[-1, :n, 1], s=2, color="C1")
    ax.set_aspect("equal")
    return fig


def make_sample_figures_callback(
    n_samples: int = 4, n_points: int = 256, geom_dim: int = 2, key=None
):
    """Scatter figures of fresh samples (vis2d.py:189-269)."""
    if key is None:
        key = jax.random.PRNGKey(42)

    def callback(model, logger, epoch: int):
        plt = _plt()
        details = jax.jit(
            lambda m, k: m.sample(
                k, (n_samples, n_points, geom_dim), return_details=True
            )
        )(model, key)
        samples = np.asarray(details.sample_data)

        fig, axes = plt.subplots(1, n_samples, figsize=(4 * n_samples, 4))
        axes = np.atleast_1d(axes)
        for i, ax in enumerate(axes):
            ax.scatter(samples[i, :, 0], samples[i, :, 1], s=2)
            ax.set_aspect("equal")
        logger.add_figure("samples/scatter", figure=fig, global_step=epoch)

        traj_fig = plot_trajectories_2d(np.asarray(details.trajectory_data)[:, 0])
        logger.add_figure("samples/trajectories", figure=traj_fig, global_step=epoch)

    return callback


def make_logp_callback(data_points, grid_range: float = 2.0, grid_res: int = 24, key=None):
    """Log-likelihood heatmap over a 2-D grid with the data overlaid
    (vis2d.py:104-186). ``data_points``: one example [N, 2]."""
    if key is None:
        key = jax.random.PRNGKey(42)
    data_points = np.asarray(data_points)

    def callback(model, logger, epoch: int):
        plt = _plt()
        lin = np.linspace(-grid_range, grid_range, grid_res)
        gx, gy = np.meshgrid(lin, lin)
        grid = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel()], axis=-1)[:, None, :]
        )  # [G, 1, 2] — one-point "clouds"
        logp = np.asarray(
            jax.jit(lambda m, k, x: m.evaluate_logp(k, x, n_solver_steps=8))(
                model, key, grid
            )
        ).reshape(grid_res, grid_res)

        fig, ax = plt.subplots(tight_layout=True)
        im = ax.imshow(
            logp,
            origin="lower",
            extent=[-grid_range, grid_range, -grid_range, grid_range],
        )
        ax.scatter(data_points[:, 0], data_points[:, 1], s=2, c="r")
        fig.colorbar(im)
        logger.add_figure("logp/heatmap", figure=fig, global_step=epoch)

    return callback


def make_denoise_callback(data_points, n_sigmas: int = 6, key=None):
    """Show denoise(x + sigma*eps) across noise levels against ground truth
    (vis2d.py:272-384). ``data_points``: one example [N, D]."""
    if key is None:
        key = jax.random.PRNGKey(42)
    data_points = np.asarray(data_points)

    def callback(model, logger, epoch: int):
        plt = _plt()
        sigmas = np.geomspace(
            model.schedule.sigma_min * 10, model.schedule.sigma_max, n_sigmas
        )
        x = jnp.asarray(data_points)[None]

        fig, axes = plt.subplots(1, n_sigmas, figsize=(3 * n_sigmas, 3))
        for ax, sigma in zip(np.atleast_1d(axes), sigmas):
            noise_key = jax.random.fold_in(key, int(sigma * 1000) % 2**30)
            perturbed = x + sigma * jax.random.normal(noise_key, x.shape)
            denoised = np.asarray(
                jax.jit(lambda m, s, p: m.denoise(s, p))(
                    model, jnp.full((1,), sigma), perturbed
                )
            )[0]
            ax.scatter(data_points[:, 0], data_points[:, 1], s=2, c="g", label="gt")
            ax.scatter(denoised[:, 0], denoised[:, 1], s=2, c="r", label="denoised")
            ax.set_title(f"sigma={sigma:.2f}")
            ax.set_aspect("equal")
        axes_flat = np.atleast_1d(axes)
        axes_flat[0].legend()
        logger.add_figure("denoising", figure=fig, global_step=epoch)

    return callback
