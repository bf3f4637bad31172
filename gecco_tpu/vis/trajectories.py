"""Interactive 3-D diffusion-trajectory plots.

Parity with gecco-jax/src/gecco_jax/vis/trajectories.py:8-70: renders
per-point diffusion trajectories as polylines, NaN-splitting disjoint
segments. Uses k3d when available (the reference's backend), falling back to
a matplotlib 3-D figure otherwise.
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_trajectories_3d", "trajectories_to_polylines"]


def trajectories_to_polylines(trajectory: np.ndarray, max_lines: int = 512):
    """[T, N, 3] -> single [T*N + N, 3] polyline vertex array with NaN rows
    separating per-point segments (the reference's NaN-split trick)."""
    traj = np.asarray(trajectory)[:, :max_lines]
    t, n, d = traj.shape
    nan_row = np.full((1, n, d), np.nan, traj.dtype)
    with_breaks = np.concatenate([traj, nan_row], axis=0)  # [T+1, N, 3]
    return with_breaks.transpose(1, 0, 2).reshape(-1, d)


def plot_trajectories_3d(trajectory, max_lines: int = 512, point_size: float = 0.02):
    """Render trajectories; returns a k3d plot if k3d is importable, else a
    matplotlib figure."""
    traj = np.asarray(trajectory)
    try:
        import k3d

        plot = k3d.plot()
        vertices = trajectories_to_polylines(traj, max_lines).astype(np.float32)
        plot += k3d.line(vertices, width=point_size / 4)
        plot += k3d.points(
            traj[-1, :max_lines].astype(np.float32), point_size=point_size
        )
        return plot
    except ImportError:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
        n = min(traj.shape[1], max_lines)
        for i in range(n):
            ax.plot(
                traj[:, i, 0], traj[:, i, 1], traj[:, i, 2],
                lw=0.3, alpha=0.4, color="C0",
            )
        ax.scatter(
            traj[-1, :n, 0], traj[-1, :n, 1], traj[-1, :n, 2], s=2, color="C1"
        )
        return fig
