"""Conditional-generation render callback.

Parity with gecco-jax/src/gecco_jax/vis/conditional3d.py:104-417 in spirit:
for a fixed conditional validation batch, render side-by-side (context image,
ground-truth cloud, sampled cloud) panels each validation phase. The
reference path-traces with Mitsuba; Mitsuba is optional here — when absent we
render matplotlib scatter projections colored by depth, which carries the
same signal into tensorboard.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from gecco_tpu.types import Example, batch_index

__all__ = ["ConditionalRenderCallback", "render_cloud"]


def render_cloud(
    points: np.ndarray,
    ax=None,
    elev: float = 20.0,
    azim: float = -60.0,
    backend: str = "matplotlib",
):
    """Render one cloud [N, 3].

    ``backend``: "matplotlib" (depth-colored scatter, always available),
    "mitsuba" (path-traced spheres, matching the reference's fidelity —
    requires the optional mitsuba package), or "auto" (mitsuba when
    importable, else matplotlib). The mitsuba backend returns a uint8 image
    array rather than a figure.
    """
    if backend in ("mitsuba", "auto"):
        from gecco_tpu.vis.mitsuba_render import (
            mitsuba_available,
            render_cloud_mitsuba,
        )

        if mitsuba_available():
            return render_cloud_mitsuba(np.asarray(points))
        if backend == "mitsuba":
            raise ImportError(
                "mitsuba is not installed; use backend='matplotlib' or 'auto'"
            )

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        fig = plt.figure(figsize=(4, 4))
        ax = fig.add_subplot(projection="3d")
    pts = np.asarray(points)
    depth = pts[:, 2]
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1, c=depth, cmap="viridis")
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    return ax.get_figure()


class ConditionalRenderCallback:
    """Render (context image | GT cloud | sample) rows for ``n`` fixed
    validation examples each validation phase."""

    def __init__(self, n: int = 4, n_steps: int = 64, s_churn: float = 0.5):
        self.n = n
        self.n_steps = n_steps
        self.s_churn = s_churn
        self.batch: Optional[Example] = None
        self._key = jax.random.PRNGKey(42)

    def set_batch(self, batch: Example):
        self.batch = batch_index(batch.discard_extras(), slice(0, self.n))

    def __call__(self, model, logger, epoch: int):
        if self.batch is None or self.batch.ctx is None:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        batch = self.batch
        samples = np.asarray(
            jax.jit(
                lambda m, k, c: m.sample_stochastic(
                    k,
                    np.asarray(batch.points).shape,
                    raw_ctx=c,
                    s_churn=self.s_churn,
                    n_solver_steps=self.n_steps,
                )
            )(model, self._key, batch.ctx)
        )

        images = np.asarray(batch.ctx.image) if batch.ctx.image is not None else None
        gt = np.asarray(batch.points)

        fig = plt.figure(figsize=(9, 3 * self.n), tight_layout=True)
        for i in range(min(self.n, gt.shape[0])):
            if images is not None:
                ax = fig.add_subplot(self.n, 3, 3 * i + 1)
                ax.imshow(np.clip(images[i], 0, 1))
                ax.set_axis_off()
            ax_gt = fig.add_subplot(self.n, 3, 3 * i + 2, projection="3d")
            render_cloud(gt[i], ax=ax_gt)
            ax_s = fig.add_subplot(self.n, 3, 3 * i + 3, projection="3d")
            render_cloud(samples[i], ax=ax_s)

        logger.add_figure("conditional/renders", figure=fig, global_step=epoch)
