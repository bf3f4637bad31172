"""3-D visualisation callbacks: tensorboard meshes and matplotlib scatter.

Parity with gecco-jax/src/gecco_jax/vis/vis3d.py:11-53 (latent-colored
unconditional sample meshes) and gecco-torch/src/gecco_torch/vis.py:10-126
(``plot_3d`` and the GT-vs-samples ``PCVisCallback``)."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from gecco_tpu.types import Example

__all__ = ["plot_3d", "make_unconditional_sample_callback", "PCVisCallback"]

_MESH_CONFIG = {"material": {"cls": "PointsMaterial", "size": 0.1}}


def plot_3d(clouds, colors=("r", "g", "b"), shared_ax: bool = True):
    """Matplotlib scatter of one or more point clouds
    (torch ref vis.py:10-46)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not isinstance(clouds, (list, tuple)):
        clouds = [clouds]
    n = 1 if shared_ax else len(clouds)
    fig, axes = plt.subplots(
        1, n, subplot_kw={"projection": "3d"}, figsize=(6 * n, 6), squeeze=False
    )
    for i, cloud in enumerate(clouds):
        ax = axes[0, 0] if shared_ax else axes[0, i]
        pts = np.asarray(cloud)
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1, c=colors[i % len(colors)])
    return fig


def make_unconditional_sample_callback(
    geom_dim: int = 3,
    n_samples: int = 8,
    n_points: int = 2048,
    point_size: float = 0.1,
    key=None,
):
    """Log sampled clouds as tensorboard meshes, colored by latent norm
    (jax ref vis3d.py:11-53)."""
    if key is None:
        key = jax.random.PRNGKey(42)

    def callback(model, logger, epoch: int):
        import matplotlib.pyplot as plt

        details = jax.jit(
            lambda m, k: m.sample(
                k, (n_samples, n_points, geom_dim), return_details=True
            )
        )(model, key)

        points = np.asarray(details.sample_data)
        latent = np.asarray(details.latent)
        latent_r = np.linalg.norm(latent, axis=-1)
        r_normalized = 1.0 - np.clip(
            latent_r / (2 * model.schedule.sigma_max), 0.0, 1.0
        )
        colors = plt.get_cmap("viridis")(r_normalized, bytes=True)[..., :3]

        logger.add_mesh(
            tag="samples",
            vertices=points,
            colors=colors,
            global_step=epoch,
            config_dict={"material": {"cls": "PointsMaterial", "size": point_size}},
        )

    return callback


class PCVisCallback:
    """Trainer callback: log context images once, then GT (green) vs sampled
    (red) clouds each validation phase (torch ref vis.py:49-126).

    Bind a fixed batch with ``set_batch`` (the trainer's val loader is
    deterministic, so the first validation batch is reproducible)."""

    def __init__(self, n: int = 8, n_steps: int = 64, point_size: float = 0.1):
        self.n = n
        self.n_steps = n_steps
        self.point_size = point_size
        self.batch: Optional[Example] = None
        self._logged_images = False
        self._key = jax.random.PRNGKey(42)
        # jit ONCE per callback: a fresh jax.jit(lambda ...) every validation
        # phase recompiles the full sampler each time (minutes on a
        # cold-compile runtime) — same fix as BenchmarkCallback (VERDICT r3 #5)
        self._sample_fn = jax.jit(
            lambda m, k, c, shape: m.sample_stochastic(
                k, shape, raw_ctx=c, s_churn=0.5, n_solver_steps=self.n_steps
            ),
            static_argnums=(3,),
        )

    def set_batch(self, batch: Example):
        from gecco_tpu.types import batch_index

        self.batch = batch_index(batch.discard_extras(), slice(0, self.n))

    def __call__(self, model, logger, epoch: int):
        if self.batch is None:
            return
        batch = self.batch

        has_ctx = batch.ctx is not None and getattr(batch.ctx, "image", None) is not None
        if has_ctx and not self._logged_images:
            self._logged_images = True
            for i, image in enumerate(np.asarray(batch.ctx.image)):
                logger.add_image(
                    tag=f"val/context_image_{i}",
                    img_tensor=image.transpose(2, 0, 1),
                    global_step=epoch,
                )

        samples = self._sample_fn(
            model, self._key, batch.ctx, np.asarray(batch.points).shape
        )
        samples = np.asarray(samples)

        if not has_ctx:
            vertices, colors = samples, None
        else:
            gt = np.asarray(batch.points)
            vertices = np.concatenate([gt, samples], axis=1)
            colors = np.zeros(vertices.shape, dtype=np.uint8)
            colors[:, : gt.shape[1], 1] = 255  # green ground truth
            colors[:, gt.shape[1]:, 0] = 255  # red samples

        logger.add_mesh(
            tag="val/samples",
            vertices=vertices,
            colors=colors,
            global_step=epoch,
            config_dict={"material": {"cls": "PointsMaterial", "size": self.point_size}},
        )
