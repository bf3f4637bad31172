"""Vis callbacks (figure/mesh logging surfaces) and init schemes."""

import jax
import jax.numpy as jnp
import numpy as np

from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork
from gecco_tpu.models.gpt_init import gpt_init
from gecco_tpu.types import Example
from gecco_tpu.utils.logging import JsonlWriter, MockWriter


def _tiny_model(key, geom_dim=2, skip_scale=0.1):
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk,
        n_layers=2,
        feature_dim=32,
        num_inducers=4,
        embed_dim=1,
        num_heads=4,
        compute_dtype=jnp.float32,
        skip_scale=skip_scale,
    )
    net = UnconditionalPointNetwork.init(
        nk, backbone, feature_dim=32, geometry_dim=geom_dim
    )
    sched = LogUniformSchedule(sigma_max=10.0, n_solver_steps=8)
    return Diffusion.init(net, sched)


class _RecordingWriter(MockWriter):
    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        def record(tag, *args, global_step=None, **kw):
            self.calls.append((name, tag))

        return record


def test_gpt_init_scales_out_projections():
    model = _tiny_model(jax.random.PRNGKey(0), skip_scale=1.0)
    backbone = model.network.backbone
    inited = gpt_init(backbone)
    scale = 1.0 / np.sqrt(2 * backbone.n_layers)
    np.testing.assert_allclose(
        np.asarray(inited.layers.broadcast.unpool.out_proj.weight),
        np.asarray(backbone.layers.broadcast.unpool.out_proj.weight) * scale,
        rtol=1e-6,
    )
    # biases zeroed in MLPs
    assert float(jnp.abs(inited.layers.mlp.layers[-1].bias).max()) == 0.0
    # forward still works
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    y = inited(x, jnp.ones((2, 1)))
    assert np.isfinite(np.asarray(y)).all()


def test_sample_figures_callback():
    from gecco_tpu.vis import make_sample_figures_callback

    model = _tiny_model(jax.random.PRNGKey(2))
    writer = _RecordingWriter()
    cb = make_sample_figures_callback(n_samples=2, n_points=16, geom_dim=2)
    cb(model, writer, epoch=0)
    tags = [t for _, t in writer.calls]
    assert "samples/scatter" in tags
    assert "samples/trajectories" in tags


def test_denoise_callback():
    from gecco_tpu.vis import make_denoise_callback

    model = _tiny_model(jax.random.PRNGKey(3))
    data = np.random.default_rng(0).normal(size=(32, 2)).astype(np.float32)
    writer = _RecordingWriter()
    make_denoise_callback(data, n_sigmas=3)(model, writer, epoch=1)
    assert ("add_figure", "denoising") in writer.calls


def test_unconditional_mesh_callback():
    from gecco_tpu.vis import make_unconditional_sample_callback

    model = _tiny_model(jax.random.PRNGKey(4), geom_dim=3)
    writer = _RecordingWriter()
    make_unconditional_sample_callback(n_samples=2, n_points=16)(model, writer, 0)
    assert ("add_mesh", "samples") in writer.calls


def test_pc_vis_callback_unconditional():
    from gecco_tpu.vis import PCVisCallback

    model = _tiny_model(jax.random.PRNGKey(5), geom_dim=3)
    cb = PCVisCallback(n=2, n_steps=4)
    batch = Example(
        np.random.default_rng(0).normal(size=(4, 16, 3)).astype(np.float32), None
    )
    cb.set_batch(batch)
    writer = _RecordingWriter()
    cb(model, writer, epoch=0)
    assert ("add_mesh", "val/samples") in writer.calls


def test_jsonl_writer(tmp_path):
    import json

    with JsonlWriter(str(tmp_path)) as w:
        w.add_scalar("train/loss", scalar_value=1.5, global_step=3)
    records = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert records[0]["tag"] == "train/loss"
    assert records[0]["value"] == 1.5


def test_trajectories_polylines():
    from gecco_tpu.vis import plot_trajectories_3d, trajectories_to_polylines

    traj = np.random.default_rng(0).normal(size=(5, 8, 3)).astype(np.float32)
    verts = trajectories_to_polylines(traj)
    assert verts.shape == (8 * 6, 3)  # T+1 rows per point, NaN separators
    assert np.isnan(verts[5]).all()
    fig = plot_trajectories_3d(traj)
    assert fig is not None


def test_conditional_render_callback():
    from gecco_tpu.types import Context3d
    from gecco_tpu.vis import ConditionalRenderCallback

    model = _tiny_model(jax.random.PRNGKey(6), geom_dim=3)
    cb = ConditionalRenderCallback(n=2, n_steps=4)
    rng = np.random.default_rng(0)
    batch = Example(
        rng.normal(size=(2, 16, 3)).astype(np.float32),
        Context3d(
            image=rng.random((2, 16, 16, 3)).astype(np.float32),
            K=np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
        ),
    )
    cb.set_batch(batch)
    writer = _RecordingWriter()
    cb(model, writer, epoch=0)
    assert ("add_figure", "conditional/renders") in writer.calls


def test_render_cloud_backends():
    """'auto' falls back to matplotlib when mitsuba is absent; 'mitsuba'
    raises a clean ImportError (the optional path-traced backend,
    ref vis/conditional3d.py:104-192)."""
    import numpy as np
    import pytest

    from gecco_tpu.vis.conditional3d import render_cloud
    from gecco_tpu.vis.mitsuba_render import mitsuba_available

    pts = np.random.default_rng(0).normal(size=(64, 3))
    fig = render_cloud(pts, backend="auto")
    assert fig is not None
    if not mitsuba_available():
        with pytest.raises(ImportError):
            render_cloud(pts, backend="mitsuba")
