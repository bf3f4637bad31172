"""Parity extras: divergence_fn plumbing, c_noise conventions, Frozen,
config importability, sequence-parallel numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule, Schedule
from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork
from gecco_tpu.utils import Frozen, Linear


def _tiny(key, **sched_kw):
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk, n_layers=1, feature_dim=32, num_inducers=4, embed_dim=1, num_heads=4,
        compute_dtype=jnp.float32,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=32)
    sched = LogUniformSchedule(sigma_max=10.0, n_solver_steps=8, **sched_kw)
    return Diffusion.init(net, sched)


def test_c_noise_conventions():
    s = Schedule()
    np.testing.assert_allclose(float(s.c_noise(jnp.array(3.0))), 3.0)
    s_torch = Schedule(c_noise_mode="log_quarter")
    np.testing.assert_allclose(
        float(s_torch.c_noise(jnp.array(3.0))), np.log(3.0) / 4, rtol=1e-6
    )


def test_custom_divergence_fn():
    def l1(a, b):
        return jnp.abs(a - b).mean(axis=(-2, -1))

    model = _tiny(jax.random.PRNGKey(0))
    model_l1 = model.replace(divergence_fn=l1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 3))
    key = jax.random.PRNGKey(2)
    loss_mse = float(model.loss(x, None, key))
    loss_l1 = float(model_l1.loss(x, None, key))
    assert np.isfinite(loss_l1) and loss_l1 != loss_mse


def test_frozen_blocks_gradients():
    lin = Linear.init(jax.random.PRNGKey(0), 4, 4)
    frozen = Frozen(inner=lin)
    x = jnp.ones((2, 4))

    grads = jax.grad(lambda f: f(x).sum())(frozen)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(grads))
    # unfrozen control
    grads2 = jax.grad(lambda l: l(x).sum())(lin)
    assert any(float(jnp.abs(g).max()) > 0.0 for g in jax.tree.leaves(grads2))


def test_all_configs_importable():
    import os

    from gecco_tpu.config import load_config

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in sorted(os.listdir(cfg_dir)):
        if not name.endswith(".py"):
            continue
        config = load_config(os.path.join(cfg_dir, name))
        for attr in ("make_model", "make_train_loader", "make_val_loader", "train"):
            assert hasattr(config, attr), (name, attr)
        # models must build (loaders need real data; skip those)
        model = config.make_model(jax.random.PRNGKey(0))
        assert hasattr(model, "denoise")


def test_sequence_parallel_matches_single_device():
    """Points sharded over the 'seq' axis must give the same loss/grads as
    unsharded execution (SURVEY.md §5.7 extension)."""
    from gecco_tpu.parallel import make_mesh, replicate, shard_batch
    from gecco_tpu.train import make_train_step
    from gecco_tpu.types import Example

    model = _tiny(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    pts = np.random.default_rng(0).normal(size=(8, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    mesh = make_mesh(data=4, seq=2)
    model_r = replicate(jax.tree.map(jnp.copy, model), mesh)
    batch = shard_batch(Example(pts, None), mesh, shard_points=True)

    step = make_train_step(opt)
    loss_a, model_a, _, _ = step(
        model, jax.tree.map(jnp.copy, model), opt.init(model), jnp.asarray(pts), None, key
    )
    loss_b, model_b, _, _ = step(
        model_r, jax.tree.map(jnp.copy, model_r), opt.init(model_r),
        batch.points, batch.ctx, key,
    )
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-4)
    wa = np.asarray(jax.tree.leaves(model_a)[0])
    wb = np.asarray(jax.tree.leaves(model_b)[0])
    np.testing.assert_allclose(wa, wb, rtol=1e-3, atol=1e-6)


def test_shape_checks_raise():
    import pytest

    model = _tiny(jax.random.PRNGKey(0))
    bad = jnp.zeros((16, 3))  # missing batch dim
    with pytest.raises(ValueError, match="B, N, D"):
        model.denoise(1.0, bad)
    good = jnp.zeros((2, 16, 3))
    with pytest.raises(ValueError, match="does not match"):
        model.denoise(jnp.ones((3,)), good)


def test_hyperparameter_fitting():
    from gecco_tpu.data import dataloader
    from gecco_tpu.types import Example
    from gecco_tpu.utils.hyperparams import fit_gaussian_reparam, fit_sigma_max

    class DS:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.clouds = rng.normal(1.0, 2.0, size=(16, 32, 3)).astype(np.float32)

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return Example(self.clouds[i], None)

    loader = dataloader(DS(), batch_size=4, fixed_sampler=True, num_workers=1)
    reparam = fit_gaussian_reparam(loader, n_batches=4)
    np.testing.assert_allclose(np.asarray(reparam.mean), [1.0] * 3, atol=0.4)
    np.testing.assert_allclose(np.asarray(reparam.std), [2.0] * 3, atol=0.4)

    loader2 = dataloader(DS(), batch_size=4, fixed_sampler=True, num_workers=1)
    smax = fit_sigma_max(loader2, reparam=reparam, n_batches=2)
    assert 2.0 < smax < 20.0  # normalised pairwise distances, N(0,1)-ish


def test_shape_checks_on_all_entry_points():
    import pytest

    model = _tiny(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    bad = jnp.zeros((16, 3))  # missing batch dim
    with pytest.raises(ValueError, match="B, N, D"):
        model.loss(bad, None, key)
    with pytest.raises(ValueError, match="B, N, D"):
        model.sample_inpaint(key, bad, 4)
    with pytest.raises(ValueError, match="B, N, D"):
        model.upsample(key, bad, 4)
    with pytest.raises(ValueError, match="B, N, D"):
        model.evaluate_logp(key, bad)
    with pytest.raises(ValueError, match="shape must be"):
        model.sample(key, (16, 3))
    with pytest.raises(ValueError, match="shape must be"):
        model.sample_stochastic(key, (16, 3))


def test_dropout_key_plumbing_and_inference_mode():
    """With dropout_p > 0 the loss must be stochastic in training mode and
    deterministic in train_in_inference_mode (reference training.py:158,
    472-475: eqx.tree_inference toggling dropout)."""
    from gecco_tpu.models.mlp import MLP

    key = jax.random.PRNGKey(0)
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk, n_layers=2, feature_dim=32, num_inducers=4, embed_dim=1, num_heads=4,
        compute_dtype=jnp.float32,
    )
    # switch on dropout in every MLP of the stacked layers
    backbone = jax.tree.map(
        lambda m: m.replace(dropout_p=0.5) if isinstance(m, MLP) else m,
        backbone,
        is_leaf=lambda m: isinstance(m, MLP),
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=32)
    sched = LogUniformSchedule(sigma_max=10.0, n_solver_steps=8)
    model = Diffusion.init(net, sched)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 3))
    k = jax.random.PRNGKey(2)

    # training mode: two different keys give different losses (dropout fires)
    l1 = float(model.loss(x, None, jax.random.fold_in(k, 0)))
    # same key, same loss: determinism given the key
    l1_again = float(model.loss(x, None, jax.random.fold_in(k, 0)))
    assert l1 == l1_again

    # inference mode: dropout off -> differs from training mode with same key
    l_inf = float(
        model.loss(x, None, jax.random.fold_in(k, 0), train_in_inference_mode=True)
    )
    assert l_inf != l1

    # inference mode ignores the network key entirely: the only remaining
    # stochasticity is sigma/noise sampling, which is key-determined
    l_inf2 = float(
        model.loss(x, None, jax.random.fold_in(k, 0), train_in_inference_mode=True)
    )
    assert l_inf == l_inf2


def test_ode_sampler_matches_pre_churn_refactor():
    """The s_churn=0 static fast path must be bit-identical to the generic
    path's math (churn noise with std 0 added nothing, but consumed RNG; the
    result itself is deterministic so values must match exactly)."""
    from gecco_tpu.diffusion.samplers import heun_sampler

    model = _tiny(jax.random.PRNGKey(0))
    sigmas = model.schedule.solver_grid()
    x0 = 10.0 * jax.random.normal(jax.random.PRNGKey(3), (2, 16, 3))
    denoise_fn = lambda s, x: model.denoise(s, x)

    x_fast, _ = heun_sampler(
        denoise_fn, sigmas, x0, jax.random.PRNGKey(4), s_churn=0.0, heun_on_last=True
    )
    # reference slow path: explicitly add zero-std churn noise
    def slow(x, key):
        for i in range(sigmas.shape[0] - 1):
            key, ck = jax.random.split(key)
            s_cur, s_next = sigmas[i], sigmas[i + 1]
            x = x + 0.0 * jax.random.normal(ck, x.shape)
            d = (x - denoise_fn(s_cur, x)) / s_cur
            x_e = x + (s_next - s_cur) * d
            d2 = (x_e - denoise_fn(s_next, x_e)) / s_next
            x = x + (s_next - s_cur) * 0.5 * (d + d2)
        return x

    x_ref = slow(x0, jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(x_fast), np.asarray(x_ref), rtol=1e-5)
