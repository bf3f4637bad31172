"""Training-loop integration tests: overfit a tiny dataset, checkpoint
resume, multi-device mesh parity (SURVEY.md §4 implications)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
from gecco_tpu.data import dataloader
from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork
from gecco_tpu.parallel import make_mesh
from gecco_tpu.train import Trainer, make_train_step, train
from gecco_tpu.types import Example


def make_model(key, n_steps=8):
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk,
        n_layers=2,
        feature_dim=32,
        num_inducers=4,
        embed_dim=1,
        num_heads=4,
        compute_dtype=jnp.float32,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=32)
    sched = LogUniformSchedule(sigma_max=20.0, n_solver_steps=n_steps)
    return Diffusion.init(net, sched, reparam=GaussianReparam.init([0.0] * 3, [1.0] * 3))


class BlobDataset:
    """Gaussian blobs — learnable by a tiny model in a few steps."""

    def __init__(self, n=32, n_points=16, seed=0):
        rng = np.random.default_rng(seed)
        self.clouds = rng.normal(0, 1.0, size=(n, n_points, 3)).astype(np.float32)

    def __len__(self):
        return len(self.clouds)

    def __getitem__(self, i):
        return Example(self.clouds[i], None)


def test_train_step_decreases_loss():
    model = make_model(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    step_fn = make_train_step(opt)
    ema = jax.tree.map(jnp.copy, model)
    opt_state = opt.init(model)

    pts = jnp.asarray(BlobDataset(64).clouds[:16])
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(30):
        key, sk = jax.random.split(key)
        loss, model, ema, opt_state = step_fn(model, ema, opt_state, pts, None, sk)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert all(np.isfinite(losses))


def test_ema_tracks_model():
    model = make_model(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    step_fn = make_train_step(opt, ema_alpha=0.5)
    ema = jax.tree.map(jnp.copy, model)
    opt_state = opt.init(model)
    pts = jnp.asarray(BlobDataset(8).clouds[:4])
    w_old = np.asarray(jax.tree.leaves(model)[0])  # snapshot before donation
    _, model2, ema2, _ = step_fn(model, ema, opt_state, pts, None, jax.random.PRNGKey(2))
    # EMA moved toward the updated model but not equal to it
    w_new = np.asarray(jax.tree.leaves(model2)[0])
    w_ema = np.asarray(jax.tree.leaves(ema2)[0])
    np.testing.assert_allclose(w_ema, 0.5 * w_old + 0.5 * w_new, rtol=1e-5, atol=1e-7)


def test_trainer_fit_and_resume(tmp_path):
    save_path = str(tmp_path)

    def run(num_steps):
        ds = BlobDataset()
        trainer = Trainer(
            model=lambda key: make_model(key),
            train_dataloader=dataloader(ds, batch_size=8, num_steps=num_steps, num_workers=2),
            val_dataloader=dataloader(ds, batch_size=8, fixed_sampler=True, num_workers=2),
            save_path=save_path,
            save_every=4,
            num_steps=num_steps,
            optimizer=optax.adam(1e-3),
            n_validation_batches=1,
            seed=7,
        )
        trainer.recover_from_checkpoint()
        trainer.fit()
        return trainer

    t1 = run(num_steps=5)
    assert os.path.exists(os.path.join(save_path, "checkpoint-step-3"))
    # resume: a second run picks up from the final checkpoint
    t2 = run(num_steps=8)
    assert t2.initial_step_number > 0


def test_multidevice_mesh_matches_single_device():
    """The mesh-sharded train step must agree with single-device training
    (the reference could only test this with force_pmap, training.py:163)."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"

    model = make_model(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    pts = np.random.default_rng(0).normal(size=(16, 8, 3)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    from gecco_tpu.parallel import replicate, shard_batch

    # 8-device data-parallel mesh (replicate BEFORE step_a donates `model`)
    mesh = make_mesh(data=8)
    model_r = replicate(jax.tree.map(jnp.copy, model), mesh)

    # single device
    step_a = make_train_step(opt)
    loss_a, model_a, _, _ = step_a(
        model, jax.tree.map(jnp.copy, model), opt.init(model), jnp.asarray(pts), None, key
    )
    batch = shard_batch(Example(pts, None), mesh)
    step_b = make_train_step(opt)
    loss_b, model_b, _, _ = step_b(
        model_r,
        jax.tree.map(jnp.copy, model_r),
        opt.init(model_r),
        batch.points,
        batch.ctx,
        key,
    )

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-4)
    wa = np.asarray(jax.tree.leaves(model_a)[0])
    wb = np.asarray(jax.tree.leaves(model_b)[0])
    np.testing.assert_allclose(wa, wb, rtol=1e-4, atol=1e-6)


def test_nan_guard(tmp_path):
    from gecco_tpu.types import NaNError

    ds = BlobDataset()
    ds.clouds[0] = np.nan  # poison the data

    trainer = Trainer(
        model=lambda key: make_model(key),
        train_dataloader=dataloader(ds, batch_size=32, num_steps=3, num_workers=1),
        val_dataloader=dataloader(ds, batch_size=8, fixed_sampler=True, num_workers=1),
        save_path=str(tmp_path),
        save_every=100,
        num_steps=3,
        optimizer=optax.adam(1e-3),
        skip_smoke_test=True,
        seed=7,
    )
    trainer._init_opt_state()
    with pytest.raises(NaNError):
        trainer.fit()
    assert os.path.exists(os.path.join(str(tmp_path), "offending-data.npz"))


def test_deferred_loss_sync_logs_every_step(tmp_path, monkeypatch):
    """loss_sync_every batches the host fetches (each float(loss) costs a
    full relay round-trip on the axon runtime) but must not change WHAT is
    logged: every step's train/loss appears exactly once, in order, and
    drains flush at checkpoint boundaries and at loop exit."""
    import gecco_tpu.train.trainer as trainer_mod

    records = []

    class RecordingWriter:
        def add_scalar(self, tag, scalar_value, global_step):
            records.append((tag, float(scalar_value), int(global_step)))

        def close(self):
            pass

    monkeypatch.setattr(trainer_mod, "make_writer", lambda _: RecordingWriter())

    def run(sync_every):
        records.clear()
        ds = BlobDataset()
        trainer = Trainer(
            model=lambda key: make_model(key),
            train_dataloader=dataloader(ds, batch_size=8, num_steps=11, num_workers=1),
            val_dataloader=dataloader(ds, batch_size=8, fixed_sampler=True, num_workers=1),
            save_path=str(tmp_path / f"sync{sync_every}"),
            save_every=4,
            num_steps=11,
            optimizer=optax.adam(1e-3),
            n_validation_batches=1,
            skip_smoke_test=True,
            loss_sync_every=sync_every,
            seed=7,
        )
        trainer._init_opt_state()
        trainer.fit()
        return [r for r in records if r[0] == "train/loss"]

    per_step = run(1)
    deferred = run(5)
    assert [s for _, _, s in deferred] == list(range(11))
    assert deferred == per_step  # identical values and order


def test_best_metric_checkpoints(tmp_path):
    """Chamfer-named metrics trigger best-checkpoint saves with the
    reference's create/delete semantics (training.py:377-427)."""
    from gecco_tpu.utils.logging import MockWriter

    ds = BlobDataset()
    trainer = Trainer(
        model=lambda key: make_model(key),
        train_dataloader=dataloader(ds, batch_size=8, num_steps=2, num_workers=1),
        val_dataloader=dataloader(ds, batch_size=8, fixed_sampler=True, num_workers=1),
        save_path=str(tmp_path),
        save_every=10,
        num_steps=2,
        optimizer=optax.adam(1e-3),
        skip_smoke_test=True,
        seed=7,
    )
    trainer._init_opt_state()

    trainer._track_best_metric("supervised/chamfer_distance", 1.0, 10, False)
    best_dir = os.path.join(str(tmp_path), "best-checkpoints")
    first = os.listdir(best_dir)
    assert len(first) == 1 and "step-10" in first[0]

    # improvement replaces the old checkpoint
    trainer._track_best_metric("supervised/chamfer_distance", 0.5, 20, False)
    second = os.listdir(best_dir)
    assert len(second) == 1 and "step-20" in second[0]

    # regression does nothing
    trainer._track_best_metric("supervised/chamfer_distance", 0.9, 30, False)
    assert os.listdir(best_dir) == second

    # non-tracked metrics are ignored
    trainer._track_best_metric("loss/loss", 0.1, 40, False)
    assert os.listdir(best_dir) == second


def test_multi_val_loaders(tmp_path):
    ds = BlobDataset()
    val_a = dataloader(ds, batch_size=8, fixed_sampler=True, num_workers=1, name="a")
    val_b = dataloader(ds, batch_size=8, fixed_sampler=True, num_workers=1, name="b")
    trainer = Trainer(
        model=lambda key: make_model(key),
        train_dataloader=dataloader(ds, batch_size=8, num_steps=1, num_workers=1),
        val_dataloader=[val_a, val_b],
        save_path=str(tmp_path),
        optimizer=optax.adam(1e-3),
        seed=7,
    )
    trainer._init_opt_state()
    metrics = trainer.metrics_loop(n_batches=1)
    assert any(k.startswith("a/") for k in metrics)
    assert any(k.startswith("b/") for k in metrics)


def test_flagship_path_mesh_matches_single_device():
    """The SHIPPED configuration features — bf16 compute, Pallas attention
    (SPMD via custom_partitioning), per-layer remat — must train identically
    on a (data x seq) mesh and on one device (VERDICT r1 #3: prove the
    flagship path multi-chip, not a tiny-fp32-XLA stand-in)."""
    assert jax.device_count() >= 8

    from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork
    from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
    from gecco_tpu.parallel import replicate, shard_batch

    bk, nk = jax.random.split(jax.random.PRNGKey(0))
    backbone = SetTransformer.init(
        bk, n_layers=2, feature_dim=64, num_inducers=8, embed_dim=1, num_heads=4,
        compute_dtype=jnp.bfloat16, attn_impl="folded_pallas", remat=True,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=64)
    sched = LogUniformSchedule(sigma_max=10.0, n_solver_steps=8)
    model = Diffusion.init(
        net, sched, reparam=GaussianReparam.init([0.0] * 3, [1.0] * 3)
    )

    opt = optax.adam(1e-3)
    pts = np.random.default_rng(0).normal(size=(8, 64, 3)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    # replicate BEFORE step_a donates `model`
    mesh = make_mesh(data=4, seq=2)
    model_r = replicate(jax.tree.map(jnp.copy, model), mesh)

    step_a = make_train_step(opt)
    loss_a, model_a, _, _ = step_a(
        model, jax.tree.map(jnp.copy, model), opt.init(model), jnp.asarray(pts),
        None, key,
    )
    batch = shard_batch(Example(pts, None), mesh, shard_points=True)
    step_b = make_train_step(opt)
    loss_b, model_b, _, _ = step_b(
        model_r, jax.tree.map(jnp.copy, model_r), opt.init(model_r),
        batch.points, batch.ctx, key,
    )

    # bf16 compute: mesh-vs-single differences come only from reduction order
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-3)
    wa = np.asarray(jax.tree.leaves(model_a)[0])
    wb = np.asarray(jax.tree.leaves(model_b)[0])
    np.testing.assert_allclose(wa, wb, rtol=1e-3, atol=1e-5)
