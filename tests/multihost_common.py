"""Shared model/data/step used by the multi-host smoke test, so the 2-process
child and the single-process parent run the identical computation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax


class BlobDataset:
    def __init__(self, n=64, n_points=16, seed=0):
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(n, 1, 3)).astype(np.float32)
        self.clouds = centers + 0.1 * rng.normal(size=(n, n_points, 3)).astype(
            np.float32
        )

    def __len__(self):
        return len(self.clouds)

    def __getitem__(self, i):
        from gecco_tpu.types import Example

        return Example(self.clouds[i], None)


def make_model():
    from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
    from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork

    bk, nk = jax.random.split(jax.random.PRNGKey(0))
    backbone = SetTransformer.init(
        bk,
        n_layers=1,
        feature_dim=32,
        num_inducers=4,
        embed_dim=1,
        num_heads=4,
        compute_dtype=jnp.float32,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=32)
    sched = LogUniformSchedule(sigma_max=10.0, n_solver_steps=8)
    return Diffusion.init(
        net, sched, reparam=GaussianReparam.init([0.0] * 3, [1.0] * 3)
    )


def run_steps(shard_by_process: bool, n_steps: int = 3):
    """Run n_steps of the jitted train step over an 8-device 'data' mesh.

    With ``shard_by_process`` each process loads only its slice of the global
    batch (the sampler is identically seeded everywhere); without it, one
    process loads the whole batch. Either way the same global computation
    runs — losses must match.
    """
    from gecco_tpu.data import dataloader
    from gecco_tpu.parallel import make_mesh, replicate, shard_batch
    from gecco_tpu.train import make_train_step

    mesh = make_mesh(data=8, seq=1)
    model = replicate(make_model(), mesh)
    opt = optax.adam(1e-3)
    opt_state = replicate(opt.init(model), mesh)
    ema = jax.tree.map(jnp.copy, model)

    loader = dataloader(
        BlobDataset(),
        batch_size=16,
        num_steps=n_steps,
        num_workers=1,
        shard_by_process=shard_by_process,
    )
    step_fn = make_train_step(opt)

    losses = []
    key = jax.random.PRNGKey(7)
    for i, example in enumerate(loader):
        batch = shard_batch(example.discard_extras(), mesh)
        loss, model, ema, opt_state = step_fn(
            model, ema, opt_state, batch.points, batch.ctx, jax.random.fold_in(key, i)
        )
        losses.append(float(loss))
    return losses
