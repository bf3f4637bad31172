"""Image-conditional ShapeNet-vol (Occupancy-Networks renders + cameras).

ConvNeXt projective conditioning over posed ShapeNet objects — the third
benchmark config (BASELINE.md). Points live in camera coordinates (world
transform applied by the dataset), reparameterised into the UVL frustum.
"""

import os

import jax
import jax.numpy as jnp
import optax

from gecco_tpu import Diffusion, LogUniformSchedule, UVLReparam
from gecco_tpu.data import dataloader
from gecco_tpu.data.shapenet_vol import ShapeNetVol
from gecco_tpu.metrics import LogpMetric, SupervisedMetric
from gecco_tpu.models import ConvNeXtExtractor, RayNetwork, SetTransformer
from gecco_tpu.train import train as train_fn

DATA_ROOT = os.environ.get("SHAPENET_VOL_ROOT", "/data/ShapeNet")
N_POINTS = 2048
BATCH = 48
NUM_STEPS = 1_000_000
CTX_DIMS = (96, 192, 384)


def make_model(key):
    keys = jax.random.split(key, 3)
    reparam = UVLReparam.init()
    backbone = SetTransformer.init(
        keys[0],
        n_layers=6,
        feature_dim=384,
        num_inducers=64,
        embed_dim=1,
        num_heads=8,
        compute_dtype=jnp.bfloat16,
        attn_impl="folded_pallas",
        remat=True,
    )
    network = RayNetwork.init(
        keys[1], backbone, reparam, feature_dim=384, input_ctx_dim=sum(CTX_DIMS), lookup_impl="pallas"
    )
    cond = ConvNeXtExtractor.init(keys[2], size="tiny", mode="local")
    # pretrained/frozen extractor: see taskonomy_conditional.py
    if os.environ.get("GECCO_CONVNEXT_WEIGHTS"):
        from gecco_tpu.models.convnext import load_pretrained_npz

        cond = load_pretrained_npz(cond, os.environ["GECCO_CONVNEXT_WEIGHTS"])
    if os.environ.get("GECCO_FREEZE_CONDITIONER", "0") == "1":
        from gecco_tpu.utils import Frozen

        cond = Frozen(inner=cond)
    schedule = LogUniformSchedule(sigma_max=165.0, sigma_min=0.002, n_solver_steps=128)
    return Diffusion.init(network, schedule, reparam=reparam, cond=cond)


def make_train_loader():
    dataset = ShapeNetVol(
        DATA_ROOT, "train", posed=True, image_conditional=True, n_points=N_POINTS
    )
    return dataloader(dataset, batch_size=BATCH, num_steps=NUM_STEPS)


def make_val_loader():
    dataset = ShapeNetVol(
        DATA_ROOT, "val", posed=True, image_conditional=True, n_points=N_POINTS
    )
    return dataloader(dataset, batch_size=BATCH, fixed_sampler=True)


def train(make_model, train_loader, val_loader, save_path):
    return train_fn(
        model=make_model,
        train_dataloader=train_loader,
        val_dataloader=val_loader,
        save_path=save_path,
        save_every=10_000,
        num_steps=NUM_STEPS,
        # exact likelihood through the CONDITIONAL stack (UVL ladj +
        # VJP through the projective gather and ConvNeXt pyramid) at a
        # reduced 24-step reverse-ODE grid — the reference runs
        # LogpMetric on conditional models too (gecco-jax metrics.py:53-89)
        metrics=(SupervisedMetric(), LogpMetric(n_solver_steps=24)),
        optimizer=optax.chain(
            optax.clip_by_global_norm(1.0), optax.adabelief(learning_rate=3e-4)
        ),
        ema_alpha=0.999,
        n_validation_batches=8,
        # axon runtime rejects donated executions for conv-containing models
        donate_buffers=False,
    )
