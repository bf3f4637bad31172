"""Scaled config: 2x denoiser (12 layers, 768 wide) on 8k-point clouds.

The fifth benchmark config (BASELINE.md): stresses the O(N*I) induced
attention at 4x the point count with the Pallas fused attention kernel, and
shards points over the mesh's 'seq' axis when more than one device is
available (Trainer(shard_points=True)).
"""

import os

import jax
import jax.numpy as jnp
import optax

from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
from gecco_tpu.data import dataloader
from gecco_tpu.data.shapenet_pointflow import ShapeNetPointFlow
from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork
from gecco_tpu.train import train as train_fn

DATA_ROOT = os.environ.get("SHAPENET_PF_ROOT", "/data/shapenet-pointflow")
CATEGORY = "02691156"
N_POINTS = 8192
BATCH = 16
NUM_STEPS = 1_000_000


def make_model(key):
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk,
        n_layers=12,
        feature_dim=768,
        num_inducers=64,
        embed_dim=1,
        num_heads=16,
        compute_dtype=jnp.bfloat16,
        attn_impl="folded_pallas",
        remat=True,
    )
    network = UnconditionalPointNetwork.init(nk, backbone, feature_dim=768)
    schedule = LogUniformSchedule(sigma_max=165.0, sigma_min=0.002, n_solver_steps=128)
    return Diffusion.init(
        network, schedule, reparam=GaussianReparam.init([0.0] * 3, [0.35] * 3)
    )


def make_train_loader():
    dataset = ShapeNetPointFlow(DATA_ROOT, CATEGORY, "train", n_points=N_POINTS)
    return dataloader(dataset, batch_size=BATCH, num_steps=NUM_STEPS)


def make_val_loader():
    dataset = ShapeNetPointFlow(DATA_ROOT, CATEGORY, "val", n_points=N_POINTS)
    return dataloader(dataset, batch_size=BATCH, fixed_sampler=True)


def train(make_model, train_loader, val_loader, save_path):
    return train_fn(
        model=make_model,
        train_dataloader=train_loader,
        val_dataloader=val_loader,
        save_path=save_path,
        save_every=10_000,
        num_steps=NUM_STEPS,
        optimizer=optax.chain(
            optax.clip_by_global_norm(1.0), optax.adabelief(learning_rate=3e-4)
        ),
        ema_alpha=0.999,
        n_validation_batches=8,
        shard_points=jax.device_count() > 1,
    )
