"""GPT-2-style initialisation surgery.

Parity with gecco-jax/src/gecco_jax/models/gpt_init.py:33-61: zero all
biases, divide the residual-branch output projections (attention unpool
out-proj, pool out-proj, and MLP final layers) by sqrt(2 * n_layers). An
alternative to the default 0.1 skip scaling (torch set_transformer.py:150-153)
— apply on top of ``skip_scale=1.0`` construction.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from gecco_tpu.models.mlp import MLP
from gecco_tpu.models.set_transformer import BroadcastingLayer, SetTransformer

__all__ = ["gpt_init"]


def _zero_bias(linear):
    if linear.bias is None:
        return linear
    return linear.replace(bias=jnp.zeros_like(linear.bias))


def _scale_weight(linear, factor: float):
    return linear.replace(weight=linear.weight * factor)


def _init_mlp(mlp: MLP, out_scale: float) -> MLP:
    layers = tuple(_zero_bias(l) for l in mlp.layers)
    out = _scale_weight(layers[-1], out_scale)
    return mlp.replace(layers=layers[:-1] + (out,))


def gpt_init(backbone: SetTransformer) -> SetTransformer:
    """Apply GPT-2 init to a (stacked) set transformer."""
    n_layers = backbone.n_layers
    out_scale = 1.0 / math.sqrt(2 * n_layers)
    layers: BroadcastingLayer = backbone.layers  # stacked

    bc = layers.broadcast
    bc = bc.replace(
        pool=bc.pool.replace(out_proj=_scale_weight(bc.pool.out_proj, out_scale)),
        unpool=bc.unpool.replace(
            out_proj=_scale_weight(bc.unpool.out_proj, out_scale)
        ),
        mlp=_init_mlp(bc.mlp, out_scale),
    )
    layers = layers.replace(broadcast=bc, mlp=_init_mlp(layers.mlp, out_scale))
    return backbone.replace(layers=layers)
