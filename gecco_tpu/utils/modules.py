"""Lightweight pytree-module system.

A module is a frozen dataclass registered as a JAX pytree: array fields are
leaves (parameters), fields declared with ``static()`` are part of the treedef
(hyperparameters). The module *is* its parameters, so ``jax.grad``,
``jax.tree.map`` (EMA), and optax updates apply directly to model objects with
no parameter/static partitioning machinery.

This replaces the reference's Equinox module layer
(/root/reference/gecco-jax/src/gecco_jax/models/*.py) with a flax.struct-based
equivalent that needs no extra dependency beyond flax.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "module",
    "static",
    "Linear",
    "Frozen",
    "stack_modules",
    "unstack_module",
    "count_parameters",
]

# A module class decorator: frozen dataclass + pytree registration.
module = struct.dataclass


def static(**kwargs) -> Any:
    """Declare a non-pytree (hyperparameter) field on a module."""
    return struct.field(pytree_node=False, **kwargs)


@module
class Linear:
    """Dense layer computing ``x @ W^T + b`` over the last axis.

    Matches the initialisation of the reference's equinox ``nn.Linear``
    (uniform(-1/sqrt(in), 1/sqrt(in)) for both weight and bias), but is
    batched over arbitrary leading axes and computes in the dtype of ``x``
    (parameters are cast at use-site, enabling bf16 activations with fp32
    master weights).
    """

    weight: jax.Array  # [out_features, in_features]
    bias: Optional[jax.Array]  # [out_features] or None

    @classmethod
    def init(
        cls,
        key: jax.Array,
        in_features: int,
        out_features: int,
        use_bias: bool = True,
        dtype: jnp.dtype = jnp.float32,
    ) -> "Linear":
        wkey, bkey = jax.random.split(key)
        lim = 1.0 / math.sqrt(in_features)
        weight = jax.random.uniform(
            wkey, (out_features, in_features), dtype, minval=-lim, maxval=lim
        )
        bias = None
        if use_bias:
            bias = jax.random.uniform(
                bkey, (out_features,), dtype, minval=-lim, maxval=lim
            )
        return cls(weight=weight, bias=bias)

    @property
    def in_features(self) -> int:
        return self.weight.shape[1]

    @property
    def out_features(self) -> int:
        return self.weight.shape[0]

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight.astype(x.dtype)
        y = x @ w.T
        if self.bias is not None:
            y = y + self.bias.astype(x.dtype)
        return y


@module
class Frozen:
    """Wrap a module so its parameters receive no gradients.

    Analog of the reference's ``Frozen`` stop-gradient descriptor
    (gecco-jax/src/gecco_jax/models/util.py:13-22): the inner module's array
    leaves pass through ``lax.stop_gradient`` before every call, so they stay
    constant under training while remaining part of the checkpointed pytree.
    """

    inner: Any

    def __call__(self, *args, **kwargs):
        frozen = jax.tree.map(jax.lax.stop_gradient, self.inner)
        return frozen(*args, **kwargs)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "inner"), name)


def stack_modules(mods: list) -> Any:
    """Stack a list of identically-structured modules leaf-wise.

    Produces a single module whose array leaves have a leading ``len(mods)``
    axis — the representation consumed by ``jax.lax.scan`` over layers.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *mods)


def unstack_module(mod: Any, index: int) -> Any:
    """Take the ``index``-th slice of every leaf of a stacked module."""
    return jax.tree.map(lambda x: x[index], mod)


def unstack_modules(mod: Any, n: int) -> list:
    """Inverse of ``stack_modules``: split a stacked module back into a list
    of ``n`` per-layer modules."""
    return [unstack_module(mod, i) for i in range(n)]


def count_parameters(mod: Any) -> int:
    """Total number of array elements in a module pytree.

    Parity helper for the reference's ``count_parameters``
    (gecco-jax/src/gecco_jax/models/util.py:24-28).
    """
    return sum(
        leaf.size for leaf in jax.tree.leaves(mod) if hasattr(leaf, "size")
    )
