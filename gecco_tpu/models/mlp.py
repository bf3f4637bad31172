"""Feed-forward network over the last axis, batched.

Parity with gecco-jax/src/gecco_jax/models/mlp.py:16-102, minus the
per-example vmap plumbing (our Linear already broadcasts over leading axes).
Dropout defaults to 0 everywhere in the reference configs; we support it
deterministically via an explicit key.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from gecco_tpu.models.activation import GaussianActivation
from gecco_tpu.utils import Linear, module, static, splitter

__all__ = ["MLP"]


@module
class MLP:
    layers: tuple  # of Linear
    activation: Any  # callable module or function
    dropout_p: float = static(default=0.0)

    @classmethod
    def init(
        cls,
        key: jax.Array,
        in_size: int,
        out_size: int,
        width_size: int,
        depth: int = 1,
        activation: Any = None,
        dropout_p: float = 0.0,
    ) -> "MLP":
        if activation is None:
            activation = GaussianActivation.init()
        keys = splitter(key)
        layers = []
        if depth == 0:
            layers.append(Linear.init(next(keys), in_size, out_size))
        else:
            layers.append(Linear.init(next(keys), in_size, width_size))
            for _ in range(depth - 1):
                layers.append(Linear.init(next(keys), width_size, width_size))
            layers.append(Linear.init(next(keys), width_size, out_size))
        return cls(layers=tuple(layers), activation=activation, dropout_p=dropout_p)

    def __call__(
        self, x: jnp.ndarray, *, key: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        n_hidden = len(self.layers) - 1
        drop_keys = (
            jax.random.split(key, n_hidden) if key is not None and n_hidden else None
        )
        for i, layer in enumerate(self.layers[:-1]):
            x = layer(x)
            x = self.activation(x)
            if self.dropout_p > 0.0 and drop_keys is not None:
                keep = jax.random.bernoulli(
                    drop_keys[i], 1.0 - self.dropout_p, x.shape
                )
                x = jnp.where(keep, x / (1.0 - self.dropout_p), 0.0)
        return self.layers[-1](x)
