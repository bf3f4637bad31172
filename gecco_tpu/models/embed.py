"""Input embeddings (gecco-jax/src/gecco_jax/models/embed.py:15-29)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gecco_tpu.utils import Linear, module

__all__ = ["LinearSpaceEmbedding", "LinearTimeEmbedding"]


# A LinearSpaceEmbedding is just a Linear over the last (xyz) axis; our Linear
# is already batched, so we alias it.
LinearSpaceEmbedding = Linear


@module
class LinearTimeEmbedding:
    """t -> t * w with small random w (embed.py:21-29)."""

    weights: jax.Array  # [E]

    @classmethod
    def init(cls, key: jax.Array, dim: int) -> "LinearTimeEmbedding":
        return cls(weights=0.1 * jax.random.normal(key, (dim,)))

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        # t: [...] -> [..., E]
        return t[..., None] * self.weights.astype(t.dtype)
