"""Gaussian bump activation (gecco-jax/src/gecco_jax/models/activation.py:7-19).

Used instead of Fourier embeddings for low-dimensional (xyz) inputs. ``alpha``
is a trainable scalar, as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gecco_tpu.utils import module, static

__all__ = ["GaussianActivation"]


@module
class GaussianActivation:
    alpha: jax.Array  # trainable scalar
    normalized: bool = static(default=False)

    @classmethod
    def init(cls, alpha: float = 1.0, normalized: bool = False) -> "GaussianActivation":
        return cls(alpha=jnp.asarray(alpha, jnp.float32), normalized=normalized)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.alpha.astype(x.dtype)
        y = jnp.exp(-(x**2) / (2 * alpha**2))
        if self.normalized:
            # mean/std normalisation assuming x ~ N(0, 1) (activation.py:15-18)
            y = (y - 0.7) / 0.28
        return y
