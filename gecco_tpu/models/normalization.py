"""Adaptive normalisation layers (AdaGN / AdaLN).

Parity with gecco-jax/src/gecco_jax/models/normalization.py:9-163. The scale
and bias are affine functions of a per-example embedding (the diffusion noise
level), initialised to identity: scale Linear has weight=0 / bias=1, bias
Linear has weight=0 / bias=0 (normalization.py:33-49).

Our layers are batched: ``x [B, N, C]``, ``embed [B, E]``. GroupNorm uses the
reference's set-level statistics (see gecco_tpu.ops.norms.group_norm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gecco_tpu.ops.norms import group_norm, group_norm_stats, layer_norm
from gecco_tpu.utils import Linear, module, static

__all__ = ["AdaGN", "AdaLN"]


def _identity_affine(key: jax.Array, embed_dim: int, num_features: int):
    """scale/bias Linears initialised so the layer starts as the plain norm."""
    k1, k2 = jax.random.split(key)
    scale = Linear.init(k1, embed_dim, num_features)
    scale = scale.replace(
        weight=jnp.zeros_like(scale.weight), bias=jnp.ones_like(scale.bias)
    )
    bias = Linear.init(k2, embed_dim, num_features)
    bias = bias.replace(
        weight=jnp.zeros_like(bias.weight), bias=jnp.zeros_like(bias.bias)
    )
    return scale, bias


@module
class AdaGN:
    """Set-level group norm with embedding-conditioned affine
    (normalization.py:75-100)."""

    scale_linear: Linear
    bias_linear: Linear
    num_groups: int = static(default=32)

    @classmethod
    def init(
        cls, key: jax.Array, num_features: int, embed_dim: int, num_groups: int = 32
    ) -> "AdaGN":
        scale, bias = _identity_affine(key, embed_dim, num_features)
        return cls(scale_linear=scale, bias_linear=bias, num_groups=num_groups)

    def __call__(self, x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, C], embed: [B, E]
        scale = self.scale_linear(embed)[..., None, :]  # [B, 1, C]
        bias = self.bias_linear(embed)[..., None, :]
        normed = group_norm(x, num_groups=self.num_groups)
        return scale.astype(x.dtype) * normed + bias.astype(x.dtype)

    def effective_scale_bias(
        self, x: jnp.ndarray, embed: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Collapse norm + affine into per-channel ``x * se + be`` form.

        ``AdaGN(x) = scale * (x - mean) * inv + bias = x * se + be`` with
        ``se = scale * inv_c`` and ``be = bias - mean_c * se`` — the inputs of
        the fused Pallas kernels, which apply the pre-norm while streaming x
        tiles (no normed [B, N, C] copy in HBM). Both fp32 ``[B, C]``; the
        statistics path stays differentiable through plain XLA.
        """
        scale = self.scale_linear(embed.astype(jnp.float32))  # [B, C]
        bias = self.bias_linear(embed.astype(jnp.float32))
        mean_c, inv_c = group_norm_stats(x, num_groups=self.num_groups)
        se = scale * inv_c
        return se, bias - mean_c * se

    def scale_bias_from_sums(
        self, sums: jnp.ndarray, n_tokens: int, embed: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Like ``effective_scale_bias`` but from precomputed channel sums
        ``[B, 2, C]`` (s1, s2 over the token axis) — the fused unpool kernel
        emits these for its own output, so the following norm's statistics
        cost no extra pass over the [B, N, C] stream."""
        b, _, c = sums.shape
        g = self.num_groups
        pg = c // g
        g1 = sums[:, 0].reshape(b, g, pg).sum(-1)
        g2 = sums[:, 1].reshape(b, g, pg).sum(-1)
        count = n_tokens * pg
        mean = g1 / count
        var = g2 / count - mean**2
        inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
        mean_c = jnp.repeat(mean, pg, axis=-1)
        inv_c = jnp.repeat(inv, pg, axis=-1)
        scale = self.scale_linear(embed.astype(jnp.float32))
        bias = self.bias_linear(embed.astype(jnp.float32))
        se = scale * inv_c
        return se, bias - mean_c * se


@module
class AdaLN:
    """Per-token layer norm with embedding-conditioned affine
    (normalization.py:103-126)."""

    scale_linear: Linear
    bias_linear: Linear

    @classmethod
    def init(cls, key: jax.Array, num_features: int, embed_dim: int) -> "AdaLN":
        scale, bias = _identity_affine(key, embed_dim, num_features)
        return cls(scale_linear=scale, bias_linear=bias)

    def __call__(self, x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
        scale = self.scale_linear(embed)[..., None, :]
        bias = self.bias_linear(embed)[..., None, :]
        normed = layer_norm(x)
        return scale.astype(x.dtype) * normed + bias.astype(x.dtype)
