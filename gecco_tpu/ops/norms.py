"""Functional normalisation ops over token sets, batched and fp32-stable.

Semantics match the reference's channels-first equinox GroupNorm/LayerNorm as
used through ``MoveChannels`` (gecco-jax/src/gecco_jax/models/normalization.py):
for a token set ``[N, C]`` the reference swaps to ``[C, N]`` and applies
``eqx.nn.GroupNorm``, whose statistics are computed over each group's channels
AND all N positions — i.e. GroupNorm here is a *set-level* norm, like CNN
GroupNorm reducing over spatial dims. We keep exactly that reduction but stay
channels-last ``[..., N, C]`` (the natural TPU layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["group_norm", "group_norm_stats", "layer_norm"]


def group_norm_stats(
    x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel mean/inv-std of the set-level group norm.

    Returns ``(mean_c, inv_c)``, each ``[..., C]`` fp32 (group statistics
    broadcast per channel), so the normalisation is the elementwise
    ``(x - mean_c) * inv_c`` — the form consumed by the fused Pallas kernels
    (ops/pallas/folded_attention.py), which apply the pre-norm inline while
    streaming tiles instead of round-tripping a normed copy through HBM.
    """
    *lead, n, c = x.shape
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    per_group = c // num_groups
    xf = x.astype(jnp.float32)
    # lane-aligned formulation: reduce over tokens first (contiguous C lanes),
    # then fold the per-channel sums into groups — avoids reducing over a
    # per_group-wide (non-128-aligned) trailing axis of the full tensor
    s1 = xf.sum(axis=-2)  # [..., C]
    s2 = (xf * xf).sum(axis=-2)  # [..., C]
    g1 = s1.reshape(*lead, num_groups, per_group).sum(axis=-1)  # [..., G]
    g2 = s2.reshape(*lead, num_groups, per_group).sum(axis=-1)
    count = n * per_group
    mean = g1 / count
    var = g2 / count - mean**2
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    mean_c = jnp.repeat(mean, per_group, axis=-1)  # [..., C]
    inv_c = jnp.repeat(inv, per_group, axis=-1)
    return mean_c, inv_c


def group_norm(
    x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-5
) -> jnp.ndarray:
    """Set-level group normalisation.

    ``x: [..., N, C]``; statistics per (batch, group) over all N tokens and
    the C/num_groups channels in the group. No affine parameters (the
    reference composes affine via AdaGN scale/bias instead).
    """
    orig_dtype = x.dtype
    mean_c, inv_c = group_norm_stats(x, num_groups=num_groups, eps=eps)
    return (
        (x.astype(jnp.float32) - mean_c[..., None, :]) * inv_c[..., None, :]
    ).astype(orig_dtype)


def layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-token layer normalisation over the channel axis, no affine.

    ``x: [..., C]``.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(orig_dtype)
