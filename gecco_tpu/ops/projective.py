"""Projective feature lookup: batched bilinear interpolation into feature maps.

Replaces the reference's per-channel ``jax.scipy.ndimage.map_coordinates``
loop (gecco-jax/src/gecco_jax/models/ray.py:17-38) and ``F.grid_sample``
(gecco-torch/src/gecco_torch/models/ray.py:64-110) with a single gather-based
formulation. Coordinate convention matches the reference exactly: normalised
(h, w) in [0, 1]^2 are scaled by (H, W) into pixel-index space and sampled
with order-1 interpolation, out-of-bounds reads contributing zero
('constant' mode).

A fused Pallas variant (all pyramid levels in one kernel) is selected with
``impl='pallas'`` (gecco_tpu/ops/pallas/projective_gather.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = ["bilinear_lookup", "lookup_pyramid"]


def bilinear_lookup(image: jnp.ndarray, coords_hw: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image [B, H, W, C]`` at pixel-space ``coords_hw [B, N, 2]``.

    Returns ``[B, N, C]``. Out-of-bounds samples are zero.
    """
    b, h, w, c = image.shape
    ch = coords_hw[..., 0]
    cw = coords_hw[..., 1]

    h0 = jnp.floor(ch)
    w0 = jnp.floor(cw)
    fh = ch - h0  # fractional parts
    fw = cw - w0
    h0 = h0.astype(jnp.int32)
    w0 = w0.astype(jnp.int32)

    flat = image.reshape(b, h * w, c)

    def corner(dh: int, dw: int, weight: jnp.ndarray) -> jnp.ndarray:
        hi = h0 + dh
        wi = w0 + dw
        valid = (hi >= 0) & (hi < h) & (wi >= 0) & (wi < w)
        hi_c = jnp.clip(hi, 0, h - 1)
        wi_c = jnp.clip(wi, 0, w - 1)
        idx = hi_c * w + wi_c  # [B, N]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, N, C]
        weight = jnp.where(valid, weight, 0.0)
        return vals * weight[..., None].astype(vals.dtype)

    out = (
        corner(0, 0, (1 - fh) * (1 - fw))
        + corner(0, 1, (1 - fh) * fw)
        + corner(1, 0, fh * (1 - fw))
        + corner(1, 1, fh * fw)
    )
    return out


def lookup_pyramid(
    features: Sequence[jnp.ndarray],  # tuple of [B, Hi, Wi, Ci]
    hw01: jnp.ndarray,  # [B, N, 2] in [0, 1]^2
    impl: str = "xla",
) -> jnp.ndarray:
    """Look up every pyramid level and concatenate channels -> [B, N, sum Ci].

    Each level is scaled by its own (H, W) (ray.py:29: ``coords * [h, w]``).
    Coordinates and interpolation weights are fp32 (torch ref ray.py:99-110
    forces the lookup out of autocast); the gathered features keep their own
    dtype — reading the pyramid in bf16 halves the gather traffic, the
    dominant cost of the conditional denoiser eval.
    """
    if impl == "pallas":
        from gecco_tpu.ops.pallas.projective_gather import lookup_pyramid_pallas

        return lookup_pyramid_pallas(features, hw01)

    hw01 = hw01.astype(jnp.float32)
    out = []
    for level in features:
        _, h, w, _ = level.shape
        coords = hw01 * jnp.array([h, w], dtype=jnp.float32)
        out.append(bilinear_lookup(level, coords))
    return jnp.concatenate(out, axis=-1)
