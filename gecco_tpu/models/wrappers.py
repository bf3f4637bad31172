"""Denoiser network wrappers around the set-transformer backbone.

Parity with gecco-jax/src/gecco_jax/models/ray.py:41-271 (PointNetwork /
UnconditionalPointNetwork / RayNetwork / GlobalConditioningNetwork) and
gecco-torch/src/gecco_torch/models/linear_lift.py:7-46 (LinearLift), batched.

Network contract: ``net(t [B], x [B, N, 3], ctx) -> [B, N, 3]`` where ``t``
is the preconditioned noise level (c_noise) and ``x`` the preconditioned
(c_in-scaled) noisy points. All wrappers also thread the inducer-state cache
(``hs`` / ``return_h``) for the completion/upsampling sampler.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from gecco_tpu.models.set_transformer import SetTransformer
from gecco_tpu.ops.norms import group_norm
from gecco_tpu.utils import Linear, module, static, splitter

__all__ = [
    "UnconditionalPointNetwork",
    "LinearLift",
    "RayNetwork",
    "GlobalConditioningNetwork",
]


def _embed_channel_sums(linear: Linear, x: jnp.ndarray) -> jnp.ndarray:
    """Channel sums ``[B, 2, C]`` (s1, s2 over tokens) of ``linear(x)``,
    derived from the [B, N, D] first/second moments of ``x`` instead of a
    stats pass over the [B, N, C] embedded stream.

    With ``f = x @ W^T + b``: ``s1 = (sum_t x) @ W^T + n b`` and
    ``s2_c = w_c M w_c^T + 2 b_c (sum_t x . w_c) + n b_c^2`` where
    ``M = sum_t x_t x_t^T`` is [B, D, D] (D=3: tiny). This seeds the fused
    kernels' free-statistics chain without touching the wide stream; it sums
    the exact fp32 embed output where the in-stream pass summed the
    bf16-cast stream — an O(bf16 eps) statistics difference, inside the
    fused path's existing tolerance vs its XLA twin.
    """
    xf = x.astype(jnp.float32)
    n = xf.shape[-2]
    w = linear.weight.astype(jnp.float32)  # [C, D]
    s1_d = xf.sum(-2)  # [B, D]
    m = jnp.einsum("bni,bnj->bij", xf, xf)  # [B, D, D]
    proj = s1_d @ w.T  # [B, C]
    wm = jnp.einsum("ci,bij->bcj", w, m)  # [B, C, D]
    s2 = (wm * w[None]).sum(-1)
    if linear.bias is not None:
        b = linear.bias.astype(jnp.float32)
        s1 = proj + n * b
        s2 = s2 + 2.0 * b * proj + n * b * b
    else:
        s1 = proj
    return jnp.stack([s1, s2], axis=1)


def _folded_head(
    proj: Linear, num_groups: int, x: jnp.ndarray, sums: jnp.ndarray
) -> jnp.ndarray:
    """GroupNorm -> Linear output head with the normalisation folded into
    per-batch projection weights and statistics taken from kernel-emitted
    channel sums: ``((x - m) * inv) @ W^T + b = x @ (inv * W^T) + b'``.
    One einsum over the [B, N, C] stream replaces the stats pass + normed
    copy + separate projection (each sequential XLA fusion costs ~0.44 ms
    on the axon relay — BASELINE.md measurement notes)."""
    b_, n, c = x.shape
    g = num_groups
    pg = c // g
    sums = sums.astype(jnp.float32)
    g1 = sums[:, 0].reshape(b_, g, pg).sum(-1)
    g2 = sums[:, 1].reshape(b_, g, pg).sum(-1)
    count = n * pg
    mean = g1 / count
    var = g2 / count - mean**2
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    mean_c = jnp.repeat(mean, pg, axis=-1)  # [B, C]
    inv_c = jnp.repeat(inv, pg, axis=-1)
    w = proj.weight.astype(jnp.float32)  # [D_out, C]
    wb = inv_c[:, :, None] * w.T[None]  # [B, C, D_out]
    bias = -jnp.einsum("bc,dc->bd", mean_c * inv_c, w)
    if proj.bias is not None:
        bias = bias + proj.bias.astype(jnp.float32)
    y = jnp.einsum(
        "bnc,bcd->bnd", x, wb.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return y + bias[:, None, :]


@module
class UnconditionalPointNetwork:
    """xyz embed -> backbone -> GroupNorm -> Linear head
    (ray.py:41-95, 203-228; linear_lift.py:7-46)."""

    xyz_embed: Linear  # 3 -> C
    backbone: SetTransformer
    output_proj: Linear  # C -> 3
    output_norm_groups: int = static(default=32)

    @classmethod
    def init(
        cls,
        key: jax.Array,
        backbone: SetTransformer,
        feature_dim: int,
        geometry_dim: int = 3,
    ) -> "UnconditionalPointNetwork":
        keys = splitter(key)
        return cls(
            xyz_embed=Linear.init(next(keys), geometry_dim, feature_dim),
            backbone=backbone,
            output_proj=Linear.init(next(keys), feature_dim, geometry_dim),
        )

    def _head(
        self, processed: jnp.ndarray, out_dtype, sums: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if sums is not None:
            return _folded_head(
                self.output_proj, self.output_norm_groups, processed, sums
            ).astype(out_dtype)
        normed = group_norm(processed, num_groups=self.output_norm_groups)
        return self.output_proj(normed).astype(out_dtype)

    def __call__(
        self,
        t: jnp.ndarray,  # [B]
        x: jnp.ndarray,  # [B, N, 3]
        ctx: Any = None,
        hs: Optional[jnp.ndarray] = None,
        return_h: bool = False,
        key: Optional[jax.Array] = None,
    ):
        del ctx
        features = self.xyz_embed(x)  # [B, N, C]
        embed = t[..., None]  # [B, 1] — raw noise level as the embed vector
        # seed the free-statistics chain analytically (dead code off the
        # fused chain — the backbone ignores in_sums there and XLA DCEs it)
        in_sums = _embed_channel_sums(self.xyz_embed, x)
        out = self.backbone(
            features, embed, hs=hs, return_h=return_h, key=key,
            in_sums=in_sums, with_sums=True,
        )
        if return_h:
            processed, stored, fsums = out
            return self._head(processed, x.dtype, fsums), stored
        processed, fsums = out
        return self._head(processed, x.dtype, fsums)


# The torch package calls this wrapper LinearLift (linear_lift.py:7); same
# computation, so alias it for API familiarity.
LinearLift = UnconditionalPointNetwork


@module
class GlobalConditioningNetwork:
    """Mean-pooled image feature concatenated to the t embed (ray.py:231-271)."""

    xyz_embed: Linear
    backbone: SetTransformer
    output_proj: Linear
    output_norm_groups: int = static(default=32)

    @classmethod
    def init(
        cls,
        key: jax.Array,
        backbone: SetTransformer,
        feature_dim: int,
        geometry_dim: int = 3,
    ) -> "GlobalConditioningNetwork":
        keys = splitter(key)
        return cls(
            xyz_embed=Linear.init(next(keys), geometry_dim, feature_dim),
            backbone=backbone,
            output_proj=Linear.init(next(keys), feature_dim, geometry_dim),
        )

    def __call__(
        self,
        t: jnp.ndarray,  # [B]
        x: jnp.ndarray,  # [B, N, 3]
        ctx: Any = None,  # FeaturePyramidContext with one level
        hs: Optional[jnp.ndarray] = None,
        return_h: bool = False,
        key: Optional[jax.Array] = None,
    ):
        (global_features,) = ctx.features  # [B, h, w, C]
        img_embed = global_features.mean(axis=(-3, -2))  # [B, C]
        embed = jnp.concatenate([t[..., None], img_embed], axis=-1)

        features = self.xyz_embed(x)
        in_sums = _embed_channel_sums(self.xyz_embed, x)
        out = self.backbone(
            features, embed, hs=hs, return_h=return_h, key=key,
            in_sums=in_sums, with_sums=True,
        )
        if return_h:
            processed, stored, fsums = out
        else:
            processed, fsums = out
            stored = None
        if fsums is not None:
            y = _folded_head(
                self.output_proj, self.output_norm_groups, processed, fsums
            ).astype(x.dtype)
        else:
            normed = group_norm(processed, num_groups=self.output_norm_groups)
            y = self.output_proj(normed).astype(x.dtype)
        return (y, stored) if return_h else y


@module
class RayNetwork:
    """Projective-conditioning denoiser (ray.py:98-200).

    Each diffusion-space point is reprojected to image coordinates via the
    reparam, features are bilinearly looked up in every level of the ConvNeXt
    feature pyramid, concatenated, reduced to feature_dim, and added to the
    xyz embedding. The lookup runs in fp32 regardless of compute dtype
    (torch ref models/ray.py:99-110 forces fp32 under autocast).
    """

    xyz_embed: Linear
    backbone: SetTransformer
    output_proj: Linear
    ctx_dim_reductor: Linear  # sum of pyramid channel dims -> C
    reparam: Any  # must expose diffusion_to_hw
    output_norm_groups: int = static(default=32)
    lookup_impl: str = static(default="xla")

    @classmethod
    def init(
        cls,
        key: jax.Array,
        backbone: SetTransformer,
        reparam: Any,
        feature_dim: int,
        input_ctx_dim: int,
        geometry_dim: int = 3,
        lookup_impl: str = "xla",
    ) -> "RayNetwork":
        keys = splitter(key)
        return cls(
            xyz_embed=Linear.init(next(keys), geometry_dim, feature_dim),
            backbone=backbone,
            output_proj=Linear.init(next(keys), feature_dim, geometry_dim),
            ctx_dim_reductor=Linear.init(next(keys), input_ctx_dim, feature_dim),
            reparam=reparam,
            lookup_impl=lookup_impl,
        )

    def _extract_ctx_features(self, x_diffusion, ctx):
        from gecco_tpu.ops.projective import lookup_pyramid

        hw01 = self.reparam.diffusion_to_hw(
            x_diffusion.astype(jnp.float32), ctx.K
        )  # [B, N, 2] in [0, 1]
        features = lookup_pyramid(ctx.features, hw01, impl=self.lookup_impl)
        return self.ctx_dim_reductor(features)

    def __call__(
        self,
        t: jnp.ndarray,
        x: jnp.ndarray,
        ctx: Any,  # FeaturePyramidContext
        hs: Optional[jnp.ndarray] = None,
        return_h: bool = False,
        key: Optional[jax.Array] = None,
    ):
        xyz_features = self.xyz_embed(x)
        img_features = self._extract_ctx_features(x, ctx).astype(xyz_features.dtype)
        features = xyz_features + img_features
        embed = t[..., None]

        # no analytic in_sums here: features include the projective lookup,
        # so seeding the stats chain needs the in-stream pass anyway
        out = self.backbone(
            features, embed, hs=hs, return_h=return_h, key=key, with_sums=True
        )
        if return_h:
            processed, stored, fsums = out
        else:
            processed, fsums = out
            stored = None
        if fsums is not None:
            y = _folded_head(
                self.output_proj, self.output_norm_groups, processed, fsums
            ).astype(x.dtype)
        else:
            normed = group_norm(processed, num_groups=self.output_norm_groups)
            y = self.output_proj(normed).astype(x.dtype)
        return (y, stored) if return_h else y
