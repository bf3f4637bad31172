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

    def _head(self, processed: jnp.ndarray, out_dtype) -> jnp.ndarray:
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
        out = self.backbone(features, embed, hs=hs, return_h=return_h, key=key)
        if return_h:
            processed, stored = out
            return self._head(processed, x.dtype), stored
        return self._head(out, x.dtype)


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
        out = self.backbone(features, embed, hs=hs, return_h=return_h, key=key)
        if return_h:
            processed, stored = out
            normed = group_norm(processed, num_groups=self.output_norm_groups)
            return self.output_proj(normed).astype(x.dtype), stored
        normed = group_norm(out, num_groups=self.output_norm_groups)
        return self.output_proj(normed).astype(x.dtype)


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

        out = self.backbone(features, embed, hs=hs, return_h=return_h, key=key)
        if return_h:
            processed, stored = out
            normed = group_norm(processed, num_groups=self.output_norm_groups)
            return self.output_proj(normed).astype(x.dtype), stored
        normed = group_norm(out, num_groups=self.output_norm_groups)
        return self.output_proj(normed).astype(x.dtype)
