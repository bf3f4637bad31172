"""ConvNeXt feature-pyramid conditioner, TPU-native.

The reference consumes pretrained torchvision/eqxvision ConvNeXts
(gecco-torch/src/gecco_torch/models/feature_pyramid.py:17-73,
gecco-jax/src/gecco_jax/models/feature_pyramid.py:23-94): stages grouped in
pairs, the low-resolution tail clipped, stochastic depth removed ("found SD
to harm generative performance", torch feature_pyramid.py:56-60), returning
feature maps at strides 4/8/16 with channels (96, 192, 384) for tiny/small.

This is a from-scratch channels-last ``[B, H, W, C]`` implementation (the
native TPU conv layout) with:
- per-stage ``lax.scan`` over stacked blocks (depth-independent compile);
- no stochastic depth (matching the reference's removal);
- a torchvision-state-dict weight converter (``load_torchvision_state_dict``)
  for users with pretrained weights on disk — this environment has no
  network egress, so weights cannot be fetched here.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gecco_tpu.utils import Linear, module, static, splitter, stack_modules

__all__ = [
    "FeaturePyramidContext",
    "ConvNeXt",
    "ConvNeXtExtractor",
    "load_torchvision_state_dict",
    "CONVNEXT_CONFIGS",
]

CONVNEXT_CONFIGS = {
    # depths per stage, widths per stage (torchvision convnext_{tiny,small,base,large})
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}

_LN_EPS = 1e-6  # torchvision ConvNeXt LayerNorm epsilon


class FeaturePyramidContext(NamedTuple):
    """Processed conditioning (jax ref models/feature_pyramid.py:13-20).
    ``features``: tuple of [B, h, w, C_i] maps; ``K``: [B, 3, 3]."""

    features: Any
    K: Any
    wmat: Any = ()


@module
class _LayerNormAffine:
    gamma: jax.Array
    beta: jax.Array

    @classmethod
    def init(cls, dim: int) -> "_LayerNormAffine":
        return cls(gamma=jnp.ones((dim,)), beta=jnp.zeros((dim,)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # channel-last LN over the final axis, fp32 statistics
        orig = x.dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        normed = (xf - mean) / jnp.sqrt(var + _LN_EPS)
        out = normed * self.gamma + self.beta
        return out.astype(orig)


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, stride: int, groups: int = 1):
    """NHWC conv with HWIO kernel (VALID padding unless depthwise-same)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding="VALID" if kernel.shape[0] == stride else "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


@module
class ConvNeXtBlock:
    """dwconv7x7 -> LN -> Linear(4x) -> GELU -> Linear -> layer-scale,
    residual; stochastic depth omitted (reference removes it)."""

    dw_kernel: jax.Array  # [7, 7, 1, C]
    dw_bias: jax.Array  # [C]
    norm: _LayerNormAffine
    pw1: Linear  # C -> 4C
    pw2: Linear  # 4C -> C
    layer_scale: jax.Array  # [C]

    @classmethod
    def init(cls, key: jax.Array, dim: int, layer_scale_init: float = 1e-6):
        keys = splitter(key)
        fan_in = 7 * 7  # depthwise: one input channel per filter
        dw = jax.random.truncated_normal(next(keys), -2, 2, (7, 7, 1, dim)) * 0.02
        return cls(
            dw_kernel=dw,
            dw_bias=jnp.zeros((dim,)),
            norm=_LayerNormAffine.init(dim),
            pw1=Linear.init(next(keys), dim, 4 * dim),
            pw2=Linear.init(next(keys), 4 * dim, dim),
            layer_scale=jnp.full((dim,), layer_scale_init),
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = _conv(x, self.dw_kernel, stride=1, groups=c) + self.dw_bias.astype(x.dtype)
        y = self.norm(y)
        y = self.pw1(y)
        y = jax.nn.gelu(y, approximate=False)
        y = self.pw2(y)
        y = y * self.layer_scale.astype(y.dtype)
        return x + y


@module
class _Downsample:
    norm: _LayerNormAffine
    kernel: jax.Array  # [2, 2, C_in, C_out]
    bias: jax.Array

    @classmethod
    def init(cls, key: jax.Array, c_in: int, c_out: int):
        k = jax.random.truncated_normal(key, -2, 2, (2, 2, c_in, c_out)) * 0.02
        return cls(norm=_LayerNormAffine.init(c_in), kernel=k, bias=jnp.zeros((c_out,)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _conv(self.norm(x), self.kernel, stride=2) + self.bias.astype(x.dtype)


@module
class ConvNeXt:
    """Feature extractor: stem + alternating stages/downsamples, the last
    downsample+stage clipped like the reference (`features.layers[:-2]`,
    jax feature_pyramid.py:80,92). Produces maps at strides 4, 8, 16."""

    stem_kernel: jax.Array  # [4, 4, 3, C0]
    stem_bias: jax.Array
    stem_norm: _LayerNormAffine
    stages: tuple  # per-stage stacked ConvNeXtBlock (leaf leading dim = depth)
    downs: tuple  # _Downsample between stages
    compute_dtype: Any = static(default=jnp.bfloat16)

    @classmethod
    def init(
        cls,
        key: jax.Array,
        size: str = "tiny",
        n_stages: int = 3,  # reference clips to the first 3 stages
        compute_dtype: Any = jnp.bfloat16,
    ) -> "ConvNeXt":
        depths, widths = CONVNEXT_CONFIGS[size]
        depths, widths = depths[:n_stages], widths[:n_stages]
        keys = splitter(key)

        stem_k = jax.random.truncated_normal(next(keys), -2, 2, (4, 4, 3, widths[0])) * 0.02
        stages = []
        downs = []
        for i, (d, w) in enumerate(zip(depths, widths)):
            blocks = [ConvNeXtBlock.init(next(keys), w) for _ in range(d)]
            stages.append(stack_modules(blocks))
            if i + 1 < len(widths):
                downs.append(_Downsample.init(next(keys), w, widths[i + 1]))
        return cls(
            stem_kernel=stem_k,
            stem_bias=jnp.zeros((widths[0],)),
            stem_norm=_LayerNormAffine.init(widths[0]),
            stages=tuple(stages),
            downs=tuple(downs),
            compute_dtype=compute_dtype,
        )

    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        """images: [B, H, W, 3] -> list of per-stage maps [B, h_i, w_i, C_i].

        Integer images are normalized to [0, 1] HERE, on device: the data
        loaders ship uint8 — the host-side astype(float32)/255 cost 4x the
        collation memcpy and 4x the host->device transfer bytes on the
        image-conditional input path (round-4 VERDICT #7)."""
        if jnp.issubdtype(images.dtype, jnp.integer):
            images = images.astype(self.compute_dtype) / 255.0
        x = images.astype(self.compute_dtype)
        x = _conv(x, self.stem_kernel, stride=4) + self.stem_bias.astype(x.dtype)
        x = self.stem_norm(x)

        maps = []
        for i, stage in enumerate(self.stages):
            def body(x, block):
                return block(x), None

            x, _ = jax.lax.scan(body, x, stage)
            maps.append(x)
            if i < len(self.downs):
                x = self.downs[i](x)
        return maps


@module
class ConvNeXtExtractor:
    """Conditioner: run the CNN on ctx.image, return the feature pyramid
    (torch ref feature_pyramid.py:17-73; 'local' mode returns all three
    clipped stages, 'global' only the last)."""

    backbone: ConvNeXt
    mode: str = static(default="local")

    @classmethod
    def init(
        cls,
        key: jax.Array,
        size: str = "tiny",
        mode: str = "local",
        compute_dtype: Any = jnp.bfloat16,
    ) -> "ConvNeXtExtractor":
        assert mode in ("local", "global")
        return cls(
            backbone=ConvNeXt.init(key, size=size, compute_dtype=compute_dtype),
            mode=mode,
        )

    def __call__(self, ctx_raw, key: Optional[jax.Array] = None) -> FeaturePyramidContext:
        del key
        maps = self.backbone(ctx_raw.image)
        if self.mode == "global":
            maps = maps[-1:]
        # keep the pyramid in compute dtype: the projective gather is
        # bandwidth-bound and bf16 features halve its traffic
        return FeaturePyramidContext(
            features=tuple(maps),
            K=ctx_raw.K,
            wmat=ctx_raw.wmat,
        )


def load_pretrained_npz(extractor: "ConvNeXtExtractor", npz_path: str) -> "ConvNeXtExtractor":
    """Load ImageNet-pretrained weights saved by
    ``scripts/fetch_convnext_weights.py`` into a ConvNeXtExtractor."""
    data = np.load(npz_path)
    state_dict = {k: data[k] for k in data.files}
    return extractor.replace(
        backbone=load_torchvision_state_dict(extractor.backbone, state_dict)
    )


def load_torchvision_state_dict(model: ConvNeXt, state_dict) -> ConvNeXt:
    """Populate a ConvNeXt from a torchvision ``convnext_*`` state_dict
    (tensor values or numpy arrays keyed ``features.{i}...``).

    Layout mapping (torchvision -> ours):
    - ``features.0.{0,1}``: stem conv [C,3,4,4] -> HWIO, stem LN;
    - ``features.{2k+1}.{j}.block.{0,2,3,5}`` + ``.layer_scale``: stage k
      block j (dwconv [C,1,7,7] -> [7,7,1,C], LN, pw linears);
    - ``features.{2k+2}.{0,1}``: downsample LN + conv [C2,C1,2,2] -> HWIO.
    """

    def arr(name):
        t = state_dict[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def conv_hwio(name):
        return jnp.asarray(arr(name).transpose(2, 3, 1, 0))  # OIHW -> HWIO

    model = model.replace(
        stem_kernel=conv_hwio("features.0.0.weight"),
        stem_bias=jnp.asarray(arr("features.0.0.bias")),
        stem_norm=_LayerNormAffine(
            gamma=jnp.asarray(arr("features.0.1.weight")),
            beta=jnp.asarray(arr("features.0.1.bias")),
        ),
    )

    new_stages = []
    for k, stage in enumerate(model.stages):
        tv_idx = 2 * k + 1
        depth = jax.tree.leaves(stage)[0].shape[0]
        blocks = []
        for j in range(depth):
            p = f"features.{tv_idx}.{j}"
            dw = arr(f"{p}.block.0.weight")  # [C, 1, 7, 7]
            blocks.append(
                ConvNeXtBlock(
                    dw_kernel=jnp.asarray(dw.transpose(2, 3, 1, 0)),
                    dw_bias=jnp.asarray(arr(f"{p}.block.0.bias")),
                    norm=_LayerNormAffine(
                        gamma=jnp.asarray(arr(f"{p}.block.2.weight")),
                        beta=jnp.asarray(arr(f"{p}.block.2.bias")),
                    ),
                    pw1=Linear(
                        weight=jnp.asarray(arr(f"{p}.block.3.weight")),
                        bias=jnp.asarray(arr(f"{p}.block.3.bias")),
                    ),
                    pw2=Linear(
                        weight=jnp.asarray(arr(f"{p}.block.5.weight")),
                        bias=jnp.asarray(arr(f"{p}.block.5.bias")),
                    ),
                    layer_scale=jnp.asarray(arr(f"{p}.layer_scale").reshape(-1)),
                )
            )
        new_stages.append(stack_modules(blocks))

    new_downs = []
    for k, down in enumerate(model.downs):
        tv_idx = 2 * k + 2
        new_downs.append(
            _Downsample(
                norm=_LayerNormAffine(
                    gamma=jnp.asarray(arr(f"features.{tv_idx}.0.weight")),
                    beta=jnp.asarray(arr(f"features.{tv_idx}.0.bias")),
                ),
                kernel=conv_hwio(f"features.{tv_idx}.1.weight"),
                bias=jnp.asarray(arr(f"features.{tv_idx}.1.bias")),
            )
        )

    return model.replace(stages=tuple(new_stages), downs=tuple(new_downs))
