"""Fused projective-gather Pallas kernel.

TPUs dislike gathers (SURVEY.md §7 hard part #3): the XLA path does 4
``take_along_axis`` gathers per pyramid level (~11 ms of a ~32 ms conditional
denoiser eval at B=48, N=2048). This kernel rewrites the bilinear lookup as
MXU work using the separable one-hot formulation:

    out[n, c] = sum_h sum_w  ohh[n, h] * ohw[n, w] * F[h, w, c]

- ``ohh [TN, H]``: two nonzeros per row, (1-fh) at floor(ch) and fh at
  floor(ch)+1 — built with iota comparisons in VMEM (out-of-range corner
  indices simply never match, reproducing the XLA path's zero padding);
- contract H on the MXU: ``tmp [TN, W*C] = ohh @ F.reshape(H, W*C)``;
- contract W on the VPU: ``out[n, c] = sum_w ohw[n, w] * tmp[n, w, c]``.

One pallas_call per pyramid level, grid (B, N-tiles).

SPMD: the forward kernel is wrapped in ``custom_partitioning`` — batch and
point axes partition freely (each shard looks up its own points; the feature
map is replicated along the point axis), so the conditional configs run under
jit over a (data, seq) mesh. The backward is plain XLA and partitions
automatically.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["bilinear_lookup_pallas", "lookup_pyramid_pallas"]


def _gather_kernel(ch_ref, cw_ref, hidx_ref, widx_ref, f_ref, o_ref, *, height: int, width: int):
    ch = ch_ref[0]  # [TN, 1] fp32, pixel-space h coordinate
    cw = cw_ref[0]  # [TN, 1]
    hidx = hidx_ref[0]  # [1, H*W] int32: h index of each flattened position
    widx = widx_ref[0]  # [1, H*W] int32
    f = f_ref[0]  # [H*W, C]

    h0 = jnp.floor(ch)
    fh = ch - h0
    w0 = jnp.floor(cw)
    fw = cw - w0
    # int32 comparisons (Mosaic iota/compare must be integer-typed); clamp
    # the float floor into int range first — out-of-image corners never match
    h0i = jnp.clip(h0, -2.0, float(height + 1)).astype(jnp.int32)
    w0i = jnp.clip(w0, -2.0, float(width + 1)).astype(jnp.int32)

    # combined bilinear one-hot [TN, H*W]: product of the separable weights
    wh = jnp.where(hidx == h0i, 1.0 - fh, 0.0) + jnp.where(hidx == h0i + 1, fh, 0.0)
    ww = jnp.where(widx == w0i, 1.0 - fw, 0.0) + jnp.where(widx == w0i + 1, fw, 0.0)
    weights = wh * ww

    # one MXU matmul replaces the 4-corner gather: [TN, HW] @ [HW, C]
    out = jax.lax.dot_general(
        weights.astype(f.dtype), f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@jax.custom_vjp
def bilinear_lookup_pallas(level: jnp.ndarray, coords_hw: jnp.ndarray) -> jnp.ndarray:
    """``level [B, H, W, C]`` sampled at pixel-space ``coords_hw [B, N, 2]``
    -> ``[B, N, C]`` (zero outside, order-1, matching ops.projective).

    Differentiable: forward runs the fused kernel; the backward is a second
    Pallas kernel (below) that rewrites the scatter-add dL/dlevel as an
    accumulated MXU matmul — XLA lowers the scatter to serial updates, which
    dominated the conditional train step.
    """
    return _lookup_forward(level, coords_hw)


def _lookup_fwd(level, coords_hw):
    return _lookup_forward(level, coords_hw), (level, coords_hw)


def _gather_bwd_kernel(
    ch_ref, cw_ref, hidx_ref, widx_ref, f_ref, g_ref,
    df_ref, dch_ref, dcw_ref,
    *, height: int, width: int,
):
    """Backward of the one-hot formulation, all MXU/VPU work:

    - dF[hw, c]  = sum_n weights[n, hw] g[n, c]      (matmul, accumulated
      across point tiles in the output block — index_map constant over ni);
    - dch[n] = sum_hw (dwh * ww)[n, hw] * (g F^T)[n, hw]   (matmul + VPU row
      reduction), likewise dcw — the derivative of the bilinear weights wrt
      the pixel coordinate is just the +/-1 corner pattern.
    """
    ch = ch_ref[0]
    cw = cw_ref[0]
    hidx = hidx_ref[0]
    widx = widx_ref[0]
    f = f_ref[0]  # [HW, C]
    g = g_ref[0]  # [TN, C]

    h0 = jnp.floor(ch)
    fh = ch - h0
    w0 = jnp.floor(cw)
    fw = cw - w0
    h0i = jnp.clip(h0, -2.0, float(height + 1)).astype(jnp.int32)
    w0i = jnp.clip(w0, -2.0, float(width + 1)).astype(jnp.int32)

    m_h0 = (hidx == h0i).astype(jnp.float32)
    m_h1 = (hidx == h0i + 1).astype(jnp.float32)
    m_w0 = (widx == w0i).astype(jnp.float32)
    m_w1 = (widx == w0i + 1).astype(jnp.float32)
    wh = m_h0 * (1.0 - fh) + m_h1 * fh
    ww = m_w0 * (1.0 - fw) + m_w1 * fw
    dwh = m_h1 - m_h0  # d wh / d ch
    dww = m_w1 - m_w0

    weights = wh * ww

    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _():
        df_ref[0] = jnp.zeros_like(df_ref[0])

    # dF partial: [HW, TN] @ [TN, C] on the MXU, accumulated in VMEM
    df_ref[0] += jax.lax.dot_general(
        weights.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # u[n, hw] = sum_c g[n, c] F[hw, c]
    u = jax.lax.dot_general(
        g, f, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dch_ref[0] = jnp.sum(dwh * ww * u, axis=-1, keepdims=True)
    dcw_ref[0] = jnp.sum(wh * dww * u, axis=-1, keepdims=True)


def _lookup_backward_impl(level, coords_hw, g):
    b, h, w, c = level.shape
    n = coords_hw.shape[1]
    tn = 256
    while n % tn != 0:
        tn //= 2
        if tn < 8:
            tn = n
            break

    ch = coords_hw[..., 0:1].astype(jnp.float32)
    cw = coords_hw[..., 1:2].astype(jnp.float32)
    f = level.reshape(b, h * w, c)
    hw_ids = jnp.arange(h * w, dtype=jnp.int32)
    hidx = (hw_ids // w)[None]
    widx = (hw_ids % w)[None]

    df, dch, dcw = pl.pallas_call(
        functools.partial(_gather_bwd_kernel, height=h, width=w),
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, 1), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h * w, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h * w, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=jax.default_backend() != "tpu",
    )(ch, cw, hidx, widx, f, g.astype(level.dtype))

    # tie outputs against pallas-output DCE (axon Mosaic, see induced_attention)
    tie = (0.0 * (dch[0, 0, 0] + dcw[0, 0, 0])).astype(df.dtype)
    dlevel = df.at[0, 0, 0].add(tie).reshape(b, h, w, c).astype(level.dtype)
    dcoords = jnp.concatenate([dch, dcw], axis=-1).astype(coords_hw.dtype)
    return dlevel, dcoords


_lookup_backward = custom_partitioning(_lookup_backward_impl)


def _lookup_bwd_partition(mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[1].sharding, 0)
    level_sh = NamedSharding(mesh, P(b, None, None, None))
    coords_sh = NamedSharding(mesh, P(b, None, None))
    return (
        mesh,
        _lookup_backward_impl,
        (level_sh, coords_sh),
        (level_sh, coords_sh, coords_sh),
    )


def _lookup_bwd_infer(mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[1].sharding, 0)
    return (
        NamedSharding(mesh, P(b, None, None, None)),
        NamedSharding(mesh, P(b, None, None)),
    )


_lookup_backward.def_partition(
    _lookup_bwd_partition,
    infer_sharding_from_operands=_lookup_bwd_infer,
    sharding_rule="b h w c, b n t, b n c1 -> b h w c, b n t",
    need_replication_factors=("h", "w", "c", "n", "t", "c1"),
)


def _lookup_bwd(res, g):
    level, coords_hw = res
    return _lookup_backward(level, coords_hw, g)


def _lookup_forward_impl(level: jnp.ndarray, coords_hw: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = level.shape
    n = coords_hw.shape[1]

    tn = 256
    while n % tn != 0:
        tn //= 2
        if tn < 8:
            tn = n
            break

    ch = coords_hw[..., 0:1].astype(jnp.float32)  # [B, N, 1]
    cw = coords_hw[..., 1:2].astype(jnp.float32)
    f = level.reshape(b, h * w, c)
    hw_ids = jnp.arange(h * w, dtype=jnp.int32)
    hidx = (hw_ids // w)[None]  # [1, H*W]
    widx = (hw_ids % w)[None]

    out = pl.pallas_call(
        functools.partial(_gather_kernel, height=h, width=w),
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, 1), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), level.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=jax.default_backend() != "tpu",
    )(ch, cw, hidx, widx, f)
    return out


_lookup_forward = custom_partitioning(_lookup_forward_impl)


def _spec_dim(sharding, i):
    spec = getattr(sharding, "spec", None)
    return spec[i] if spec is not None and i < len(spec) else None


def _lookup_shardings(mesh, coords_sharding):
    b, n = _spec_dim(coords_sharding, 0), _spec_dim(coords_sharding, 1)
    level_sh = NamedSharding(mesh, P(b, None, None, None))
    coords_sh = NamedSharding(mesh, P(b, n, None))
    out_sh = NamedSharding(mesh, P(b, n, None))
    return level_sh, coords_sh, out_sh


def _lookup_partition(mesh, arg_shapes, result_shape):
    level_sh, coords_sh, out_sh = _lookup_shardings(mesh, arg_shapes[1].sharding)
    return mesh, _lookup_forward_impl, out_sh, (level_sh, coords_sh)


def _lookup_infer(mesh, arg_shapes, result_shape):
    return _lookup_shardings(mesh, arg_shapes[1].sharding)[2]


_lookup_forward.def_partition(
    _lookup_partition,
    infer_sharding_from_operands=_lookup_infer,
    sharding_rule="b h w c, b n t -> b n c",
    need_replication_factors=("h", "w", "c", "t"),
)


bilinear_lookup_pallas.defvjp(_lookup_fwd, _lookup_bwd)


def lookup_pyramid_pallas(features: Sequence[jnp.ndarray], hw01: jnp.ndarray) -> jnp.ndarray:
    """Pyramid lookup with the fused kernel (see ops.projective.lookup_pyramid)."""
    hw01 = hw01.astype(jnp.float32)
    out = []
    for level in features:
        _, h, w, _ = level.shape
        coords = hw01 * jnp.array([h, w], dtype=jnp.float32)
        out.append(bilinear_lookup_pallas(level, coords))
    return jnp.concatenate(out, axis=-1)
