"""Fused h-side (inducer-state) processing for a BroadcastingLayer.

Between the pool and unpool megakernels (ops/pallas/folded_attention.py) the
layer runs norm_1 -> MLP -> norm_2 on the pooled ``[B, I, C]`` inducer tokens
and then projects them to the unpool's k/v — in the reference this is the
middle of ``Broadcast`` (gecco-jax/src/gecco_jax/models/set_transformer.py:
105-157) plus the MultiheadAttention k/v projections (:144-157). The tensors
are tiny (I ~ 64), so at XLA level this is ~8 sequential ops dominated by the
~0.44 ms/op dispatch latency of the axon relay (BASELINE.md), ~1.5 ms of the
~18 ms denoiser eval. This kernel runs the whole chain as ONE Pallas program
per batch element:

    stats -> AdaGN affine -> W1 -> gaussian act -> W2 -> stats -> AdaGN
    affine -> (h, k = h Wk^T, v = h Wv^T)

GroupNorm statistics use the same [C, G] indicator-matmul group fold as the
pool kernel (Mosaic cannot reshape [C] -> [G, C/G]). The Gaussian activation's
alpha and the normalized-activation affine are pre-folded into the MLP
operands by the caller, exactly as for ``fused_mlp_residual``.

Backward: XLA twin recompute (jax.vjp of ``_hside_ref``) — the tensors are
[B, I, C]-small, so the twin backward costs ~nothing and keeps gradients
exact. Interpret mode off-TPU; SPMD via custom_partitioning (batch only —
the h side has no point axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["fused_h_side"]

_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _spec_dim(sharding, i):
    spec = getattr(sharding, "spec", None)
    return spec[i] if spec is not None and i < len(spec) else None


def _hside_kernel(
    h0_ref, s1_ref, b1n_ref, s2_ref, b2n_ref, gind_ref,
    w1t_ref, b1_ref, w2t_ref, b2_ref, wk_ref, wv_ref,
    h_ref, k_ref, v_ref,
    *, n_inducers: int,
):
    x = h0_ref[0].astype(jnp.float32)  # [G*I, C] — G batch elements stacked
    gi, c = x.shape
    g_elems = gi // n_inducers
    gind = gind_ref[:]  # [C, Gg] fp32
    per_group = c // gind.shape[1]
    count = n_inducers * per_group
    # row -> batch-element indicator [G*I, G]: all per-element statistics
    # and affine expansions ride matmuls against this (no 3D ops in Mosaic)
    bsel = (
        jax.lax.broadcasted_iota(jnp.int32, (gi, g_elems), 0) // n_inducers
        == jax.lax.broadcasted_iota(jnp.int32, (gi, g_elems), 1)
    ).astype(jnp.float32)

    def expand(per_elem):  # [G, C] -> [G*I, C]
        return jax.lax.dot_general(
            bsel, per_elem, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def stats(z):  # [G*I, C] -> per-row mean/inv [G*I, C]
        zs1 = jax.lax.dot_general(
            bsel, z, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, C] per-element channel sums
        zs2 = jax.lax.dot_general(
            bsel, z * z, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g1 = jax.lax.dot_general(
            zs1, gind, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, Gg]
        g2 = jax.lax.dot_general(
            zs2, gind, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        mean_g = g1 / count
        var_g = g2 / count - mean_g * mean_g
        inv_g = jax.lax.rsqrt(jnp.maximum(var_g, 0.0) + _EPS)
        mean_c = jax.lax.dot_general(
            mean_g, gind, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, C]
        inv_c = jax.lax.dot_general(
            inv_g, gind, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return expand(mean_c), expand(inv_c)

    m1, i1 = stats(x)
    y1 = ((x - m1) * (i1 * expand(s1_ref[0])) + expand(b1n_ref[0])).astype(
        h0_ref.dtype
    )
    a = jax.lax.dot_general(
        y1, w1t_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:]  # [G*I, W]; alpha pre-folded by the caller
    g = jnp.exp(-0.5 * a * a).astype(y1.dtype)
    hh = jax.lax.dot_general(
        g, w2t_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[:]  # [G*I, C]

    m2, i2 = stats(hh)
    y2 = ((hh - m2) * (i2 * expand(s2_ref[0])) + expand(b2n_ref[0])).astype(
        h_ref.dtype
    )
    h_ref[0] = y2
    k_ref[0] = jax.lax.dot_general(
        y2, wk_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(k_ref.dtype)
    v_ref[0] = jax.lax.dot_general(
        y2, wv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(v_ref.dtype)


def _hside_impl(h0, s1, b1n, s2, b2n, gind, w1t, b1, w2t, b2, wk, wv):
    """h0 [B, I, C]; s*/b*n [B, C] fp32 (AdaGN embed affines for norm_1 and
    norm_2); gind [C, G]; w1t [C, W] / b1 [1, W] fp32 (alpha-folded),
    w2t [W, C] / b2 [1, C] fp32 (normalized-activation-folded); wk/wv [C, C]
    -> (h [B, I, C], k [B, I, C], v [B, I, C]).

    Several batch elements are processed per grid step (the per-element
    tensors are tiny) by stacking them along the token axis — [B, I, C] ->
    [B/G, G*I, C] is a free layout-preserving reshape — which turns the
    matmuls MXU-wide and cuts the grid-step count ~8x."""
    bsz, i, c = h0.shape
    w = w1t.shape[-1]
    g_elems = next(g for g in (8, 4, 2, 1) if bsz % g == 0)
    nb = bsz // g_elems
    h0r = h0.reshape(nb, g_elems * i, c)
    vecs = [t.reshape(nb, g_elems, c) for t in (s1, b1n, s2, b2n)]
    h, k, v = pl.pallas_call(
        functools.partial(_hside_kernel, n_inducers=i),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, g_elems * i, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_elems, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_elems, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_elems, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_elems, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(gind.shape, lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g_elems * i, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_elems * i, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_elems * i, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, g_elems * i, c), h0.dtype),
            jax.ShapeDtypeStruct((nb, g_elems * i, c), h0.dtype),
            jax.ShapeDtypeStruct((nb, g_elems * i, c), h0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(h0r, *vecs, gind, w1t, b1, w2t, b2, wk, wv)
    h, k, v = (t.reshape(bsz, i, c) for t in (h, k, v))
    # tie outputs together against pallas-output DCE (axon Mosaic bug);
    # in-place single-element form (XLA aliases the buffer)
    h = h.at[0, 0, 0].add((0.0 * (k[0, 0, 0] + v[0, 0, 0])).astype(h.dtype))
    return h, k, v


_hside_p = custom_partitioning(_hside_impl)


def _hside_partition(mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    w_sh = NamedSharding(mesh, P(None, None))
    return (
        mesh,
        _hside_impl,
        (x_sh, x_sh, x_sh),
        (x_sh, vec_sh, vec_sh, vec_sh, vec_sh) + (w_sh,) * 7,
    )


def _hside_infer(mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    return (x_sh, x_sh, x_sh)


_hside_p.def_partition(
    _hside_partition,
    infer_sharding_from_operands=_hside_infer,
    sharding_rule=(
        "b i c, b c, b c, b c, b c, c1 g, c2 w, u w, w1 c3, u1 c4, c5 c6, "
        "c7 c8 -> b i c, b i c, b i c"
    ),
    need_replication_factors=(
        "i", "c", "c1", "g", "c2", "w", "u", "w1", "c3", "u1", "c4",
        "c5", "c6", "c7", "c8",
    ),
)


def _hside_ref(h0, s1, b1n, s2, b2n, gind, w1t, b1, w2t, b2, wk, wv):
    """XLA twin of ``_hside_impl`` — the backward recomputes through this."""
    from gecco_tpu.ops.norms import group_norm_stats

    num_groups = gind.shape[1]
    dt = h0.dtype
    m1, i1 = group_norm_stats(h0, num_groups=num_groups)
    y1 = (
        (h0.astype(jnp.float32) - m1[:, None, :]) * (i1 * s1)[:, None, :]
        + b1n[:, None, :]
    ).astype(dt)
    a = (
        jnp.einsum("bic,cw->biw", y1, w1t, preferred_element_type=jnp.float32)
        + b1[None]
    )
    g = jnp.exp(-0.5 * a * a).astype(dt)
    hh = (
        jnp.einsum("biw,wc->bic", g, w2t, preferred_element_type=jnp.float32)
        + b2[None]
    )
    m2, i2 = group_norm_stats(hh, num_groups=num_groups)
    y2 = (
        (hh - m2[:, None, :]) * (i2 * s2)[:, None, :] + b2n[:, None, :]
    ).astype(dt)
    k = jnp.einsum("bic,oc->bio", y2, wk.astype(dt), preferred_element_type=jnp.float32).astype(dt)
    v = jnp.einsum("bic,oc->bio", y2, wv.astype(dt), preferred_element_type=jnp.float32).astype(dt)
    return y2, k, v


@jax.custom_vjp
def fused_h_side(h0, s1, b1n, s2, b2n, gind, w1t, b1, w2t, b2, wk, wv):
    return _hside_p(h0, s1, b1n, s2, b2n, gind, w1t, b1, w2t, b2, wk, wv)


def _hside_fwd(h0, s1, b1n, s2, b2n, gind, w1t, b1, w2t, b2, wk, wv):
    out = _hside_p(h0, s1, b1n, s2, b2n, gind, w1t, b1, w2t, b2, wk, wv)
    return out, (h0, s1, b1n, s2, b2n, gind, w1t, b1, w2t, b2, wk, wv)


def _hside_bwd(res, g):
    h0, s1, b1n, s2, b2n, gind, w1t, b1, w2t, b2, wk, wv = res
    _, vjp = jax.vjp(
        lambda *a: _hside_ref(*a[:5], gind, *a[5:]),
        h0, s1, b1n, s2, b2n, w1t, b1, w2t, b2, wk, wv,
    )
    dh0, ds1, db1n, ds2, db2n, dw1t, db1, dw2t, db2, dwk, dwv = vjp(g)
    return (
        dh0, ds1, db1n, ds2, db2n, jnp.zeros_like(gind),
        dw1t, db1, dw2t, db2, dwk, dwv,
    )


fused_h_side.defvjp(_hside_fwd, _hside_bwd)
