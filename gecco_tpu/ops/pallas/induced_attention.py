"""Fused rectangular attention Pallas kernels for induced set attention.

The denoiser only ever runs two attention shapes (SURVEY.md §5.7): pool
(M=I~64 queries x N points) and unpool (N points x I~64 keys). Both are
*thin*: the logits matrix has at most max(M, N) * I entries, so it fits VMEM
whole per (batch, head) — no online-softmax tiling, only query blocking.
The XLA path materialises fp32 logits in HBM (measured ~22 ms of a ~30 ms
denoiser eval at B=64, N=2048, C=384); these kernels keep them in VMEM.

Layout notes (TPU tiling rules; head_dim D=48 is NOT a multiple of the
128-lane width, so D must never be the minor axis):
- operands arrive transposed as ``[B, H, D, {M,N}]`` — lanes are the long
  point axis, sublanes the 48-wide head dim (multiple of 8);
- the grid is ``(B, H, M-tiles)``: one head per grid step keeps each Mosaic
  program small (the axon remote-compile helper crashes on large unrolled
  multi-head bodies) and lets the pipeline overlap heads;
- probabilities are normalised before the value matmul, which is computed
  as ``v @ p^T`` to keep the output transposed/aligned.

Backward: a second Pallas kernel recomputing p from the saved logsumexp;
dk/dv are emitted as per-query-tile partials and summed outside (no
cross-grid-step accumulation). All kernel outputs are tied into the result
value because jax-level DCE of unused pallas outputs also crashes the
compile helper.

SPMD: the forward and backward are wrapped in ``custom_partitioning`` so the
kernels run under jit over a device mesh (replacing the reference's
``lax.pmean`` data parallelism, models/diffusion.py:571-573):

- batch and head axes partition freely (the flagship data-parallel path);
- the query axis M partitions in the FORWARD — under point/sequence sharding
  the unpool (N queries x I keys) computes its local query tile with zero
  communication, while the pool's point-sharded k/v are all-gathered (I~64
  pooled tokens are replicated anyway);
- the backward marks M need-replication too (dk/dv reduce over M): seq-
  sharded training gathers the point axis around the attention backward.
  Correct first, optimal later — the flagship configs train data-parallel.

Both partitioner stacks are supported: an SDY sharding rule (shardy) and the
classic partition/infer callbacks (GSPMD). Autodiff never differentiates
through the custom_partitioning wrappers (which have no JVP rule): they sit
INSIDE the custom_vjp forward/backward.

Falls back to interpret mode off-TPU so the same path is testable on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["rect_attention_pallas"]


def _spec_dim(sharding, i):
    spec = getattr(sharding, "spec", None)
    return spec[i] if spec is not None and i < len(spec) else None


def _attn_kernel(qT_ref, kT_ref, vT_ref, oT_ref, lse_ref, *, scale: float, num_heads: int):
    # the forward unrolls heads inside one grid step: more MXU work per step
    # amortises fixed per-step overhead (measured 9.8 vs 7.7 clouds/s against
    # the head-on-grid variant); the smaller fwd body still compiles
    for h in range(num_heads):
        qT = qT_ref[0, h]  # [D, TM]
        kT = kT_ref[0, h]  # [D, N]
        vT = vT_ref[0, h]  # [D, N]

        # s[TM, N] = q @ k^T, contracting the D sublanes of both operands
        s = jax.lax.dot_general(
            qT, kT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale  # fp32, VMEM-resident

        m = jnp.max(s, axis=-1, keepdims=True)  # [TM, 1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / l

        # oT[D, TM] = v @ p^T, contracting the N lanes of both operands
        oT = jax.lax.dot_general(
            vT, p.astype(vT.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        oT_ref[0, h] = oT.astype(oT_ref.dtype)
        lse_ref[0, h] = m + jnp.log(l)


def _attn_kernel_1h(qT_ref, kT_ref, vT_ref, oT_ref, lse_ref, *, scale: float):
    """Single-head variant (heads on the grid) for shapes whose all-head kv
    blocks exceed VMEM (e.g. the scaled 8k-point config)."""
    qT = qT_ref[0, 0]
    kT = kT_ref[0, 0]
    vT = vT_ref[0, 0]
    s = jax.lax.dot_general(
        qT, kT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    oT = jax.lax.dot_general(
        vT, p.astype(vT.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    oT_ref[0, 0] = oT.astype(oT_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)


# all-head kv VMEM budget for the unrolled-heads forward (bytes)
_UNROLLED_KV_BUDGET = 6 * 1024 * 1024


def _pick_tile(m: int) -> int:
    # 1024 measured fastest at N=2048 (24.9 vs 25.7 ms/eval); full-M blocks
    # at M>=2048 exceed the 16 MB VMEM
    for tm in (1024, 512, 256, 128):
        if m % tm == 0:
            return tm
    return m


def _forward_impl(q, k, v):
    """q: [B, H, M, D], k/v: [B, H, N, D] -> (o [B, H, M, D], lse [B, H, M])."""
    b, h, m, d = q.shape
    n = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    tm = _pick_tile(m)

    qT = jnp.swapaxes(q, -1, -2)  # [B, H, D, M]
    kT = jnp.swapaxes(k, -1, -2)  # [B, H, D, N]
    vT = jnp.swapaxes(v, -1, -2)

    kv_bytes = 2 * h * d * n * q.dtype.itemsize
    # unrolled heads only when the all-head kv blocks fit VMEM and Mosaic
    # won't keep too many per-head intermediates live (>8 unrolled heads
    # measured to overflow the 16 MB scoped VMEM at M=8192)
    if kv_bytes <= _UNROLLED_KV_BUDGET and h <= 8:
        # unrolled heads: more MXU work per grid step (9.4 vs 7.7 clouds/s)
        oT, lse3 = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale, num_heads=h),
            grid=(b, m // tm),
            in_specs=[
                pl.BlockSpec((1, h, d, tm), lambda bi, mi: (bi, 0, 0, mi), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, d, n), lambda bi, mi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, d, n), lambda bi, mi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, h, d, tm), lambda bi, mi: (bi, 0, 0, mi), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, tm, 1), lambda bi, mi: (bi, 0, mi, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, d, m), q.dtype),
                jax.ShapeDtypeStruct((b, h, m, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
            interpret=jax.default_backend() != "tpu",
        )(qT, kT, vT)
    else:
        # heads on the grid: bounded VMEM for large N x many-head configs
        oT, lse3 = pl.pallas_call(
            functools.partial(_attn_kernel_1h, scale=scale),
            grid=(b, h, m // tm),
            in_specs=[
                pl.BlockSpec((1, 1, d, tm), lambda bi, hi, mi: (bi, hi, 0, mi), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d, n), lambda bi, hi, mi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d, n), lambda bi, hi, mi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, d, tm), lambda bi, hi, mi: (bi, hi, 0, mi), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tm, 1), lambda bi, hi, mi: (bi, hi, mi, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, d, m), q.dtype),
                jax.ShapeDtypeStruct((b, h, m, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
            interpret=jax.default_backend() != "tpu",
        )(qT, kT, vT)
    # Tie every kernel output into the result: jax's DCE otherwise prunes
    # unused pallas_call outputs (e.g. lse in remat's primal pass) and the
    # axon remote-compile helper crashes on the pruned call. A single-element
    # tie keeps the output alive at negligible cost.
    oT = oT.at[0, 0, 0, 0].add((0.0 * lse3[0, 0, 0, 0]).astype(oT.dtype))
    return jnp.swapaxes(oT, -1, -2), lse3[..., 0]


# -- SPMD wrapping (see module docstring) --

_forward = custom_partitioning(_forward_impl)


def _fwd_shardings(mesh, q_sharding):
    b, h, m = (_spec_dim(q_sharding, i) for i in range(3))
    q_sh = NamedSharding(mesh, P(b, h, m, None))
    kv_sh = NamedSharding(mesh, P(b, h, None, None))
    lse_sh = NamedSharding(mesh, P(b, h, m))
    return q_sh, kv_sh, lse_sh


def _fwd_partition(mesh, arg_shapes, result_shape):
    q_sh, kv_sh, lse_sh = _fwd_shardings(mesh, arg_shapes[0].sharding)
    return mesh, _forward_impl, (q_sh, lse_sh), (q_sh, kv_sh, kv_sh)


def _fwd_infer(mesh, arg_shapes, result_shape):
    q_sh, _, lse_sh = _fwd_shardings(mesh, arg_shapes[0].sharding)
    return (q_sh, lse_sh)


_forward.def_partition(
    _fwd_partition,
    infer_sharding_from_operands=_fwd_infer,
    sharding_rule="b h m d, b h n d, b h n d -> b h m d, b h m",
    need_replication_factors=("d", "n"),
)


@jax.custom_vjp
def _rect_attention_core(q, k, v):
    o, _ = _forward(q, k, v)
    return o


def _fwd(q, k, v):
    o, lse = _forward(q, k, v)
    return o, (q, k, v, o, lse)


def _bwd_kernel(
    qT_ref, kT_ref, vT_ref, doT_ref, lse_ref, delta_ref,
    dqT_ref, dkT_ref, dvT_ref,
    *, scale: float,
):
    """Flash-style backward: recompute p per tile in VMEM. dk/dv are written
    as per-query-tile partials (summed outside) — no cross-grid-step
    accumulation."""
    qT = qT_ref[0, 0]  # [D, TM]
    kT = kT_ref[0, 0]  # [D, N]
    vT = vT_ref[0, 0]
    doT = doT_ref[0, 0]  # [D, TM]
    lse = lse_ref[0, 0]  # [TM, 1]
    delta = delta_ref[0, 0]  # [TM, 1]

    s = jax.lax.dot_general(
        qT, kT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [TM, N]
    p = jnp.exp(s - lse)

    dp = jax.lax.dot_general(
        doT, vT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TM, N]
    ds = p * (dp - delta)
    ds_b = ds.astype(qT.dtype)
    p_b = p.astype(qT.dtype)

    # dqT [D, TM] = kT @ ds^T
    dqT_ref[0, 0] = (
        jax.lax.dot_general(
            kT, ds_b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    ).astype(dqT_ref.dtype)
    # dkT [D, N] partial = qT @ ds ; dvT [D, N] partial = doT @ p
    dkT_ref[0, 0, 0] = (
        jax.lax.dot_general(
            qT, ds_b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    dvT_ref[0, 0, 0] = jax.lax.dot_general(
        doT, p_b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _backward_impl(q, k, v, o, lse, g):
    b, h, m, d = q.shape
    n = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    tm = _pick_tile(m)
    n_mt = m // tm

    qT = jnp.swapaxes(q, -1, -2)
    kT = jnp.swapaxes(k, -1, -2)
    vT = jnp.swapaxes(v, -1, -2)
    doT = jnp.swapaxes(g, -1, -2).astype(q.dtype)
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [B, H, M, 1]
    lse4 = lse[..., None]

    dqT, dkT, dvT = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h, n_mt),
        in_specs=[
            pl.BlockSpec((1, 1, d, tm), lambda bi, hi, mi: (bi, hi, 0, mi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, n), lambda bi, hi, mi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, n), lambda bi, hi, mi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, tm), lambda bi, hi, mi: (bi, hi, 0, mi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm, 1), lambda bi, hi, mi: (bi, hi, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm, 1), lambda bi, hi, mi: (bi, hi, mi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, d, tm), lambda bi, hi, mi: (bi, hi, 0, mi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, d, n), lambda bi, hi, mi: (bi, mi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, d, n), lambda bi, hi, mi: (bi, mi, hi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, d, m), q.dtype),
            jax.ShapeDtypeStruct((b, n_mt, h, d, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n_mt, h, d, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=jax.default_backend() != "tpu",
    )(qT, kT, vT, doT, lse4, delta)

    # tie outputs together against pallas-output DCE (see _forward)
    tie = (0.0 * (dkT[0, 0, 0, 0, 0] + dvT[0, 0, 0, 0, 0])).astype(dqT.dtype)
    dq = jnp.swapaxes(dqT.at[(0,) * dqT.ndim].add(tie), -1, -2)
    dk = jnp.swapaxes(dkT.sum(axis=1), -1, -2).astype(k.dtype)
    dv = jnp.swapaxes(dvT.sum(axis=1), -1, -2).astype(v.dtype)
    return dq, dk, dv


_backward = custom_partitioning(_backward_impl)


def _bwd_shardings(mesh, q_sharding):
    b, h = _spec_dim(q_sharding, 0), _spec_dim(q_sharding, 1)
    like4 = NamedSharding(mesh, P(b, h, None, None))
    like3 = NamedSharding(mesh, P(b, h, None))
    return like4, like3


def _bwd_partition(mesh, arg_shapes, result_shape):
    like4, like3 = _bwd_shardings(mesh, arg_shapes[0].sharding)
    args = (like4, like4, like4, like4, like3, like4)
    outs = (like4, like4, like4)
    return mesh, _backward_impl, outs, args


def _bwd_infer(mesh, arg_shapes, result_shape):
    like4, _ = _bwd_shardings(mesh, arg_shapes[0].sharding)
    return (like4, like4, like4)


_backward.def_partition(
    _bwd_partition,
    infer_sharding_from_operands=_bwd_infer,
    sharding_rule=(
        "b h m d, b h n d, b h n d, b h m d, b h m, b h m d "
        "-> b h m d, b h n d, b h n d"
    ),
    need_replication_factors=("m", "d", "n"),
)


def _bwd(res, g):
    q, k, v, o, lse = res
    return _backward(q, k, v, o, lse, g)


_rect_attention_core.defvjp(_fwd, _bwd)


def rect_attention_pallas(q, k, v):
    """[B, H, M, D] x [B, H, N, D] -> [B, H, M, D], VMEM-fused."""
    return _rect_attention_core(q, k, v)
