"""Fused rectangular attention Pallas kernel for induced set attention.

The denoiser only ever runs two attention shapes (SURVEY.md §5.7): pool
(M=I~64 queries x N points) and unpool (N points x I~64 keys). Both are
*thin*: the logits matrix has at most max(M, N) * I entries, so it fits VMEM
whole per (batch, head) — no online-softmax tiling, only query blocking.
The XLA path materialises fp32 logits in HBM (measured ~22 ms of a ~30 ms
denoiser eval at B=64, N=2048, C=384); this kernel keeps them in VMEM.

Layout is chosen for the TPU tiling rules (head_dim D=48 is NOT a multiple
of the 128-lane width, so D must never be the minor axis):
- operands arrive transposed as ``[B, H, D, {M,N}]`` — lanes are the long
  point axis, sublanes the 48-wide head dim (multiple of 8);
- grid is ``(B, M-tiles)`` with a static unrolled loop over heads, so each
  grid step does 2*H MXU matmuls on well-shaped tiles;
- probabilities are normalised before the second matmul, which is computed
  as ``v @ p^T`` to keep the output transposed/aligned.

Backward: custom VJP recomputing probabilities from the saved logsumexp with
plain XLA einsums (matmul-dominated anyway).

Falls back to interpret mode off-TPU so the same path is testable on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rect_attention_pallas"]


def _attn_kernel(qT_ref, kT_ref, vT_ref, oT_ref, lse_ref, *, scale: float, num_heads: int):
    for h in range(num_heads):
        qT = qT_ref[0, h]  # [D, TM]
        kT = kT_ref[0, h]  # [D, N]
        vT = vT_ref[0, h]  # [D, N]

        # s[TM, N] = q @ k^T, contracting the D sublanes of both operands
        s = jax.lax.dot_general(
            qT,
            kT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale  # fp32, VMEM-resident

        m = jnp.max(s, axis=-1, keepdims=True)  # [TM, 1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / l  # normalise before the value matmul

        # oT[D, TM] = v @ p^T, contracting the N lanes of both operands
        oT = jax.lax.dot_general(
            vT,
            p.astype(vT.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        oT_ref[0, h] = oT.astype(oT_ref.dtype)
        lse_ref[0, h] = m + jnp.log(l)


def _pick_tile(m: int) -> int:
    for tm in (512, 256, 128):
        if m % tm == 0:
            return tm
    return m


def _forward(q, k, v):
    """q: [B, H, M, D], k/v: [B, H, N, D] -> (o [B, H, M, D], lse [B, H, M])."""
    b, h, m, d = q.shape
    n = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    tm = _pick_tile(m)

    qT = jnp.swapaxes(q, -1, -2)  # [B, H, D, M]
    kT = jnp.swapaxes(k, -1, -2)  # [B, H, D, N]
    vT = jnp.swapaxes(v, -1, -2)

    kernel = functools.partial(_attn_kernel, scale=scale, num_heads=h)
    oT, lse3 = pl.pallas_call(
        kernel,
        grid=(b, m // tm),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
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
        interpret=jax.default_backend() != "tpu",
    )(qT, kT, vT)
    return jnp.swapaxes(oT, -1, -2), lse3[..., 0]


@jax.custom_vjp
def _rect_attention_core(q, k, v):
    o, _ = _forward(q, k, v)
    return o


def _fwd(q, k, v):
    o, lse = _forward(q, k, v)
    return o, (q, k, v, o, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)

    s = jnp.einsum("bhmd,bhnd->bhmn", q, k, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse[..., None])  # [B, H, M, N]

    gf = g.astype(jnp.float32)
    of = o.astype(jnp.float32)
    dv = jnp.einsum("bhmn,bhmd->bhnd", p, gf)
    dp = jnp.einsum("bhmd,bhnd->bhmn", gf, v.astype(jnp.float32))
    delta = jnp.sum(gf * of, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("bhmn,bhnd->bhmd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhmn,bhmd->bhnd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_rect_attention_core.defvjp(_fwd, _bwd)


def rect_attention_pallas(q, k, v):
    """[B, H, M, D] x [B, H, N, D] -> [B, H, M, D], VMEM-fused."""
    return _rect_attention_core(q, k, v)
