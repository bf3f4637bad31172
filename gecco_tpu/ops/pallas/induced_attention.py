"""Fused rectangular attention Pallas kernel for induced set attention.

The denoiser only ever runs two attention shapes (SURVEY.md §5.7): pool
(M=I~64 queries x N points) and unpool (N points x I~64 keys). Both are
*thin*: the logits matrix has at most max(M, N) * I entries, so for one
(batch, head) it fits VMEM whole — no online-softmax tiling is needed, only
blocking over the query axis. The XLA path materialises the fp32 logits in
HBM four times per softmax (bench: ~45 ms/denoiser eval, dtype-insensitive =
bandwidth-bound); this kernel keeps them in VMEM.

Forward: Pallas kernel per (B*H, M-block): s = q k^T * scale (fp32, MXU),
row softmax, o = p v, emitting o and the logsumexp.
Backward: custom VJP recomputing p from the saved logsumexp with plain XLA
einsums (the backward is matmul-dominated anyway; recompute avoids storing
the M x N probabilities).

Falls back to interpret mode off-TPU so the same code path is testable on
the CPU mesh.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rect_attention_pallas"]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[0]  # [TM, D]
    k = k_ref[0]  # [N, D]
    v = v_ref[0]  # [N, D]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale  # [TM, N] fp32, lives in VMEM only

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)

    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o = o / l

    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # [TM, 1]


def _forward(q, k, v):
    """q: [BH, M, D], k/v: [BH, N, D] -> (o [BH, M, D], lse [BH, M])."""
    bh, m, d = q.shape
    n = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    tm = min(m, 512)
    if m % tm != 0:  # fall back for awkward query counts
        tm = m
    grid = (bh, m // tm)

    kernel = functools.partial(_attn_kernel, scale=scale)
    o, lse3 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, m, d), q.dtype),
            jax.ShapeDtypeStruct((bh, m, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)
    return o, lse3[..., 0]


@jax.custom_vjp
def _rect_attention_bhmd(q, k, v):
    o, _ = _forward(q, k, v)
    return o


def _fwd(q, k, v):
    o, lse = _forward(q, k, v)
    return o, (q, k, v, o, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)

    s = jnp.einsum("bmd,bnd->bmn", q, k, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse[..., None])  # [BH, M, N]

    gf = g.astype(jnp.float32)
    of = o.astype(jnp.float32)
    dv = jnp.einsum("bmn,bmd->bnd", p, gf)
    dp = jnp.einsum("bmd,bnd->bmn", gf, v.astype(jnp.float32))
    delta = jnp.sum(gf * of, axis=-1, keepdims=True)  # [BH, M, 1]
    ds = p * (dp - delta)
    dq = jnp.einsum("bmn,bnd->bmd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bmn,bmd->bnd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_rect_attention_bhmd.defvjp(_fwd, _bwd)


def rect_attention_pallas(q, k, v):
    """[B, H, M, D] x [B, H, N, D] -> [B, H, M, D], VMEM-fused."""
    b, h, m, d = q.shape
    n = k.shape[2]
    out = _rect_attention_bhmd(
        q.reshape(b * h, m, d), k.reshape(b * h, n, d), v.reshape(b * h, n, d)
    )
    return out.reshape(b, h, m, d)
