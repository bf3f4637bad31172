"""Rectangular multi-head attention for induced set attention.

The whole network runs on exactly two attention shapes (SURVEY.md §5.7):
pool (I queries x N keys) and broadcast/unpool (N queries x I keys), with
I ~ 64 << N. Both are rectangular, unmasked, and MXU-dominated.

The XLA path below is a single fused einsum chain (logits fp32, softmax fp32,
output in the activation dtype). A fused Pallas flash-attention variant lives
in gecco_tpu.ops.pallas and is selected via ``impl='pallas'`` when profitable.

Reference behaviour being replaced: per-head vmap over equinox
``dot_product_attention`` (gecco-jax/src/gecco_jax/models/set_transformer.py:87-94)
and ``F.scaled_dot_product_attention``
(gecco-torch/src/gecco_torch/models/set_transformer.py:57).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["rect_attention", "pool_attention_folded", "unpool_attention_folded"]


def rect_attention(
    q: jnp.ndarray,  # [B, H, M, D]
    k: jnp.ndarray,  # [B, H, N, D]
    v: jnp.ndarray,  # [B, H, N, D]
    impl: str = "xla",
) -> jnp.ndarray:  # [B, H, M, D]
    """Unmasked scaled dot-product attention over rectangular shapes."""
    if impl == "pallas":
        from gecco_tpu.ops.pallas.induced_attention import rect_attention_pallas

        return rect_attention_pallas(q, k, v)

    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum(
        "bhmd,bhnd->bhmn", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    weights = _softmax_fp32(logits)
    out = jnp.einsum(
        "bhmn,bhnd->bhmd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def _softmax_fp32(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logits = logits - logits.max(axis=axis, keepdims=True)
    unnorm = jnp.exp(logits)
    return unnorm / unnorm.sum(axis=axis, keepdims=True)


# -- Folded-projection attention -------------------------------------------
#
# The per-head formulation above runs [M, 48] x [48, N] matmuls per head: with
# M = 64 inducers and head_dim 48, both the M tile (64/128) and the
# contraction tile (48/128) under-fill the MXU, capping utilization at ~19%
# (measured: ~15 ms of a 25 ms denoiser eval at B=64, N=2048, C=384, H=8).
#
# Because the attention is unmasked and rectangular with a *tiny* side
# (I ~ 64 inducers), the head projections can be folded into the logit and
# value matmuls exactly:
#
#   s[n, h, i] = 1/sqrt(D) * <x[n] Wq, k[h,i]>  =  x[n] . K'[:, h*I + i]
#     with K'[c, hI+i] = 1/sqrt(D) * sum_d Wq[(h,d), c] k[h, i, d]
#
#   y[n] = sum_{h,i} p[n,h,i] * (v[h,i] Wo_h)  =  p_flat[n] @ V'
#     with V'[hI+i, c'] = sum_d v[h, i, d] Wo[c', (h,d)]
#
# K'/V' cost O(C·D·I·H) — negligible — and the two hot matmuls become
# [N, C] x [C, H*I] and [N, H*I] x [H*I, C]: full-width MXU shapes. The
# per-head structure survives only in the softmax, applied over static
# 64-wide blocks of the last axis (a VPU op; no per-head matmuls remain).
# This is the same function, same weights — an execution strategy, not an
# architecture change (checkpoint-compatible with the reference,
# gecco-jax/src/gecco_jax/models/set_transformer.py:87-94).
#
# Bonus: both folded directions are plain einsum/softmax programs, so they
# are natively SPMD-partitionable by GSPMD (batch over 'data', points over
# 'seq') with no custom_partitioning wrapping.


def _fold_unpool_operands(h, q_weight, k_weight, v_weight, out_weight, num_heads, dt):
    """Fold q/out projections against the (tiny) inducer-state keys/values.

    Returns k_folded [B, C, J] and v_folded [B, J, C] with J = H*I.
    """
    b, i, c = h.shape
    d = c // num_heads
    scale = 1.0 / math.sqrt(d)

    wq = q_weight.astype(dt).reshape(num_heads, d, c)
    wo = out_weight.astype(dt).reshape(c, num_heads, d)

    k = (h @ k_weight.astype(dt).T).reshape(b, i, num_heads, d)
    v = (h @ v_weight.astype(dt).T).reshape(b, i, num_heads, d)

    k_folded = scale * jnp.einsum(
        "hdc,bihd->bchi", wq, k, preferred_element_type=jnp.float32
    ).astype(dt)
    v_folded = jnp.einsum(
        "bihd,chd->bhic", v, wo, preferred_element_type=jnp.float32
    ).astype(dt)
    return (
        k_folded.reshape(b, c, num_heads * i),
        v_folded.reshape(b, num_heads * i, c),
    )


def _fold_pool_operands(inducers, kv_weight, num_heads, dt):
    """Fold the k-projection against the learnable queries (data-independent).

    Returns q_folded [C, J] and the value weight transposed [C, C].
    """
    _, i, d = inducers.shape
    c = kv_weight.shape[1]
    scale = 1.0 / math.sqrt(d)
    wk = kv_weight[:c].reshape(num_heads, d, c)
    q_folded = scale * jnp.einsum(
        "hdc,hid->chi",
        wk.astype(jnp.float32),
        inducers.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(c, num_heads * i).astype(dt)
    return q_folded, kv_weight[c:].astype(dt).T


def unpool_attention_folded(
    x: jnp.ndarray,  # [B, N, C] queries (points)
    h: jnp.ndarray,  # [B, I, C] keys/values (inducer state)
    q_weight: jnp.ndarray,  # [C, C] Linear convention: out = in @ W.T
    k_weight: jnp.ndarray,  # [C, C]
    v_weight: jnp.ndarray,  # [C, C]
    out_weight: jnp.ndarray,  # [C, C]
    num_heads: int,
    impl: str = "xla",
) -> jnp.ndarray:  # [B, N, C]
    b, n, c = x.shape
    i = h.shape[1]
    dt = x.dtype

    if impl == "pallas":
        # standalone kernel path: no pre-norm, no residual; the q/out
        # projections are folded against k/v inside the kernel
        from gecco_tpu.ops.pallas.folded_attention import folded_unpool

        ones = jnp.ones((b, c), jnp.float32)
        zeros = jnp.zeros((b, c), jnp.float32)
        k = h @ k_weight.astype(dt).T
        v = h @ v_weight.astype(dt).T
        out, _ = folded_unpool(
            x, ones, zeros, k, v,
            q_weight.astype(dt), out_weight.astype(dt),
            num_heads, False, False,
        )
        return out

    k_folded, v_folded = _fold_unpool_operands(
        h, q_weight, k_weight, v_weight, out_weight, num_heads, dt
    )

    logits = jnp.einsum(
        "bnc,bcj->bnj", x, k_folded, preferred_element_type=jnp.float32
    )
    p = _softmax_fp32(logits.reshape(b, n, num_heads, i), axis=-1)
    return jnp.einsum(
        "bnj,bjc->bnc",
        p.reshape(b, n, num_heads * i).astype(dt),
        v_folded,
        preferred_element_type=jnp.float32,
    ).astype(dt)


def pool_attention_folded(
    x: jnp.ndarray,  # [B, N, C] keys/values (points)
    inducers: jnp.ndarray,  # [H, I, D] learnable queries
    kv_weight: jnp.ndarray,  # [2C, C] fused kv projection
    out_weight: jnp.ndarray,  # [C, C]
    num_heads: int,
    impl: str = "xla",
) -> jnp.ndarray:  # [B, I, C]
    b, n, c = x.shape
    _, i, d = inducers.shape
    dt = x.dtype

    if impl == "pallas":
        from gecco_tpu.ops.pallas.folded_attention import (
            folded_pool_layer,
            group_indicator,
            pool_vmem_ok,
        )

        if pool_vmem_ok(n, c, num_heads * i, jnp.dtype(dt).itemsize):
            # standalone kernel path: no pre-norm; the k-fold, softmax-over-N,
            # per-head pooling and output projection all run in the kernel
            ones = jnp.ones((b, c), jnp.float32)
            zeros = jnp.zeros((b, c), jnp.float32)
            h0, _, _ = folded_pool_layer(
                x, ones, zeros,
                inducers.reshape(num_heads * i, d).astype(dt),
                kv_weight.astype(dt), out_weight.astype(dt),
                group_indicator(c, 32), num_heads, False,
            )
            return h0
        # fall through to the XLA folded path for VMEM-exceeding shapes

    q_folded, wv_t = _fold_pool_operands(inducers, kv_weight, num_heads, dt)

    logits = jnp.einsum(
        "bnc,cj->bnj", x, q_folded, preferred_element_type=jnp.float32
    )
    # softmax over the POINT axis (keys), per (head, inducer) column
    p = _softmax_fp32(logits.reshape(b, n, num_heads, i), axis=1)

    v = (x @ wv_t).reshape(b, n, num_heads, d)
    pooled = jnp.einsum(
        "bnhi,bnhd->bihd", p.astype(dt), v, preferred_element_type=jnp.float32
    ).astype(dt)
    return pooled.reshape(b, i, c) @ out_weight.astype(dt).T
