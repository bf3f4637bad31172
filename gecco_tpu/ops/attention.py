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

__all__ = ["rect_attention"]


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


def _softmax_fp32(logits: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logits = logits - logits.max(axis=-1, keepdims=True)
    unnorm = jnp.exp(logits)
    return unnorm / unnorm.sum(axis=-1, keepdims=True)
