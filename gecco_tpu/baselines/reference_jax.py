"""Reference-style (gecco-jax) implementation used as the HONEST benchmark
baseline.

``bench.py`` reports ``vs_baseline`` against this arm: a from-scratch
re-implementation of the reference's computational *structure*, run on the
same chip with the same weights:

- per-example modules, batched only by an outer ``jax.vmap`` — mirroring
  equinox per-example ``__call__`` + ``vmap`` over sample keys
  (gecco-jax/src/gecco_jax/models/diffusion.py:376-439);
- per-token ``jax.vmap`` of every Linear — mirroring ``jax.vmap(proj)(x)``
  (models/set_transformer.py:98-102);
- per-head ``jax.vmap`` over an unfused dot-product attention with SEPARATE
  key/value projections (models/set_transformer.py:84-95) and an
  eqx.nn.MultiheadAttention-style unpool (q/k/v/out projections,
  models/set_transformer.py:144-157);
- a Python loop over the layer stack (models/set_transformer.py:240-247),
  not ``lax.scan``;
- fp32 activations everywhere (the reference jax package has no mixed
  precision);
- channels-first GroupNorm through a MoveChannels-style transpose
  (models/normalization.py:129-163);
- the second-MLP-on-unnormed-stream quirk (models/set_transformer.py:216-217);
- fixed-grid Heun ODE stepping, two denoiser evaluations per transition
  (diffrax Heun + StepTo semantics, models/diffusion.py:333-374).

Weights are READ FROM an existing :class:`gecco_tpu.Diffusion` model (the
fused-kv projection is split back into separate k/v projections, the
``[H, I, D]`` inducers transposed to the reference's ``[I, H, D]``), so
``ref_denoise`` computes the *same function* as
``model.denoise`` with ``ref_jax_compat=True`` in fp32 — verified by
``tests/test_reference_baseline.py``. Only the implementation structure —
and therefore the speed — differs.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["ref_denoise", "ref_sample", "ref_denoise_single"]


def _vlinear(lin, x: jnp.ndarray) -> jnp.ndarray:
    """Per-token application of a Linear, reference style
    (``jax.vmap(proj)(x)``, models/set_transformer.py:98-102)."""

    def one(t):
        y = lin.weight.astype(t.dtype) @ t
        if lin.bias is not None:
            y = y + lin.bias.astype(t.dtype)
        return y

    return jax.vmap(one)(x)


def _dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Single-head attention ``[I, D] x [N, D] x [N, D] -> [I, D]``
    (equinox ``dot_product_attention`` semantics)."""
    logits = q @ k.T / math.sqrt(q.shape[-1])
    weights = jax.nn.softmax(logits, axis=-1)
    return weights @ v


def _group_norm_cf(x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-5):
    """Channels-first GroupNorm via MoveChannels transpose: ``[N, C]`` ->
    ``[C, N]`` -> eqx.nn.GroupNorm stats per group over (C/G, N)
    (models/normalization.py:129-163, ray.py:72-78)."""
    n, c = x.shape
    xt = x.T.reshape(num_groups, -1)
    mean = xt.mean(axis=-1, keepdims=True)
    var = xt.var(axis=-1, keepdims=True)
    out = (xt - mean) / jnp.sqrt(var + eps)
    return out.reshape(c, n).T


def _ada_gn(norm, x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """AdaGN, reference style: GroupNorm then embed-conditioned affine
    (models/normalization.py:9-100)."""
    scale = norm.scale_linear.weight @ embed + norm.scale_linear.bias
    bias = norm.bias_linear.weight @ embed + norm.bias_linear.bias
    return scale[None, :] * _group_norm_cf(x, norm.num_groups) + bias[None, :]


def _mlp(mlp, x: jnp.ndarray) -> jnp.ndarray:
    """Reference MLP: per-token vmapped Linears (models/mlp.py:16-102)."""
    for lin in mlp.layers[:-1]:
        x = mlp.activation(_vlinear(lin, x))
    return _vlinear(mlp.layers[-1], x)


def _attention_pool(pool, kv: jnp.ndarray) -> jnp.ndarray:
    """Learnable-query cross attention with separate k/v projections and a
    per-head vmap (models/set_transformer.py:76-102). Our fused ``kv_proj``
    weight ``[2C, C]`` is split back into the reference's separate key/value
    Linears; ``[H, I, D]`` inducers become the reference's ``[I, H, D]``."""
    n, c = kv.shape
    num_heads = pool.num_heads
    kw = pool.kv_proj.weight  # [2C, C]; rows 0:C produce k, C:2C produce v

    key_heads = jax.vmap(lambda t: kw[:c] @ t)(kv).reshape(n, num_heads, -1)
    value_heads = jax.vmap(lambda t: kw[c:] @ t)(kv).reshape(n, num_heads, -1)
    query_heads = pool.inducers.transpose(1, 0, 2)  # [I, H, D]

    attn = jax.vmap(_dot_product_attention, in_axes=1, out_axes=1)(
        query_heads, key_heads, value_heads
    )
    attn = attn.reshape(query_heads.shape[0], -1)
    return _vlinear(pool.out_proj, attn)


def _multihead_attention(unpool, q: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
    """eqx.nn.MultiheadAttention-style unpool: separate q/k/v/out projections,
    per-head vmap (models/set_transformer.py:144-157)."""
    num_heads = unpool.num_heads
    qh = _vlinear(unpool.q_proj, q).reshape(q.shape[0], num_heads, -1)
    kh = _vlinear(unpool.k_proj, kv).reshape(kv.shape[0], num_heads, -1)
    vh = _vlinear(unpool.v_proj, kv).reshape(kv.shape[0], num_heads, -1)
    attn = jax.vmap(_dot_product_attention, in_axes=1, out_axes=1)(qh, kh, vh)
    return _vlinear(unpool.out_proj, attn.reshape(q.shape[0], -1))


def _broadcast(b, x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """pool -> AdaGN -> MLP -> AdaGN -> unpool (models/set_transformer.py:151-157)."""
    h = _attention_pool(b.pool, x)
    h = _ada_gn(b.norm_1, h, embed)
    h = _mlp(b.mlp, h)
    h = _ada_gn(b.norm_2, h, embed)
    return _multihead_attention(b.unpool, x, h)


def _layer(layer, x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """BroadcastingLayer forward, including the reference's quirk of
    computing mlp_norm then applying the MLP to the UN-normed stream
    (models/set_transformer.py:211-217)."""
    y = _ada_gn(layer.broadcast_norm, x, embed)
    x = x + _broadcast(layer.broadcast, y, embed)
    _ = _ada_gn(layer.mlp_norm, x, embed)  # computed then discarded, as in ref
    return x + _mlp(layer.mlp, x)


def ref_denoise_single(model, sigma, x: jnp.ndarray) -> jnp.ndarray:
    """Per-example preconditioned denoiser, reference call structure:
    EDM pre/post conditioning around UnconditionalPointNetwork
    (models/diffusion.py:220-251, models/ray.py:203-228). ``x: [N, D]``."""
    sched = model.schedule
    sigma = jnp.asarray(sigma, jnp.float32)
    c_in, c_out = sched.c_in(sigma), sched.c_out(sigma)
    c_skip, c_noise = sched.c_skip(sigma), sched.c_noise(sigma)

    net = model.network
    backbone = net.backbone

    h = _vlinear(net.xyz_embed, c_in * x)
    embed = c_noise.reshape(1)

    # python loop over unstacked layers (models/set_transformer.py:240-247)
    for i in range(backbone.n_layers):
        layer_i = jax.tree.map(lambda a: a[i], backbone.layers)
        h = _layer(layer_i, h, embed)

    normed = _group_norm_cf(h, net.output_norm_groups)
    out = _vlinear(net.output_proj, normed)
    return c_skip * x + c_out * out


def ref_denoise(model, sigma, x: jnp.ndarray) -> jnp.ndarray:
    """Batched entry: ``vmap`` of the per-example denoiser, like the
    reference's ``filter_vmap`` plumbing. ``sigma``: scalar or [B]."""
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), x.shape[:1])
    return jax.vmap(lambda s, xi: ref_denoise_single(model, s, xi))(sigma, x)


def ref_sample(
    model,
    key: jax.Array,
    shape: tuple,
    n_solver_steps: int = 128,
) -> jnp.ndarray:
    """Deterministic Heun probability-flow sampling, reference structure:
    fixed Karras grid, two evals per transition, vmapped per-example
    trajectories (models/diffusion.py:333-439). fp32 end to end."""
    sched = model.schedule
    sigmas = sched.solver_grid(n_solver_steps).astype(jnp.float32)

    def sample_one(k: jax.Array) -> jnp.ndarray:
        x = sigmas[0] * jax.random.normal(k, shape[1:], jnp.float32)

        def body(x, ss):
            s_cur, s_next = ss
            d = (x - ref_denoise_single(model, s_cur, x)) / s_cur
            x_e = x + (s_next - s_cur) * d
            d2 = (x_e - ref_denoise_single(model, s_next, x_e)) / s_next
            return x + (s_next - s_cur) * 0.5 * (d + d2), None

        x, _ = jax.lax.scan(body, x, (sigmas[:-1], sigmas[1:]))
        return x

    keys = jax.random.split(key, shape[0])
    samples_diff = jax.vmap(sample_one)(keys)
    return model.reparam.diffusion_to_data(samples_diff, None)
