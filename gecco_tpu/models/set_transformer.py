"""Induced set attention transformer, batched and scan-compiled.

The reference implements this twice: per-example equinox modules
(gecco-jax/src/gecco_jax/models/set_transformer.py:17-249) and batched torch
modules with an inducer-state cache for upsampling
(gecco-torch/src/gecco_torch/models/set_transformer.py:14-217). This is the
union, TPU-first:

- batched ``[B, N, C]`` throughout; fused kv projection (torch style) so the
  big N-token matmuls hit the MXU in one pass;
- attention is only ever rectangular: pool (I x N) and unpool (N x I), with
  I ~ 64 inducers — O(N·I), never O(N^2) (SURVEY.md §5.7);
- layers are *stacked* and iterated with ``jax.lax.scan`` so compile time and
  HLO size are depth-independent;
- the inducer-state cache (``h``) used by the completion/upsampling sampler is
  threaded through the scan (torch set_transformer.py:92-117,198-216);
- activations run in ``compute_dtype`` (bf16 by default on TPU) with fp32
  softmax/norm statistics and fp32 master weights.

Skip-connection output projections are scaled by 0.1 at init
(torch set_transformer.py:150-153).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from gecco_tpu.models.activation import GaussianActivation
from gecco_tpu.models.mlp import MLP
from gecco_tpu.models.normalization import AdaGN
from gecco_tpu.ops.attention import (
    pool_attention_folded,
    rect_attention,
    unpool_attention_folded,
)
from gecco_tpu.utils import Linear, module, static, splitter, stack_modules

__all__ = ["AttentionPool", "Unpool", "Broadcast", "BroadcastingLayer", "SetTransformer"]


def _fold_mlp_operands(mlp: MLP, dt) -> tuple:
    """Pre-fold the Gaussian activation's alpha (and the normalized-activation
    affine) into a 2-layer MLP's weights — the operand convention shared by
    ``fused_mlp_residual`` and ``fused_h_side``: returns
    ``(w1t [C, W] dt, b1 [1, W] fp32, w2t [W, C] dt, b2 [1, C] fp32)``."""
    w1, w2 = mlp.layers
    act = mlp.activation
    alpha = act.alpha.astype(jnp.float32)
    w1t = (w1.weight.astype(jnp.float32) / alpha).T.astype(dt)
    b1 = (w1.bias.astype(jnp.float32) / alpha)[None]  # [1, W]
    w2t = w2.weight.astype(jnp.float32).T  # [W, C]
    b2 = w2.bias.astype(jnp.float32)[None]  # [1, C]
    if act.normalized:
        # fold (g - 0.7) / 0.28 into the second projection
        b2 = b2 - (0.7 / 0.28) * w2t.sum(axis=0, keepdims=True)
        w2t = w2t / 0.28
    return w1t, b1, w2t.astype(dt), b2


def _mlp_fusable(mlp: MLP, key) -> bool:
    """Whether a given MLP matches the fused-kernel operand convention."""
    return (
        len(mlp.layers) == 2
        and isinstance(mlp.activation, GaussianActivation)
        and (key is None or mlp.dropout_p == 0.0)
        # the fused kernels fold alpha into both biases — bias-free Linears
        # degrade to the unfused path instead of crashing
        and all(l.bias is not None for l in mlp.layers)
    )


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    # [B, N, C] -> [B, H, N, C/H]
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    # [B, H, N, D] -> [B, N, H*D]
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


@module
class AttentionPool:
    """Cross-attention from learnable inducer queries to the input set.

    jax ref: models/set_transformer.py:17-102; torch ref: :14-65 (fused kv).
    """

    inducers: jax.Array  # [H, I, D] learnable queries, N(0, 1) init
    kv_proj: Linear  # C -> 2C, no bias
    out_proj: Linear  # C -> C, no bias
    num_heads: int = static()

    @classmethod
    def init(
        cls, key: jax.Array, feature_dim: int, num_heads: int, num_inducers: int
    ) -> "AttentionPool":
        assert feature_dim % num_heads == 0, (feature_dim, num_heads)
        ikey, kvkey, okey = jax.random.split(key, 3)
        inducers = jax.random.normal(
            ikey, (num_heads, num_inducers, feature_dim // num_heads)
        )
        return cls(
            inducers=inducers,
            kv_proj=Linear.init(kvkey, feature_dim, 2 * feature_dim, use_bias=False),
            out_proj=Linear.init(okey, feature_dim, feature_dim, use_bias=False),
            num_heads=num_heads,
        )

    def __call__(self, kv: jnp.ndarray, attn_impl: str = "xla") -> jnp.ndarray:
        # kv: [B, N, C] -> [B, I, C]
        if attn_impl in ("folded", "folded_pallas"):
            # head projections folded into MXU-wide matmuls (ops/attention.py)
            return pool_attention_folded(
                kv,
                self.inducers,
                self.kv_proj.weight,
                self.out_proj.weight,
                self.num_heads,
                impl="pallas" if attn_impl == "folded_pallas" else "xla",
            )
        k, v = jnp.split(self.kv_proj(kv), 2, axis=-1)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        q = jnp.broadcast_to(
            self.inducers.astype(kv.dtype)[None],
            (kv.shape[0], *self.inducers.shape),
        )
        attn = rect_attention(q, k, v, impl=attn_impl)
        return self.out_proj(_merge_heads(attn))


@module
class Unpool:
    """Standard multi-head cross-attention: set queries against inducer
    keys/values (jax ref uses eqx.nn.MultiheadAttention, no biases;
    models/set_transformer.py:144-157)."""

    q_proj: Linear
    k_proj: Linear
    v_proj: Linear
    out_proj: Linear
    num_heads: int = static()

    @classmethod
    def init(cls, key: jax.Array, feature_dim: int, num_heads: int) -> "Unpool":
        assert feature_dim % num_heads == 0
        keys = splitter(key)
        mk = lambda: Linear.init(next(keys), feature_dim, feature_dim, use_bias=False)
        return cls(
            q_proj=mk(), k_proj=mk(), v_proj=mk(), out_proj=mk(), num_heads=num_heads
        )

    def __call__(
        self, x: jnp.ndarray, h: jnp.ndarray, attn_impl: str = "xla"
    ) -> jnp.ndarray:
        # x: [B, N, C] queries, h: [B, I, C] keys/values -> [B, N, C]
        if attn_impl in ("folded", "folded_pallas"):
            return unpool_attention_folded(
                x,
                h,
                self.q_proj.weight,
                self.k_proj.weight,
                self.v_proj.weight,
                self.out_proj.weight,
                self.num_heads,
                impl="pallas" if attn_impl == "folded_pallas" else "xla",
            )
        q = _split_heads(self.q_proj(x), self.num_heads)
        k = _split_heads(self.k_proj(h), self.num_heads)
        v = _split_heads(self.v_proj(h), self.num_heads)
        attn = rect_attention(q, k, v, impl=attn_impl)
        return self.out_proj(_merge_heads(attn))


@module
class Broadcast:
    """pool -> AdaGN -> MLP -> AdaGN -> unpool (jax ref
    models/set_transformer.py:105-157). When an inducer state ``h`` is given,
    the pool side is skipped entirely — the mechanism behind cached
    upsampling (torch set_transformer.py:92-117)."""

    pool: AttentionPool
    norm_1: AdaGN
    mlp: MLP
    norm_2: AdaGN
    unpool: Unpool

    @classmethod
    def init(
        cls,
        key: jax.Array,
        feature_dim: int,
        num_inducers: int,
        embed_dim: int,
        num_heads: int = 8,
        mlp_blowup: int = 2,
        activation: Any = None,
    ) -> "Broadcast":
        keys = splitter(key)
        return cls(
            pool=AttentionPool.init(next(keys), feature_dim, num_heads, num_inducers),
            norm_1=AdaGN.init(next(keys), feature_dim, embed_dim),
            mlp=MLP.init(
                next(keys),
                feature_dim,
                feature_dim,
                width_size=mlp_blowup * feature_dim,
                depth=1,
                activation=activation or GaussianActivation.init(),
            ),
            norm_2=AdaGN.init(next(keys), feature_dim, embed_dim),
            unpool=Unpool.init(next(keys), feature_dim, num_heads),
        )

    def __call__(
        self,
        x: jnp.ndarray,
        embed: jnp.ndarray,
        h: Optional[jnp.ndarray] = None,
        attn_impl: str = "xla",
        key: Optional[jax.Array] = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        if h is None:
            h = self.pool(x, attn_impl=attn_impl)
            h = self.norm_1(h, embed)
            h = self.mlp(h, key=key)
            h = self.norm_2(h, embed)
        return self.unpool(x, h, attn_impl=attn_impl), h


@module
class BroadcastingLayer:
    """Pre-norm residual transformer layer built on Broadcast
    (jax ref models/set_transformer.py:160-217)."""

    broadcast_norm: AdaGN
    broadcast: Broadcast
    mlp_norm: AdaGN
    mlp: MLP

    @classmethod
    def init(
        cls,
        key: jax.Array,
        feature_dim: int,
        num_inducers: int,
        embed_dim: int,
        num_heads: int = 8,
        mlp_blowup: int = 2,
        activation: Any = None,
        skip_scale: float = 0.1,
    ) -> "BroadcastingLayer":
        keys = splitter(key)
        broadcast = Broadcast.init(
            next(keys),
            feature_dim,
            num_inducers,
            embed_dim,
            num_heads=num_heads,
            mlp_blowup=mlp_blowup,
            activation=activation,
        )
        mlp = MLP.init(
            next(keys),
            feature_dim,
            feature_dim,
            width_size=mlp_blowup * feature_dim,
            depth=1,
            activation=activation or GaussianActivation.init(),
        )
        if skip_scale != 1.0:
            # damp the residual branches at init (torch ref :150-153)
            broadcast = broadcast.replace(
                unpool=broadcast.unpool.replace(
                    out_proj=broadcast.unpool.out_proj.replace(
                        weight=broadcast.unpool.out_proj.weight * skip_scale
                    )
                )
            )
            out = mlp.layers[-1]
            mlp = mlp.replace(
                layers=mlp.layers[:-1] + (out.replace(weight=out.weight * skip_scale),)
            )
        norm = lambda: AdaGN.init(next(keys), feature_dim, embed_dim)
        return cls(broadcast_norm=norm(), broadcast=broadcast, mlp_norm=norm(), mlp=mlp)

    def __call__(
        self,
        x: jnp.ndarray,
        embed: jnp.ndarray,
        h: Optional[jnp.ndarray] = None,
        attn_impl: str = "xla",
        key: Optional[jax.Array] = None,
        mlp_on_unnormed: bool = False,
        in_sums: Optional[jnp.ndarray] = None,
        with_sums: bool = False,
        kv: Optional[tuple] = None,
    ):
        """``in_sums``/``with_sums`` thread the free-statistics chain of the
        fused path: ``in_sums`` is the [B, 2, C] channel sums of ``x`` (so
        the pool pre-norm needs no stats pass over the stream) and
        ``with_sums=True`` additionally returns the sums of the layer's
        output (emitted by the fused MLP kernel) for the next layer.
        ``kv`` (cached path only): precomputed unpool (k, v) so the caller
        can hoist the per-layer h @ W projections out of its scan."""
        bkey, mkey = (None, None) if key is None else jax.random.split(key)
        if attn_impl == "folded_pallas":
            out = self._fused_call(
                x, embed, h, bkey, mkey, mlp_on_unnormed, in_sums, with_sums,
                kv,
            )
            return out if with_sums else out[:2]
        y = self.broadcast_norm(x, embed)
        x_b, h = self.broadcast(y, embed, h=h, attn_impl=attn_impl, key=bkey)
        x = x + x_b
        y = self.mlp_norm(x, embed)
        # gecco-jax applies the second MLP to the *un-normed* residual stream
        # (its mlp_norm output is computed then discarded,
        # models/set_transformer.py:216-217); gecco-torch — and we, by
        # default — use the normed stream. ``mlp_on_unnormed=True``
        # reproduces the jax behavior bit-for-bit for checkpoint parity.
        x = x + self.mlp(x if mlp_on_unnormed else y, key=mkey)
        return (x, h, None) if with_sums else (x, h)

    def _fused_call(
        self,
        x: jnp.ndarray,
        embed: jnp.ndarray,
        h: Optional[jnp.ndarray],
        bkey: Optional[jax.Array],
        mkey: Optional[jax.Array],
        mlp_on_unnormed: bool,
        in_sums: Optional[jnp.ndarray] = None,
        with_sums: bool = False,
        kv: Optional[tuple] = None,
    ):
        """The whole layer through the three fused Pallas megakernels
        (ops/pallas/folded_attention.py): pool+pre-norm, unpool+pre-norm+
        residual+output-stats, pre-norm+MLP+residual. Same function as the
        plain path — an execution strategy, not an architecture change."""
        from gecco_tpu.ops.pallas.folded_attention import (
            folded_pool_layer,
            folded_unpool,
            fused_mlp_residual,
            group_indicator,
            pool_vmem_ok,
        )

        b, n, c = x.shape
        dt = x.dtype
        bc = self.broadcast
        num_heads = bc.unpool.num_heads
        inducers = bc.pool.inducers  # [H, I, D]
        n_ind = inducers.shape[1]
        embed_f = embed.astype(jnp.float32)

        if h is None:
            ind2 = inducers.reshape(num_heads * n_ind, c // num_heads).astype(dt)
            kvw = bc.pool.kv_proj.weight.astype(dt)
            wo_p = bc.pool.out_proj.weight.astype(dt)
            if in_sums is not None:
                # free-statistics chain: the previous layer's MLP kernel (or
                # the one-time XLA pass before the scan) already emitted the
                # channel sums of x — no stats pass over the stream at all,
                # and the tiled kernel has no VMEM gate
                from gecco_tpu.ops.pallas.folded_attention import folded_pool_ext

                se1, be1 = self.broadcast_norm.scale_bias_from_sums(
                    in_sums, n, embed
                )
                h0 = folded_pool_ext(x, se1, be1, ind2, kvw, wo_p, num_heads)
            else:
                scale1 = self.broadcast_norm.scale_linear(embed_f)  # [B, C]
                bias1 = self.broadcast_norm.bias_linear(embed_f)
                # the resident kernel (stats in-kernel, single pass) serves
                # sums-less inference; training (a network key is threaded)
                # and VMEM-exceeding point counts (the 8k config) route
                # through the tiled online-softmax kernel with XLA stats —
                # its custom_vjp backward reuses the saved softmax statistics
                # instead of the resident path's forward recompute
                use_ext = (bkey is not None) or not pool_vmem_ok(
                    n, c, num_heads * n_ind, jnp.dtype(dt).itemsize
                )
                if not use_ext:
                    h0, mean_c, inv_c = folded_pool_layer(
                        x, scale1, bias1, ind2, kvw, wo_p,
                        group_indicator(c, self.broadcast_norm.num_groups),
                        num_heads, True,
                    )
                else:
                    from gecco_tpu.ops.norms import group_norm_stats
                    from gecco_tpu.ops.pallas.folded_attention import (
                        folded_pool_ext,
                    )

                    mean_c, inv_c = group_norm_stats(
                        x, num_groups=self.broadcast_norm.num_groups
                    )
                    h0 = folded_pool_ext(
                        x, scale1 * inv_c, bias1 - mean_c * (scale1 * inv_c),
                        ind2, kvw, wo_p, num_heads,
                    )
                se1 = scale1 * inv_c
                be1 = bias1 - mean_c * se1
            hside_fusable = (
                _mlp_fusable(bc.mlp, bkey)
                and isinstance(bc.norm_1, AdaGN)
                and isinstance(bc.norm_2, AdaGN)
                and bc.norm_1.num_groups == bc.norm_2.num_groups
            )
            if hside_fusable:
                # norm_1 -> MLP -> norm_2 -> k/v projections as ONE Pallas
                # program on the [B, I, C] inducer tokens (ops/pallas/hside.py)
                # — at XLA level this chain is pure dispatch latency
                from gecco_tpu.ops.pallas.hside import fused_h_side

                w1t_h, b1_h, w2t_h, b2_h = _fold_mlp_operands(bc.mlp, dt)
                h, k, v = fused_h_side(
                    h0,
                    bc.norm_1.scale_linear(embed_f),
                    bc.norm_1.bias_linear(embed_f),
                    bc.norm_2.scale_linear(embed_f),
                    bc.norm_2.bias_linear(embed_f),
                    group_indicator(c, bc.norm_1.num_groups),
                    w1t_h, b1_h, w2t_h, b2_h,
                    bc.unpool.k_proj.weight.astype(dt),
                    bc.unpool.v_proj.weight.astype(dt),
                )
            else:
                hh = bc.norm_1(h0, embed)
                hh = bc.mlp(hh, key=bkey)
                h = bc.norm_2(hh, embed)
                k = v = None
        else:
            # cached-upsampling eval: the stats chain applies here too —
            # x is the new-point stream, whose sums the previous layer's
            # MLP kernel emitted (or the caller seeded analytically)
            if in_sums is not None:
                se1, be1 = self.broadcast_norm.scale_bias_from_sums(
                    in_sums, n, embed
                )
            else:
                se1, be1 = self.broadcast_norm.effective_scale_bias(x, embed)
            k, v = kv if kv is not None else (None, None)

        if k is None:
            hd = h.astype(dt)
            k = hd @ bc.unpool.k_proj.weight.astype(dt).T
            v = hd @ bc.unpool.v_proj.weight.astype(dt).T

        mlp_ok = _mlp_fusable(self.mlp, mkey)
        if mlp_ok and not mlp_on_unnormed and isinstance(self.mlp_norm, AdaGN):
            w1t, b1, w2t, b2 = _fold_mlp_operands(self.mlp, dt)
            from gecco_tpu.ops.pallas.folded_attention import (
                fused_unpool_mlp,
                unpool_mlp_vmem_ok,
            )

            # OPT-IN (GECCO_UNPOOL_MLP_MEGAKERNEL=1): unpool + mlp_norm +
            # MLP as ONE two-pass megakernel with the intermediate stream in
            # VMEM scratch. Measured SLOWER than the separate kernels on the
            # axon v5e (18.3 vs 17.3 ms/eval): XLA's memory-space assignment
            # already keeps the [B, N, C] layer-scan carry resident in VMEM
            # (the 100 MB stream fits the 128 MB VMEM), so the separate
            # kernels pay no HBM stream traffic either — and the
            # megakernel's ~7 MB scratch demand evicts that carry, adding a
            # VMEM<->HBM copy per layer. Kept as an execution strategy for
            # devices where the stream exceeds VMEM minus scratch headroom.
            if (
                os.environ.get("GECCO_UNPOOL_MLP_MEGAKERNEL") == "1"
                and bkey is None
                and mkey is None
                and unpool_mlp_vmem_ok(n, c, w1t.shape[-1], jnp.dtype(dt).itemsize)
            ):
                # tie only when the caller drops the sums (no stats
                # chain) — the tie's in-place form cannot alias at the layer
                # scan boundary and would cost a [B, N, C] copy per layer
                x, out_sums = fused_unpool_mlp(
                    x, se1, be1, k, v,
                    bc.unpool.q_proj.weight.astype(dt),
                    bc.unpool.out_proj.weight.astype(dt),
                    self.mlp_norm.scale_linear(embed_f),
                    self.mlp_norm.bias_linear(embed_f),
                    group_indicator(c, self.mlp_norm.num_groups),
                    w1t, b1, w2t, b2,
                    num_heads, self.mlp_norm.num_groups, n, not with_sums,
                )
                return x, h, out_sums

        x, sums = folded_unpool(
            x, se1, be1, k, v,
            bc.unpool.q_proj.weight.astype(dt),
            bc.unpool.out_proj.weight.astype(dt),
            num_heads, True, True,
        )

        if not mlp_ok:
            y2 = x if mlp_on_unnormed else self.mlp_norm(x, embed)
            return x + self.mlp(y2, key=mkey), h, None

        if mlp_on_unnormed:
            se2 = jnp.ones((b, c), jnp.float32)
            be2 = jnp.zeros((b, c), jnp.float32)
        else:
            se2, be2 = self.mlp_norm.scale_bias_from_sums(sums, n, embed)

        w1t, b1, w2t, b2 = _fold_mlp_operands(self.mlp, dt)
        x, out_sums = fused_mlp_residual(x, se2, be2, w1t, b1, w2t, b2)
        return x, h, out_sums


@module
class SetTransformer:
    """A stack of broadcasting layers iterated with ``lax.scan``.

    jax ref models/set_transformer.py:220-249 (python loop over modules);
    torch ref set_transformer.py:171-216 (cache plumbing).

    ``__call__(features [B,N,C], embed [B,E])`` returns ``[B,N,C]``; pass
    ``return_h=True`` to also get stacked inducer states ``[L,B,I,C]``, or
    ``hs=...`` to reuse them (pool side skipped — cached upsampling).
    """

    layers: BroadcastingLayer  # leaf arrays stacked with leading [L] axis
    n_layers: int = static()
    compute_dtype: Any = static(default=jnp.bfloat16)
    attn_impl: str = static(default="xla")
    # rematerialise each layer in the backward pass (jax.checkpoint): trades
    # ~1/3 extra forward FLOPs for O(1)-in-depth activation memory — needed
    # to train the flagship config at batch 48 within a v5e's 16 GB HBM
    remat: bool = static(default=False)
    # reproduce gecco-jax's second-MLP-on-unnormed-stream quirk (see
    # BroadcastingLayer.__call__) — set True when loading converted reference
    # checkpoints so the forward function matches theirs exactly
    ref_jax_compat: bool = static(default=False)

    @classmethod
    def init(
        cls,
        key: jax.Array,
        n_layers: int,
        feature_dim: int,
        num_inducers: int,
        embed_dim: int,
        num_heads: int = 8,
        mlp_blowup: int = 2,
        activation: Any = None,
        skip_scale: float = 0.1,
        compute_dtype: Any = jnp.bfloat16,
        attn_impl: str = "xla",
        remat: bool = False,
        ref_jax_compat: bool = False,
    ) -> "SetTransformer":
        keys = jax.random.split(key, n_layers)
        layers = [
            BroadcastingLayer.init(
                k,
                feature_dim,
                num_inducers,
                embed_dim,
                num_heads=num_heads,
                mlp_blowup=mlp_blowup,
                activation=activation,
                skip_scale=skip_scale,
            )
            for k in keys
        ]
        return cls(
            layers=stack_modules(layers),
            n_layers=n_layers,
            compute_dtype=compute_dtype,
            attn_impl=attn_impl,
            remat=remat,
            ref_jax_compat=ref_jax_compat,
        )

    def __call__(
        self,
        features: jnp.ndarray,
        embed: jnp.ndarray,
        hs: Optional[jnp.ndarray] = None,
        return_h: bool = False,
        key: Optional[jax.Array] = None,
        in_sums: Optional[jnp.ndarray] = None,
        with_sums: bool = False,
    ):
        """``in_sums`` (optional ``[B, 2, C]`` fp32): channel sums (s1, s2
        over tokens) of ``features`` — lets the caller start the
        free-statistics chain without the one-time XLA stats pass over the
        [B, N, C] stream (the wrappers derive them analytically from the
        [B, N, 3] second moments of the raw points). ``with_sums=True``
        additionally returns the OUTPUT's channel sums (or None off the
        fused chain) so the caller's head norm is also stats-pass-free."""
        in_dtype = features.dtype
        x = features.astype(self.compute_dtype)
        embed = embed.astype(self.compute_dtype)
        impl = self.attn_impl

        unnormed = self.ref_jax_compat
        # free-statistics chain (fused path): every layer's pool pre-norm
        # consumes the channel sums of its input, emitted by the previous
        # layer's fused MLP kernel — only layer 0's sums cost an XLA pass.
        # The sums ride the scan carry next to the stream itself.
        chain_sums = impl == "folded_pallas" and _mlp_fusable(
            self.layers.mlp, key
        ) and all(
            isinstance(nrm, AdaGN)
            for nrm in (
                self.layers.broadcast_norm,
                self.layers.mlp_norm,
                self.layers.broadcast.norm_1,
                self.layers.broadcast.norm_2,
            )
        ) and _mlp_fusable(self.layers.broadcast.mlp, key)

        if hs is None:
            if chain_sums:
                if in_sums is not None:
                    sums0 = in_sums.astype(jnp.float32)
                else:
                    xf = x.astype(jnp.float32)
                    sums0 = jnp.stack(
                        [xf.sum(axis=1), (xf * xf).sum(axis=1)], axis=1
                    )
                carry0 = (x, sums0)
            else:
                carry0 = x

            def call_layer(carry, layer, k):
                if chain_sums:
                    xc, in_sums = carry
                    xc, h, out_sums = layer(
                        xc, embed, attn_impl=impl, key=k,
                        mlp_on_unnormed=unnormed, in_sums=in_sums,
                        with_sums=True,
                    )
                    return (xc, out_sums), h
                xc, h = layer(
                    carry, embed, attn_impl=impl, key=k, mlp_on_unnormed=unnormed
                )
                return xc, h

            if key is not None:
                # one dropout key per layer, threaded as a scanned input
                layer_keys = jax.random.split(key, self.n_layers)

                def body(carry, layer_and_key):
                    layer, k = layer_and_key
                    carry, h = call_layer(carry, layer, k)
                    return carry, (h if return_h else None)

                xs = (self.layers, layer_keys)
            else:

                def body(carry, layer):
                    carry, h = call_layer(carry, layer, None)
                    return carry, (h if return_h else None)

                xs = self.layers

            if self.remat:
                body = jax.checkpoint(body)
            carry, stored = jax.lax.scan(body, carry0, xs)
            if chain_sums:
                x, out_sums = carry
            else:
                x, out_sums = carry, None
        else:
            if impl == "folded_pallas":
                # hoist the per-layer unpool k/v projections out of the scan:
                # two batched einsums over all L cached inducer states instead
                # of 2L sequential [B, I, C] x [C, C] matmuls (each a ~0.44 ms
                # dispatch on the axon relay)
                hd = hs.astype(x.dtype)  # [L, B, I, C]
                kw = self.layers.broadcast.unpool.k_proj.weight.astype(x.dtype)
                vw = self.layers.broadcast.unpool.v_proj.weight.astype(x.dtype)
                ks = jnp.einsum("lbic,ldc->lbid", hd, kw)
                vs = jnp.einsum("lbic,ldc->lbid", hd, vw)
            else:
                ks = vs = None

            def body_cached(carry, layer_h_kv):
                layer, h, k_l, v_l = layer_h_kv
                kv = None if k_l is None else (k_l, v_l)
                if chain_sums:
                    xc, s = carry
                    xc, _, s_out = layer(
                        xc, embed, h=h.astype(xc.dtype), attn_impl=impl,
                        mlp_on_unnormed=unnormed, in_sums=s, with_sums=True,
                        kv=kv,
                    )
                    return (xc, s_out), None
                xc, _ = layer(
                    carry, embed, h=h.astype(carry.dtype), attn_impl=impl,
                    mlp_on_unnormed=unnormed, kv=kv,
                )
                return xc, None

            if chain_sums:
                if in_sums is not None:
                    sums0 = in_sums.astype(jnp.float32)
                else:
                    xf = x.astype(jnp.float32)
                    sums0 = jnp.stack(
                        [xf.sum(axis=1), (xf * xf).sum(axis=1)], axis=1
                    )
                carry0 = (x, sums0)
            else:
                carry0 = x
            carry, stored = jax.lax.scan(
                body_cached, carry0, (self.layers, hs, ks, vs)
            )
            x = carry[0] if chain_sums else carry
            stored = hs if return_h else None
            out_sums = carry[1] if chain_sums else None

        x = x.astype(in_dtype)
        if with_sums:
            return (x, stored, out_sums) if return_h else (x, out_sums)
        if return_h:
            return x, stored
        return x
