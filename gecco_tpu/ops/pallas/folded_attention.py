"""Pallas megakernels for folded-projection induced set attention.

The folded formulation (gecco_tpu/ops/attention.py) turns per-head
[64 x 48 x 2048] matmuls into MXU-wide [N, C] x [C, H*I] shapes; measured
rooflines on the axon v5e relay (~120 TFLOP/s bf16, ~206 GB/s HBM — about a
quarter of nominal chip specs) make BOTH matmul shape and HBM traffic
first-order, so these kernels fuse the entire per-point compute of a
BroadcastingLayer into three Pallas programs that read/write the [B, N, C]
stream the minimum number of times:

- ``folded_pool_layer`` — one grid step per batch element holds the full
  [N, C] set in VMEM (softmax is over the point axis: untileable), and:
  computes the set-level GroupNorm statistics in-kernel (group folding via a
  [C, G] indicator matmul — Mosaic can't reshape to [C/G, G]); applies the
  AdaGN affine; folds the k-projection against the learnable inducer queries
  into a [C, H*I] operand in VMEM scratch (8 tiny [D, C] x [I, D] matmuls,
  one per head); runs logits -> softmax-over-N -> per-head pooling -> output
  projection; and returns the pooled [B, I, C] inducer tokens PLUS the
  norm statistics for reuse by the unpool (saves a full XLA stats pass).
- ``folded_unpool`` — tiles the point axis; applies the collapsed pre-norm
  ``x * se + be`` inline; folds q/out projections against the (tiny)
  inducer-state k/v into [C, J]/[J, C] VMEM scratch per batch element; runs
  logits -> blockwise softmax (static 64-wide column blocks — the only
  remnant of head structure) -> value matmul; adds the residual stream; and
  accumulates the s1/s2 channel sums of its OUTPUT across point tiles, so
  the next norm's statistics cost no extra HBM pass.
- ``fused_mlp_residual`` — ``x + W2 act(W1 (x * se + be) + b1) + b2`` with
  the Gaussian activation's alpha pre-folded into W1/b1 by the caller.
  Without this the [B, N, 2C] hidden round-trips ~400 MB of HBM per layer.

All are forward-only Pallas programs wrapped in ``custom_vjp`` whose
backward recomputes through an XLA twin (jax.vjp) — the same mathematical
function, so gradients are exact; the backward matmuls are already
MXU-shaped at the XLA level. Interpret mode off-TPU.

SPMD: wrapped in ``custom_partitioning`` (batch partitions freely; the point
axis partitions in the unpool/mlp forwards; the pool gathers points — its
softmax and statistics reduce over them). Replaces the reference's
``lax.pmean`` data parallelism (gecco-jax/models/diffusion.py:571-573).

Replaces: pre-norm + per-head vmap attention + MLP of the reference layer
(gecco-jax/src/gecco_jax/models/set_transformer.py:87-94,160-217).
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = [
    "folded_pool_layer",
    "folded_pool_ext",
    "folded_unpool",
    "fused_mlp_residual",
    "pool_vmem_ok",
    "pool_bwd_vmem_ok",
    "group_indicator",
]

_EPS = 1e-5

# GECCO_SOFTMAX_R4=1 opts into the round-4 softmax formulation (bmapt
# operand-broadcast max masks + narrow reciprocal-multiply) for inference
# experiments. Read ONCE at import: jit caches are not keyed on env vars,
# so a per-trace read could silently disagree with an earlier compile (and
# two reads within one trace could even disagree with each other).
_SOFTMAX_R4 = os.environ.get("GECCO_SOFTMAX_R4") == "1"

# GECCO_POOL_BWD forces the pool-ext backward body: "v1" is the round-4
# two-pass kernel (per-head lane-sliced e^T v accumulators + dp
# materialised in both passes), "v2" the mid-round-5 body (one full-width
# [J, C] e^T v matmul in pass 0, 1/sacc pre-folded into the placement
# matrix — same math, fewer VPU passes), "v2j" the v2 body taking 1/sacc
# as a [J, 1] column operand transposed in XLA instead of synthesising it
# with an eye(J) matmul — drops the 4·J² identity from the VMEM tally,
# "v3" the fold-everything body (e^T y accumulator; the value projection
# is never materialised — ~22% fewer executed FLOPs). Unset: v3 where its
# tally admits a tile, else v1 — measured r5e arms: v3 1.80 vs v2 2.30
# ms/layer flagship (TN=1024), 9.25 vs v1's 12.29 at the 8k shapes
# (TN=256); v2j thrashes at 8k (53.6 — its full-width pass-0 accumulator
# at TN=128 tiles). The v3 default passed the drifted-magnitude certifier
# AND a 3k-step trained-magnitude training segment (runs/r5f_*; the
# kernel-change policy in CLAUDE.md). Read once at import (see
# _SOFTMAX_R4).
_POOL_BWD_MODES = (None, "v1", "v2", "v2j", "v3")


def _parse_pool_bwd_env(value):
    value = value or None
    if value not in _POOL_BWD_MODES:
        print(
            f"[gecco_tpu] ignoring invalid GECCO_POOL_BWD={value!r} "
            f"(expected {'|'.join(m for m in _POOL_BWD_MODES if m)}); "
            "using the shape-gated default",
            file=sys.stderr,
        )
        return None
    return value


_POOL_BWD_ENV = _parse_pool_bwd_env(os.environ.get("GECCO_POOL_BWD"))


def _twin_bwd(which: str = "") -> bool:
    """Debug escape hatch: GECCO_TWIN_BWD routes fused-kernel backwards
    through their XLA twins (jax.vjp) instead of the backward Pallas
    kernels — for bisecting training-numerics issues. "1"/"all" switches
    every kernel; a comma-separated subset of {pool,unpool,mlp} switches
    just those."""
    import os

    val = os.environ.get("GECCO_TWIN_BWD", "")
    if val in ("1", "all"):
        return True
    return which in val.split(",")


def _spec_dim(sharding, i):
    spec = getattr(sharding, "spec", None)
    return spec[i] if spec is not None and i < len(spec) else None


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def group_indicator(c: int, num_groups: int) -> jnp.ndarray:
    """[C, G] 0/1 matrix mapping channels to their group — the in-kernel
    group-fold is a matmul with this (Mosaic cannot reshape [C] -> [G, C/G])."""
    ch = jnp.arange(c) // (c // num_groups)
    return (ch[:, None] == jnp.arange(num_groups)[None, :]).astype(jnp.float32)


def block_map(j: int, num_blocks: int) -> jnp.ndarray:
    """[J, B] 0/1 matrix mapping columns to their ``J // B``-wide block.

    Per-block softmax statistics are computed/expanded with matmuls against
    this instead of slicing + concatenating 64-wide lane blocks — Mosaic
    lane relayouts on wide concats measurably starve the MXU.
    """
    col = jnp.arange(j) // (j // num_blocks)
    return (col[:, None] == jnp.arange(num_blocks)[None, :]).astype(jnp.float32)


def _blockwise_softmax_lastaxis(s, block, bmap=None, return_active=False, bmapt=None):
    """Softmax over static ``block``-wide column blocks of a 2D fp32 array.

    With ``bmap`` ([J, num_blocks] indicator), the kernel-path formulation
    stabilises each block with ITS OWN maximum (full-width masked row
    reductions — no lane slicing), computes the per-block sums and their
    expansion back to J columns as one-hot matmuls on the MXU, and clamps
    the exp argument at -80 (inert: within a max-shifted block the clamped
    tail is < 2e-35 of the block mass). Slicing fallback without ``bmap``
    (interpret mode / odd shapes).

    Hard-won on the axon Mosaic toolchain, which (a) miscompiles 64-wide
    lane-slice max reductions in large kernel bodies — masked lanes leak
    garbage for specific layouts, NaN rows after ~5k flagship training
    steps — and (b) produces NaN from VPU exp on huge-negative arguments
    (~ -7e4).

    DO NOT replace the per-block maxima with one global row max (tried in
    round 3 for the ~3.5 us/batch-element the masked reductions cost): it
    is only exact while every block's logits sit within the clamp bound of
    the global max. Per-head logit scales drift apart during training;
    once a weak head's whole block falls > 80 below the strongest head's
    max, its probabilities flatten to uniform AND the softmax backward
    formula (which assumes unclamped exp) turns wrong precisely where the
    clamp binds — certified divergence of flagship training at ~1k steps
    (loss 0.97 -> 2.0; bisected via GECCO_TWIN_BWD arms, BASELINE.md
    round-3 notes).
    """
    nb = s.shape[-1] // block
    if not _SOFTMAX_R4:
        # DEFAULT: the round-3-certified softmax machinery — iota-compare
        # masked maxima and a direct full-width divide. The round-4
        # formulation (bmapt operand-broadcast max masks + narrow
        # reciprocal-multiply, ~0.3 ms/eval faster) is mathematically
        # identical and passes interpret-mode parity, but every round-4
        # flagship training run containing it diverged to NaN once trained
        # logit magnitudes drifted: step 2600 (chunked bodies + 2048-pt
        # unpool tile), step 4700 (unchunked + 2048-pt tile,
        # runs/r4b_flagship.log), step 11300 (unchunked + 1024-pt tile,
        # runs/r4b_flagship_tn1024.log — its 20k final eval scored
        # mmd=NaN). The tile size and the softmax formulation changed
        # together across those arms, so the culprit is NOT isolated to
        # one of the two — both were reverted. Round-3's formulation (this
        # default) ran 30k steps clean in round 3; its certification on
        # top of the round-4 kernel-body restructuring is round 5's job
        # (runs/r5_flagship.log). Same toolchain failure class as the
        # round-2 lane-slice reduction miscompile. GECCO_SOFTMAX_R4=1 opts
        # back in for inference experiments only.
        bmapt = None
    if bmap is not None:
        if bmapt is not None:
            # cheaper max machinery with the transposed block map as an
            # operand ([nb, J] 0/1 rows): per block, ONE masked full-width
            # reduction (mask row broadcast from the operand — no iota
            # build, no per-block compares); the per-row maxima are
            # gathered by narrow concat and expanded back to J columns
            # with a one-hot matmul on the MXU instead of nb VPU blends.
            # Exactly the same per-row per-block maxima as the path below.
            cols = []
            for q in range(nb):
                mrow = bmapt[q : q + 1, :]  # [1, J]
                mq = jnp.max(
                    jnp.where(mrow > 0.5, s, -3.0e38), axis=-1, keepdims=True
                )  # [TN, 1] full-width reduction — no lane slicing
                cols.append(mq)
            mnb = jnp.concatenate(cols, axis=-1)  # [TN, nb]
            mexp = jax.lax.dot_general(
                mnb, bmapt.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TN, J]
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // block
            mexp = jnp.full_like(s, -3.0e38)
            for q in range(nb):
                mask_q = col == q
                mq = jnp.max(
                    jnp.where(mask_q, s, -3.0e38), axis=-1, keepdims=True
                )  # [TN, 1] full-width reduction — no lane slicing
                mexp = jnp.where(mask_q, mq, mexp)
        e = jnp.exp(jnp.maximum(s - mexp, -80.0))
        sums = jax.lax.dot_general(
            e, bmap, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [TN, nb]
        if _SOFTMAX_R4:
            # reciprocal on the NARROW [TN, nb] sums, then expand and
            # multiply: a full-width [TN, J] fp32 divide is a multi-cycle
            # VPU op per element, the multiply is single-cycle. Opt-in:
            # part of the round-4 formulation that diverges in training
            # (see the max-path note above).
            rexp = jax.lax.dot_general(
                1.0 / sums, bmap, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = e * rexp
        else:
            sexp = jax.lax.dot_general(
                sums, bmap, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = e / sexp
        if return_active:
            # backward callers need the exact jacobian of the CLAMPED
            # forward: de/ds = e only where the clamp is inactive
            return p, (s - mexp > -80.0).astype(jnp.float32)
        return p
    outs = []
    for j in range(nb):
        blk = s[:, j * block : (j + 1) * block]
        m = jnp.max(blk, axis=-1, keepdims=True)
        p = jnp.exp(blk - m)
        outs.append(p / jnp.sum(p, axis=-1, keepdims=True))
    p = jnp.concatenate(outs, axis=-1)
    return (p, jnp.ones_like(p)) if return_active else p


# Naive-liveness VMEM budget for the point-tile chooser. Calibrated against
# Mosaic's measured stack allocation on this toolchain: the stack allocator
# realises ~0.55-0.65x of the naive "every named intermediate live at once"
# tally for these kernel bodies (measured: unpool fwd at C=768/J=1024/TN=1024
# tallies 30.2 MB naive and Mosaic reports 16.85 MB; the flagship MLP
# backward tallies 22.4 MB naive and fits the 16 MB scoped limit). 26 MB
# naive ≈ 15 MB realised keeps ~1 MB of headroom.
_VMEM_NAIVE_BUDGET = 26 * 1024 * 1024

# Widened per-kernel Mosaic scoped-VMEM window (vmem_limit_bytes) for
# kernels whose tile-independent fp32 accumulators exceed the default 16 MB
# window at scaled widths AND whose activation stream is HBM-resident
# anyway (nothing VMEM-parked to evict). Naive-tally ceiling for using it:
# realised ~0.6x naive must stay under the window.
_VMEM_WIDE_LIMIT = 110 * 1024 * 1024
_VMEM_WIDE_NAIVE_CEILING = 160 * 1024 * 1024

# Mosaic's default per-kernel scoped-VMEM window. Kernels whose naive tally
# exceeds this may still compile (the realised stack is ~0.55-0.9x naive)
# but are at the mercy of program-level layout assignment — widen the
# window explicitly instead of relying on the slack.
_VMEM_SCOPED_DEFAULT = 16 * 1024 * 1024


def _kernel_compiler_params(naive_bytes, semantics=("parallel", "arbitrary")):
    """CompilerParams with a scoped-VMEM window sized for the kernel.

    Mosaic's default window is 16 MB. The realised stack is usually
    0.55-0.9x the naive liveness tally but can exceed it slightly (8k
    unpool: 23.55 MiB realised vs 23.44 naive), and a kernel that merely
    *happens* to fit the default window can OOM when the surrounding
    program's layout assignment changes (flagship unpool: fit at batch 64,
    OOMed at batch 192). So: whenever the naive tally exceeds the default
    window, declare a window of 1.3x the tally explicitly."""
    if naive_bytes > _VMEM_SCOPED_DEFAULT:
        return pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=min(_VMEM_WIDE_LIMIT, int(naive_bytes * 1.3)),
        )
    return pltpu.CompilerParams(dimension_semantics=semantics)


def _pick_tile_n(
    n: int, row_bytes: int = None, fixed_bytes: int = 0, cap: int = 1024
) -> int:
    """Largest point tile (<= cap, dividing n) whose naive VMEM estimate
    fits the budget: ``tn * row_bytes + fixed_bytes``. ``row_bytes`` is the
    caller's per-point byte tally over the simultaneously-live [TN, *]
    intermediates; ``fixed_bytes`` covers weights/scratch/accumulators whose
    size is tile-independent. With no estimate, returns the largest dividing
    tile (<= cap). If no dividing tile fits, returns the smallest dividing
    candidate — callers that can fall back to an XLA twin should gate with
    ``_tile_fits`` first."""
    fallback = None
    for tn in (2048, 1024, 512, 256, 128):
        if tn > cap or n % tn:
            continue
        fallback = tn
        if row_bytes is None or tn * row_bytes + fixed_bytes <= _VMEM_NAIVE_BUDGET:
            return tn
    return fallback if fallback is not None else n


def _pipeline_chunks(default: int, tn: int) -> int:
    """Software-pipeline chunk count for a tile body. GECCO_PIPELINE_CHUNKS
    overrides the default everywhere (must divide the tile or it is ignored
    with a stderr note). The default is 1 — unchunked: the 4/8-way chunked
    bodies win ~6% on the sampler at 2048-point tiles but miscompile on the
    axon Mosaic toolchain once trained logit magnitudes drift (flagship
    training NaN at step 2600, clean unchunked; BASELINE.md round 4). The
    knob exists to A/B the pipelined bodies on TPU without retracing."""
    v = os.environ.get("GECCO_PIPELINE_CHUNKS")
    if not v:
        return default
    try:
        cv = int(v)
    except ValueError:
        cv = -1
    if cv <= 0 or tn % cv != 0:
        print(
            f"[gecco_tpu] ignoring invalid GECCO_PIPELINE_CHUNKS={v!r} "
            f"(need a positive divisor of tile {tn}); using {default}",
            file=sys.stderr,
        )
        return default
    if cv != default:
        print(
            f"[gecco_tpu] GECCO_PIPELINE_CHUNKS={cv} overrides the "
            f"shape-derived chunk count {default} (tile {tn})",
            file=sys.stderr,
        )
    return cv


def _tn_env(name: str, tn: int, n: int) -> int:
    """Experiment knob: GECCO_TN_<NAME> overrides a forward kernel's point
    tile (must divide n; VMEM budget is the caller's problem). Perf
    bisection only — defaults are untouched when unset. Malformed or
    non-dividing values are ignored (with a stderr note) rather than
    crashing the forward pass; a warning is also printed when an override
    IS active, so a stale env var can't silently skew a benchmark or
    trigger an opaque Mosaic VMEM OOM."""
    v = os.environ.get(f"GECCO_TN_{name}")
    if not v:
        return tn
    try:
        tv = int(v)
    except ValueError:
        tv = -1
    if tv <= 0 or n % tv != 0:
        print(
            f"[gecco_tpu] ignoring invalid GECCO_TN_{name}={v!r} "
            f"(need a positive divisor of n={n}); using default tile {tn}",
            file=sys.stderr,
        )
        return tn
    if tv != tn:
        print(
            f"[gecco_tpu] GECCO_TN_{name}={tv} overrides the budget-chosen "
            f"tile {tn} — VMEM fit is now unchecked",
            file=sys.stderr,
        )
    return tv


def _tile_fits(n: int, row_bytes: int, fixed_bytes: int = 0, cap: int = 1024) -> bool:
    """Whether the kernel fits VMEM at the tile ``_pick_tile_n`` would pick."""
    tn = _pick_tile_n(n, row_bytes, fixed_bytes, cap)
    return tn * row_bytes + fixed_bytes <= _VMEM_NAIVE_BUDGET


# Per-kernel naive byte tallies for the tile chooser (C = feature width,
# J = heads x inducers, D = head dim, W = MLP hidden width). Coefficients
# count the simultaneously-live [TN, C]-rows (bf16 in/out blocks, fp32
# transients) and [TN, J]/[TN, W] softmax or activation planes per point;
# fixed terms count weights, identity matrices, scratch, and fp32
# weight-gradient accumulator blocks.

def _pool_ext_row_bytes(c, j):
    return 12 * c + 10 * j  # x/y/v/out rows + s/e/e_b planes


def _pool_ext_fixed_bytes(c, j, d):
    return 8 * c * c + 2 * c * j + 4 * j * j + 4 * j * d  # kvw/wo, qf, eye(j), pacc


def _pool_ext_wfold_row_bytes(c, j):
    return 8 * c + 10 * j  # x/y rows + s/e/e_b planes (no v stream)


def _pool_ext_wfold_fixed_bytes(c, j, num_heads):
    # wf bf16 [H*C, C] + qf + eye(j) + uacc fp32 [J, C]
    return 2 * num_heads * c * c + 2 * c * j + 4 * j * j + 4 * j * c


def _pool_ext_bwd_row_bytes(c, j, v1=False):
    if v1:
        return 16 * c + 22 * j  # recompute rows + dp/p/ds planes (two passes)
    return 16 * c + 18 * j  # v2: no per-tile p plane (inv_s pre-folded)


def _pool_ext_bwd_fixed_bytes(c, j, d, v1=False, v2j=False):
    # qf/kvw/wo/eyec bf16 + eyej fp32 + dm/pacc scratch + dqf/dwv/dwo fp32;
    # v2's pacc is the full-width [J, C] e^T v accumulator. v2j replaces
    # eyej (4·j²) and the dead eyec (2·c²) with a [J, 1] 1/sacc column.
    pacc = 4 * j * d if v1 else 4 * j * c
    base = 10 * c * c + 2 * c * j + 4 * j * j + 2 * j * c + pacc \
        + 4 * c * j + 8 * c * c
    if v2j:
        base -= 4 * j * j + 2 * c * c - 4 * j
    return base


def _pool_bwd_mode(n, c, j, d):
    """Which pool-ext backward body serves this shape. GECCO_POOL_BWD
    forces a body; unset, the default is v3 wherever its VMEM tally
    admits a tile (v3's fixed bytes are strictly below v2's — the 4·J·C
    folded operands replace the 4·J² identity and the dead 2·C² eyec —
    so v3 fits everywhere v2 did, including the 8k config that gated v2
    off), else the round-4 v1 body whose [J, D] accumulator is the
    smallest. Measured (r5e arms, batch-48 flagship / batch-16 8k):
    v3 1.80 vs v2 2.30 ms/layer, 9.25 vs v1 12.29 — and certified per
    the kernel-change policy (drifted-magnitude certifier + 3k-step
    trained-magnitude training segment, runs/r5f_*)."""
    if _POOL_BWD_ENV:
        return _POOL_BWD_ENV
    fixed_v3 = _pool_ext_bwd_fixed_bytes(c, j, d, v2j=True) + 4 * j * c
    if _tile_fits(n, _pool_ext_bwd_row_bytes(c, j), fixed_v3,
                  cap=_POOL_BWD_V3_TILE_CAP):
        return "v3"
    return "v1"


# v3 profits from larger tiles (fewer duplicated pass-0/pass-1 prologues:
# 1.86 ms/layer at TN=512 -> 1.80 at TN=1024, r5e A4/A5); the budget
# chooser still shrinks the tile wherever the naive tally demands it.
_POOL_BWD_V3_TILE_CAP = 1024


def _unpool_row_bytes(c, j):
    # x/attn/out rows + s/p planes (the pre-norm y plane is folded into the
    # per-batch kf/brow scratch — no per-tile affine pass)
    return 8 * c + 12 * j


def _unpool_fixed_bytes(c, j, i):
    return 4 * c * j + 4 * c * c + 4 * i * c  # kft/vf scratch, wq/wo, k/v


def _unpool_bwd_row_bytes(c, j):
    return 16 * c + 16 * j  # recompute + cotangent planes


def _unpool_bwd_fixed_bytes(c, j, i):
    # kft/vf bf16 scratch (4cj) + dkf/dvf fp32 accumulator blocks (8cj)
    # + wq/wo and their fp32 grads + k/v blocks
    return 12 * c * j + 8 * c * c + 8 * i * c


def _mlp_row_bytes(c, w):
    return 14 * c + 6 * w  # x/yf/y/o rows + h fp32 / g bf16 planes


def _mlp_fixed_bytes(c, w):
    return 4 * c * w  # w1t + w2t bf16


def _mlp_bwd_row_bytes(c, w):
    return 14 * c + 16 * w  # recompute rows + da/dh/dh_b/a planes


def _mlp_bwd_fixed_bytes(c, w):
    return 12 * c * w  # w1t/w2t bf16 + dw1t/dw2t fp32 accumulator blocks


def _fold_qf(ind2, kvw, num_heads: int) -> jnp.ndarray:
    """[C, J] folded pool query operand: qf[c, hI+i] = s·sum_d Wk[hD+d, c]
    ind2[hI+i, d]. Batch-independent, so it is computed ONCE per layer in
    XLA (tiny) instead of per grid step inside the kernels — the in-kernel
    fold cost 8 narrow matmuls + lane-slice scratch writes per batch
    element."""
    j, d = ind2.shape
    c = kvw.shape[1]
    scale_qk = 1.0 / (d ** 0.5)
    i = j // num_heads
    return (
        scale_qk
        * jnp.einsum(
            "hdc,hid->chi",
            kvw[:c].reshape(num_heads, d, c).astype(jnp.float32),
            ind2.reshape(num_heads, i, d).astype(jnp.float32),
        ).reshape(c, j)
    ).astype(kvw.dtype)


# ------------------------------------------------------------------ pool --


def _pool_kernel(
    x_ref, scale_ref, bias_ref, qf_ref, kvw_ref, wo_ref, gind_ref,
    h0_ref, mean_ref, inv_ref,
    *, num_heads: int, num_inducers: int, prenorm: bool,
):
    xf = x_ref[0].astype(jnp.float32)  # [N, C]
    n, c = xf.shape
    d = c // num_heads
    i = num_inducers

    if prenorm:
        # set-level GroupNorm stats, group-folded via the indicator matmul
        gind = gind_ref[:]  # [C, G] fp32
        per_group = c // gind.shape[1]
        count = n * per_group
        s1 = jnp.sum(xf, axis=0, keepdims=True)  # [1, C]
        s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
        g1 = jax.lax.dot_general(
            s1, gind, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [1, G]
        g2 = jax.lax.dot_general(
            s2, gind, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        mean_g = g1 / count
        var_g = g2 / count - mean_g * mean_g
        inv_g = jax.lax.rsqrt(jnp.maximum(var_g, 0.0) + _EPS)
        # broadcast back per channel: [1, G] @ [G, C]
        mean_c = jax.lax.dot_general(
            mean_g, gind, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        inv_c = jax.lax.dot_general(
            inv_g, gind, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        mean_ref[0] = mean_c
        inv_ref[0] = inv_c
        y = (
            (xf - mean_c) * (inv_c * scale_ref[0]) + bias_ref[0]
        ).astype(x_ref.dtype)
    else:
        mean_ref[0] = jnp.zeros_like(mean_ref[0])
        inv_ref[0] = jnp.ones_like(inv_ref[0])
        y = x_ref[0]

    s = jax.lax.dot_general(
        y, qf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, J]; softmax over the POINT axis per (head, inducer) column
    m = jnp.max(s, axis=0, keepdims=True)
    # exp-arg clamp at -80: inert for the softmax (tail < 2e-35 of the mass)
    # but guards the axon VPU exp NaN pathology on huge-negative arguments
    p = jnp.exp(jnp.maximum(s - m, -80.0))
    p = (p / jnp.sum(p, axis=0, keepdims=True)).astype(y.dtype)

    # fused value projection: v = y @ Wv^T (Wv = rows C..2C of the kv weight)
    v = jax.lax.dot_general(
        y, kvw_ref[c : 2 * c, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype)  # [N, C]

    # per-head pooling folded straight into the output projection:
    # h0 = sum_h (p_h^T @ v_h) @ Wo[:, hD:(h+1)D]^T — accumulating full-width
    # [I, C] outer products instead of concatenating 8 narrow [I, D] blocks
    # (wide lane concats cost a Mosaic relayout; same FLOPs either way).
    acc = jnp.zeros((i, c), jnp.float32)
    for h in range(num_heads):
        pooled_h = jax.lax.dot_general(
            p[:, h * i : (h + 1) * i], v[:, h * d : (h + 1) * d],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [I, D]
        acc += jax.lax.dot_general(
            pooled_h.astype(y.dtype), wo_ref[:, h * d : (h + 1) * d],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    h0_ref[0] = acc.astype(h0_ref.dtype)


def pool_vmem_ok(n: int, c: int, j: int, itemsize: int = 2) -> bool:
    """The pool kernel holds the full [N, J] fp32 logits (softmax is over N,
    untileable without two passes) — gate on a conservative VMEM budget."""
    need = (
        n * j * (4 + itemsize)  # logits fp32 + probabilities
        + 2 * n * c * itemsize  # normed stream + fused value projection
        + (3 * c * c + 2 * j * c) * itemsize  # weights + folded operand
    )  # (the transient fp32 upcast of x is liveness-reclaimed before logits)
    return need <= 13 * 1024 * 1024


def _pool_impl(x, scale, bias, ind2, kvw, wo, gind, num_heads, prenorm=True):
    """x [B, N, C]; scale/bias [B, C] fp32 (AdaGN affine); ind2 [J, D]
    (inducers flattened (h, i) -> row h*I+i); kvw [2C, C]; wo [C, C];
    gind [C, G] -> (h0 [B, I, C], mean_c [B, C] fp32, inv_c [B, C] fp32)."""
    b, n, c = x.shape
    j, d = ind2.shape
    i = j // num_heads
    qf = _fold_qf(ind2, kvw, num_heads).astype(x.dtype)
    h0, mean_c, inv_c = pl.pallas_call(
        functools.partial(
            _pool_kernel,
            num_heads=num_heads,
            num_inducers=i,
            prenorm=prenorm,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, j), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(gind.shape, lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, i, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, i, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(x, scale[:, None, :], bias[:, None, :], qf, kvw, wo, gind)
    mean_c = mean_c[:, 0]
    inv_c = inv_c[:, 0]
    # tie outputs together against pallas-output DCE (axon Mosaic bug);
    # single-element update-slice instead of a full-tensor add — XLA
    # aliases the buffer in place, so the tie costs ~nothing
    h0 = h0.at[0, 0, 0].add((0.0 * (mean_c[0, 0] + inv_c[0, 0])).astype(h0.dtype))
    return h0, mean_c, inv_c


_pool_p = custom_partitioning(_pool_impl, static_argnums=(7, 8))


def _pool_partition(num_heads, prenorm, mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    w_sh = NamedSharding(mesh, P(None, None))
    impl = lambda *a: _pool_impl(*a, num_heads, prenorm)
    return (
        mesh,
        impl,
        (x_sh, vec_sh, vec_sh),
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh, w_sh),
    )


def _pool_infer(num_heads, prenorm, mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    return (x_sh, vec_sh, vec_sh)


_pool_p.def_partition(
    _pool_partition,
    infer_sharding_from_operands=_pool_infer,
    sharding_rule=(
        "b n c, b c, b c, j d, e c1, c2 c3, c4 g -> b i c, b c, b c"
    ),
    need_replication_factors=(
        "n", "c", "j", "d", "e", "c1", "c2", "c3", "c4", "g", "i"
    ),
)


def _pool_bwd_kernel(
    x_ref, scale_ref, bias_ref, qf_ref, kvw_ref, wo_ref, gind_ref,
    gh_ref, gm_ref, gi_ref,
    dx_ref, dscale_ref, dbias_ref, dqf_ref, dwv_ref, dwo_ref,
    *, num_heads: int, num_inducers: int, prenorm: bool,
):
    """Backward of the pool layer-side: full forward recompute per batch
    element in VMEM (everything is resident — softmax is over the point
    axis), then the per-head pooling / softmax-over-N / value / pre-norm
    GroupNorm backward. The folded-query cotangent (dqf) and the value/out
    projection grads accumulate across batch elements in fp32 output
    blocks; the caller chains dqf through the fold jacobian to the k-weight
    and inducer grads in XLA."""
    first = pl.program_id(0) == 0
    x_in = x_ref[0]  # [N, C] bf16 — upcasts are localized to keep VMEM low
    n, c = x_in.shape
    d = c // num_heads
    i = num_inducers

    # ---- forward recompute
    if prenorm:
        gind = gind_ref[:]
        per_group = c // gind.shape[1]
        count = n * per_group
        xf = x_in.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=0, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
        g1 = jax.lax.dot_general(
            s1, gind, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        g2 = jax.lax.dot_general(
            s2, gind, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        mean_g = g1 / count
        var_g = g2 / count - mean_g * mean_g
        inv_g = jax.lax.rsqrt(jnp.maximum(var_g, 0.0) + _EPS)
        mean_c = jax.lax.dot_general(
            mean_g, gind, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        inv_c = jax.lax.dot_general(
            inv_g, gind, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scale_c = scale_ref[0]
        w_c = inv_c * scale_c
        y = ((xf - mean_c) * w_c + bias_ref[0]).astype(x_ref.dtype)
        del xf
    else:
        y = x_in

    @pl.when(first)
    def _():
        dqf_ref[:] = jnp.zeros_like(dqf_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)

    s = jax.lax.dot_general(
        y, qf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, J]
    m = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(jnp.maximum(s - m, -80.0))  # clamp: VPU exp NaN guard
    # exact jacobian of the CLAMPED forward: de/ds = e only where the clamp
    # is inactive (see the _blockwise_softmax_lastaxis docstring for the
    # divergence a wrong clamp jacobian caused)
    act = (s - m > -80.0).astype(jnp.float32)
    denom = jnp.sum(e, axis=0, keepdims=True)
    # probabilities kept bf16 (the fp32 [N, J] copy would overflow VMEM at
    # flagship shapes); the softmax-backward inner products run fp32
    p_b = (e / denom).astype(y.dtype)
    v = jax.lax.dot_general(
        y, kvw_ref[c : 2 * c, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype)  # [N, C]

    # merged[:, hD:(h+1)D] = p_h^T @ v_h, assembled by accumulating against
    # identity rows instead of an 8-way lane concat (Mosaic relayout)
    eye_c = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(y.dtype)
    merged_f = jnp.zeros((i, c), jnp.float32)
    for h in range(num_heads):
        pooled_h = jax.lax.dot_general(
            p_b[:, h * i : (h + 1) * i], v[:, h * d : (h + 1) * d],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        merged_f += jax.lax.dot_general(
            pooled_h.astype(y.dtype), eye_c[h * d : (h + 1) * d, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    merged = merged_f.astype(y.dtype)  # [I, C]

    # ---- backward
    gh = gh_ref[0].astype(jnp.float32)  # [I, C] cotangent of h0
    gh_b = gh.astype(y.dtype)
    # h0 = merged @ wo^T
    dmerged = jax.lax.dot_general(
        gh_b, wo_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [I, C]
    dwo_ref[:] += jax.lax.dot_general(
        gh_b, merged, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [C(out), C(in)]

    dmerged_b = dmerged.astype(y.dtype)
    dy = jnp.zeros((n, c), jnp.float32)
    for h in range(num_heads):
        p_h = p_b[:, h * i : (h + 1) * i].astype(jnp.float32)  # [N, I]
        v_h = v[:, h * d : (h + 1) * d]  # [N, D]
        dpool_h = dmerged_b[:, h * d : (h + 1) * d]  # [I, D]
        # pooled_h = p_h^T @ v_h
        dp_h = jax.lax.dot_general(
            v_h, dpool_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [N, I]
        dv_h = jax.lax.dot_general(
            p_b[:, h * i : (h + 1) * i], dpool_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y.dtype)  # [N, D]
        # softmax over N backward, per column (clamp-masked jacobian)
        t_h = jnp.sum(dp_h * p_h, axis=0, keepdims=True)  # [1, I]
        ds_h = (
            p_h * (dp_h - t_h) * act[:, h * i : (h + 1) * i]
        ).astype(y.dtype)  # [N, I]
        # s = y @ qf
        dy += jax.lax.dot_general(
            ds_h, qf_ref[:, h * i : (h + 1) * i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqf_ref[:, h * i : (h + 1) * i] += jax.lax.dot_general(
            y, ds_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # v = y @ Wv^T (rows hD:(h+1)D of the v-part select v_h's columns)
        dy += jax.lax.dot_general(
            dv_h, kvw_ref[c + h * d : c + (h + 1) * d, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwv_ref[h * d : (h + 1) * d, :] += jax.lax.dot_general(
            dv_h, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if prenorm:
        # y = (x - mean_c) * w_c + bias; mean/inv are functions of x, and the
        # (mean, inv) outputs carry their own cotangents (gm, gi)
        xf = x_in.astype(jnp.float32)
        xc = xf - mean_c
        dscale_ref[0] = jnp.sum(dy * xc * inv_c, axis=0, keepdims=True)
        dbias_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
        dinv_c = jnp.sum(dy * xc * scale_c, axis=0, keepdims=True) + gi_ref[0]
        dmean_c = -jnp.sum(dy * w_c, axis=0, keepdims=True) + gm_ref[0]
        dinv_g = jax.lax.dot_general(
            dinv_c, gind, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dmean_g = jax.lax.dot_general(
            dmean_c, gind, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dvar_g = -0.5 * inv_g * inv_g * inv_g * dinv_g
        dmean_g = dmean_g - 2.0 * mean_g * dvar_g
        dvarb_c = jax.lax.dot_general(
            dvar_g / count, gind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dmeanb_c = jax.lax.dot_general(
            dmean_g / count, gind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx = dy * w_c + 2.0 * xf * dvarb_c + dmeanb_c
    else:
        dscale_ref[0] = jnp.zeros_like(dscale_ref[0])
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
        dx = dy
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pool_bwd_impl(x, scale, bias, ind2, kvw, wo, gind, g_h0, g_mean, g_inv, num_heads, prenorm):
    b, n, c = x.shape
    j, d = ind2.shape
    i = j // num_heads
    qf = _fold_qf(ind2, kvw, num_heads).astype(x.dtype)
    outs = pl.pallas_call(
        functools.partial(
            _pool_bwd_kernel,
            num_heads=num_heads,
            num_inducers=i,
            prenorm=prenorm,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, j), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(gind.shape, lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, j), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, j), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(
        x, scale[:, None, :], bias[:, None, :], qf, kvw, wo, gind,
        g_h0, g_mean[:, None, :], g_inv[:, None, :],
    )
    dx, dscale, dbias, dqf, dwv, dwo = outs
    tie = 0.0 * (dscale[0, 0, 0] + dbias[0, 0, 0] + dqf[0, 0] + dwv[0, 0] + dwo[0, 0])
    dx = dx.at[0, 0, 0].add(tie.astype(dx.dtype))  # in-place DCE tie

    # chain dqf through the fold jacobian (tiny):
    # qf[c, hI+i] = scale_qk * sum_d kvw[hD+d, c] * ind2[hI+i, d]
    scale_qk = 1.0 / (d ** 0.5)
    dqf_r = dqf.reshape(c, num_heads, i)
    ind_r = ind2.reshape(num_heads, i, d).astype(jnp.float32)
    kvw_k = kvw[:c].reshape(num_heads, d, c).astype(jnp.float32)
    dwk = scale_qk * jnp.einsum("chi,hid->hdc", dqf_r, ind_r).reshape(c, c)
    dind2 = scale_qk * jnp.einsum("chi,hdc->hid", dqf_r, kvw_k).reshape(j, d)
    dkvw = jnp.concatenate([dwk, dwv], axis=0).astype(kvw.dtype)
    return (
        dx,
        dscale[:, 0],
        dbias[:, 0],
        dind2.astype(ind2.dtype),
        dkvw,
        dwo.astype(wo.dtype),
    )


_pool_bwd_p = custom_partitioning(_pool_bwd_impl, static_argnums=(10, 11))


def _pool_bwd_partition(num_heads, prenorm, mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    w_sh = NamedSharding(mesh, P(None, None))

    def impl(x, scale, bias, ind2, kvw, wo, gind, g_h0, g_mean, g_inv):
        outs = _pool_bwd_impl(
            x, scale, bias, ind2, kvw, wo, gind, g_h0, g_mean, g_inv,
            num_heads, prenorm,
        )
        dx, dscale, dbias, dind2, dkvw, dwo = outs
        if b is not None:
            dind2 = jax.lax.psum(dind2, b)
            dkvw = jax.lax.psum(dkvw, b)
            dwo = jax.lax.psum(dwo, b)
        return dx, dscale, dbias, dind2, dkvw, dwo

    return (
        mesh,
        impl,
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh),
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh, w_sh, x_sh, vec_sh, vec_sh),
    )


def _pool_bwd_infer(num_heads, prenorm, mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    w_sh = NamedSharding(mesh, P(None, None))
    return (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh)


_pool_bwd_p.def_partition(
    _pool_bwd_partition,
    infer_sharding_from_operands=_pool_bwd_infer,
    sharding_rule=(
        "b n c, b c, b c, j d, e c1, c2 c3, c4 g, b i c5, b c6, b c7 "
        "-> b n c, b c, b c, j d, e c1, c2 c3"
    ),
    need_replication_factors=(
        "n", "c", "j", "d", "e", "c1", "c2", "c3", "c4", "g", "i", "c5",
        "c6", "c7",
    ),
)


def _pool_ref(x, scale, bias, ind2, kvw, wo, num_groups, num_heads, prenorm=True):
    """XLA twin of ``_pool_impl`` — the backward recomputes through this."""
    b, n, c = x.shape
    j, d = ind2.shape
    i = j // num_heads
    xf = x.astype(jnp.float32)
    if prenorm:
        from gecco_tpu.ops.norms import group_norm_stats

        mean_c, inv_c = group_norm_stats(x, num_groups=num_groups)
        y = ((xf - mean_c[:, None, :]) * (inv_c * scale)[:, None, :] + bias[:, None, :]).astype(x.dtype)
    else:
        mean_c = jnp.zeros((b, c), jnp.float32)
        inv_c = jnp.ones((b, c), jnp.float32)
        y = x
    scale_qk = 1.0 / (d ** 0.5)
    wk = kvw[:c].astype(y.dtype)  # [C(out), C(in)] rows (h, d)
    # fold per head: qf[c, hI+i] = scale * sum_d wk[hD+d, c] ind2[hI+i, d]
    qf = scale_qk * jnp.einsum(
        "hdc,hid->chi",
        wk.reshape(num_heads, d, c),
        ind2.reshape(num_heads, i, d).astype(y.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(c, j).astype(y.dtype)
    logits = jnp.einsum("bnc,cj->bnj", y, qf, preferred_element_type=jnp.float32)
    lg = logits.reshape(b, n, num_heads, i)
    lg = lg - jax.lax.stop_gradient(lg.max(axis=1, keepdims=True))
    p = jnp.exp(lg)
    p = (p / p.sum(axis=1, keepdims=True)).astype(y.dtype)
    v = jnp.einsum(
        "bnc,dc->bnd", y, kvw[c:].astype(y.dtype), preferred_element_type=jnp.float32
    ).astype(y.dtype)
    pooled = jnp.einsum(
        "bnhi,bnhd->bihd",
        p,
        v.reshape(b, n, num_heads, d),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype)
    h0 = jnp.einsum(
        "bic,oc->bio", pooled.reshape(b, i, c), wo.astype(y.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return h0, mean_c, inv_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def folded_pool_layer(x, scale, bias, ind2, kvw, wo, gind, num_heads, prenorm=True):
    return _pool_p(x, scale, bias, ind2, kvw, wo, gind, num_heads, prenorm)


def _pool_fwd(x, scale, bias, ind2, kvw, wo, gind, num_heads, prenorm):
    out = _pool_p(x, scale, bias, ind2, kvw, wo, gind, num_heads, prenorm)
    return out, (x, scale, bias, ind2, kvw, wo, gind)


def pool_bwd_vmem_ok(n: int, c: int, j: int) -> bool:
    """The pool backward holds the full logits/probabilities PLUS the dy
    accumulator and fp32 upcasts per batch element; Mosaic's stack
    allocator measured ~1.5x the naive liveness tally (27.7 MB at flagship
    2048x384xJ512 vs 16 MB available) — gate to the XLA twin above this."""
    naive = n * j * 10 + n * c * 14 + (c * j + 2 * c * c) * 4
    return naive * 3 // 2 <= 15 * 1024 * 1024


def _pool_bwd(num_heads, prenorm, res, g):
    x, scale, bias, ind2, kvw, wo, gind = res
    n, c = x.shape[1], x.shape[2]
    j = ind2.shape[0]
    if _twin_bwd("pool"):
        _, vjp = jax.vjp(
            lambda xx, sc, bi, iq, kw, ow: _pool_ref(
                xx, sc, bi, iq, kw, ow, gind.shape[1], num_heads, prenorm
            ),
            x, scale, bias, ind2, kvw, wo,
        )
        return (*vjp(g), jnp.zeros_like(gind))
    if not pool_bwd_vmem_ok(n, c, j):
        # flagship training shapes: the resident backward kernel does not fit
        # in VMEM. Decompose: GroupNorm stats differentiate through XLA (one
        # cheap bandwidth pass), the attention side through the TILED
        # online-softmax kernels (folded_pool_ext's custom_vjp) — instead of
        # the old monolithic XLA-twin recompute that round-tripped the
        # [B, N, J] logits through HBM.
        def ext_fn(xx, sc, bi, iq, kw, ow):
            if prenorm:
                from gecco_tpu.ops.norms import group_norm_stats

                mean_c, inv_c = group_norm_stats(xx, num_groups=gind.shape[1])
                se = sc * inv_c
                be = bi - mean_c * se
            else:
                mean_c = jnp.zeros_like(sc)
                inv_c = jnp.ones_like(sc)
                se = jnp.ones_like(sc)
                be = jnp.zeros_like(sc)
            h0 = folded_pool_ext(xx, se, be, iq, kw, ow, num_heads)
            return h0, mean_c, inv_c

        _, vjp = jax.vjp(ext_fn, x, scale, bias, ind2, kvw, wo)
        return (*vjp(g), jnp.zeros_like(gind))
    g_h0, g_mean, g_inv = g
    # the incoming h0 cotangent is truncated to the activation dtype (bf16)
    # on purpose: the backward kernels' [N, C]-sized operands stream at half
    # the HBM cost, and every inner product still accumulates fp32 (the
    # kernels upcast). This is the same precision the activations themselves
    # carry; quality was certified against the fp32-cotangent XLA-twin arm
    # over a 30k-step flagship run (BASELINE.md round-2 notes).
    dx, dscale, dbias, dind2, dkvw, dwo = _pool_bwd_p(
        x, scale, bias, ind2, kvw, wo, gind,
        g_h0.astype(x.dtype), g_mean.astype(jnp.float32),
        g_inv.astype(jnp.float32),
        num_heads, prenorm,
    )
    return dx, dscale, dbias, dind2, dkvw, dwo, jnp.zeros_like(gind)


folded_pool_layer.defvjp(_pool_fwd, _pool_bwd)


# ----------------------------------------------------------- tiled pool --
#
# The resident pool kernel above holds the full [N, J] logits in VMEM (its
# softmax is over the point axis), which gates it off at N=8192 (forward) and
# at flagship training shapes (backward). The ``folded_pool_ext`` pair below
# removes both gates: an ONLINE-softmax forward over point tiles (flash-
# attention-style running max/sum; the pooled accumulator lives in [J, D]
# row-per-(head, inducer) layout so corrections are plain row broadcasts) and
# a two-pass tiled backward (pass 0 accumulates the softmax-backward inner
# products and the pooled values, pass 1 emits the gradients). "ext" because
# the pre-norm is EXTERNAL: the caller passes the collapsed ``x * se + be``
# affine (stats via gecco_tpu.ops.norms.group_norm_stats in XLA — one cheap
# bandwidth pass), so the GroupNorm backward composes by autodiff.
# Replaces the same reference math as the resident kernel
# (gecco-jax/src/gecco_jax/models/set_transformer.py:17-102).


def _eye(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(dtype)


def _fold_wf(kvw, wo, num_heads: int) -> jnp.ndarray:
    """[H*C, C] folded value-side operand: ``wf[h*C+q, o] = sum_d
    Wv_h[d, q] * Wo_h[o, d]`` with ``Wv_h = kvw[C+h*D : C+(h+1)*D]`` and
    ``Wo_h = wo[:, h*D:(h+1)*D]``. With Wv and Wo folded, the kernel's online
    value accumulator becomes ``U = E^T Y`` [J, C] — ONE full-width MXU pass
    per point tile instead of a v-projection plus 8 narrow [TN,I]x[TN,D]
    head dots whose 64x48 output tiles pad to the 128x128 MXU tile (~19%
    utilization). The [I, C] pooled output is recovered once per batch as
    ``sum_h Unorm_h @ wf_h`` — exact algebra, same h0."""
    c = kvw.shape[1]
    d = c // num_heads
    return (
        jnp.einsum(
            "hdq,ohd->hqo",
            kvw[c:].astype(jnp.float32).reshape(num_heads, d, c),
            wo.astype(jnp.float32).reshape(c, num_heads, d),
        )
        .reshape(num_heads * c, c)
        .astype(kvw.dtype)
    )


def _pool_ext_kernel_wfold(
    x_ref, se_ref, be_ref, qf_ref, wf_ref,
    h0_ref, macc_ref, sacc_ref,
    uacc_scratch,
    *, num_heads: int, num_inducers: int,
):
    ni = pl.program_id(1)
    nt = pl.num_programs(1)
    x = x_ref[0]  # [TN, C]
    c = x.shape[-1]
    i = num_inducers

    @pl.when(ni == 0)
    def _():
        macc_ref[0] = jnp.full_like(macc_ref[0], -3.0e38)
        sacc_ref[0] = jnp.zeros_like(sacc_ref[0])
        uacc_scratch[:] = jnp.zeros_like(uacc_scratch)

    # software-pipelined tile body (row chunks sharing ONE online-softmax
    # correction — the joint tile max is exactly the max over all chunks).
    # DEFAULT IS 1 (unchunked): the chunked bodies (4/8-way, round 4)
    # trained NaN-free in interpret mode and on-TPU micro-tests, but the
    # flagship 30k training run deterministically went NaN at step 2600
    # with default chunks and was clean with GECCO_PIPELINE_CHUNKS=1 —
    # the same failure class as the round-2 Mosaic miscompile of reductions
    # in LARGE kernel bodies (BASELINE.md round-4 notes). Chunking is worth
    # ~0.9 clouds/s on the sampler headline; re-enable via the env knob
    # only for inference experiments until the miscompile is isolated.
    tn = x.shape[0]
    nchunk = _pipeline_chunks(1, tn)
    step = tn // nchunk
    chunks = tuple(slice(q * step, (q + 1) * step) for q in range(nchunk))
    qf = qf_ref[:]
    ys = [
        (x[sl].astype(jnp.float32) * se_ref[0] + be_ref[0]).astype(x.dtype)
        for sl in chunks
    ]
    ss = [
        jax.lax.dot_general(
            y, qf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        for y in ys
    ]  # [step, J] each
    tile_max = ss[0].max(axis=0, keepdims=True)  # full-width sublane reduce
    for s in ss[1:]:
        tile_max = jnp.maximum(tile_max, s.max(axis=0, keepdims=True))
    m_old = macc_ref[0]
    m_new = jnp.maximum(m_old, tile_max)
    corr = jnp.exp(jnp.maximum(m_old - m_new, -80.0))  # [1, J]
    es = [jnp.exp(jnp.maximum(s - m_new, -80.0)) for s in ss]
    macc_ref[0] = m_new
    esum = es[0].sum(axis=0, keepdims=True)
    for e in es[1:]:
        esum = esum + e.sum(axis=0, keepdims=True)
    sacc_ref[0] = sacc_ref[0] * corr + esum
    # the value accumulator lives TRANSPOSED, U^T = Y^T E [C, J]: the online
    # correction is then a plain [1, J] row broadcast — the old [J, C]
    # layout needed a pathological [J,J]x[J,1] identity matmul per tile just
    # to transpose corr into a column
    u_new = jax.lax.dot_general(
        ys[0], es[0].astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, J]
    for e, y in zip(es[1:], ys[1:]):
        u_new = u_new + jax.lax.dot_general(
            y, e.astype(x.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    uacc_scratch[:] = uacc_scratch[:] * corr + u_new  # U^T += Y^T E, [C, J]

    @pl.when(ni == nt - 1)
    def _():
        unorm_t = (uacc_scratch[:] * (1.0 / sacc_ref[0])).astype(x.dtype)  # [C, J]
        acc = jnp.zeros((i, c), jnp.float32)
        for h in range(num_heads):
            acc += jax.lax.dot_general(
                unorm_t[:, h * i : (h + 1) * i], wf_ref[h * c : (h + 1) * c, :],
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [I, C] = unorm_h^T-contracted against wf_h over C
        h0_ref[0] = acc.astype(h0_ref.dtype)


def _pool_ext_kernel(
    x_ref, se_ref, be_ref, qf_ref, kvw_ref, wo_ref, eyej_ref,
    h0_ref, macc_ref, sacc_ref,
    pacc_scratch,
    *, num_heads: int, num_inducers: int,
):
    ni = pl.program_id(1)
    nt = pl.num_programs(1)
    x = x_ref[0]  # [TN, C]
    c = x.shape[-1]
    d = c // num_heads
    i = num_inducers

    @pl.when(ni == 0)
    def _():
        macc_ref[0] = jnp.full_like(macc_ref[0], -3.0e38)
        sacc_ref[0] = jnp.zeros_like(sacc_ref[0])
        pacc_scratch[:] = jnp.zeros_like(pacc_scratch)

    y = (x.astype(jnp.float32) * se_ref[0] + be_ref[0]).astype(x.dtype)
    s = jax.lax.dot_general(
        y, qf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, J]
    tile_max = jnp.max(s, axis=0, keepdims=True)  # full-width sublane reduce
    m_old = macc_ref[0]
    m_new = jnp.maximum(m_old, tile_max)
    corr = jnp.exp(jnp.maximum(m_old - m_new, -80.0))  # [1, J]
    e = jnp.exp(jnp.maximum(s - m_new, -80.0))
    macc_ref[0] = m_new
    sacc_ref[0] = sacc_ref[0] * corr + jnp.sum(e, axis=0, keepdims=True)
    # [1, J] -> [J, 1] via an identity matmul (Mosaic-safe transpose)
    corr_col = jax.lax.dot_general(
        eyej_ref[:], corr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pacc_scratch[:] = pacc_scratch[:] * corr_col
    v = jax.lax.dot_general(
        y, kvw_ref[c : 2 * c, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype)  # [TN, C]
    e_b = e.astype(y.dtype)
    for h in range(num_heads):
        pacc_scratch[h * i : (h + 1) * i, :] += jax.lax.dot_general(
            e_b[:, h * i : (h + 1) * i], v[:, h * d : (h + 1) * d],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [I, D] rows of the [J, D] accumulator

    @pl.when(ni == nt - 1)
    def _():
        inv_col = jax.lax.dot_general(
            eyej_ref[:], 1.0 / sacc_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [J, 1]
        pnorm = (pacc_scratch[:] * inv_col).astype(y.dtype)  # [J, D]
        acc = jnp.zeros((i, c), jnp.float32)
        for h in range(num_heads):
            acc += jax.lax.dot_general(
                pnorm[h * i : (h + 1) * i, :], wo_ref[:, h * d : (h + 1) * d],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
        h0_ref[0] = acc.astype(h0_ref.dtype)


def _pool_ext_impl(x, se, be, ind2, kvw, wo, num_heads):
    """x [B, N, C]; se/be [B, C] fp32 (collapsed pre-norm, applied inline);
    ind2 [J, D]; kvw [2C, C]; wo [C, C] -> (h0 [B, I, C], macc [B, 1, J],
    sacc [B, 1, J]) — the softmax statistics are saved for the backward."""
    b, n, c = x.shape
    j, d = ind2.shape
    i = j // num_heads
    qf = _fold_qf(ind2, kvw, num_heads).astype(x.dtype)
    # prefer the folded value-side formulation (one full-width E^T Y pass per
    # tile); its fixed VMEM cost is H*C^2 (the wf operand), which does not fit
    # at 8k-config widths — fall back to the v-stream kernel there
    wfold_ok = _tile_fits(
        n, _pool_ext_wfold_row_bytes(c, j),
        _pool_ext_wfold_fixed_bytes(c, j, num_heads),
    )
    if wfold_ok:
        tn = _tn_env("POOL", _pick_tile_n(
            n, row_bytes=_pool_ext_wfold_row_bytes(c, j),
            fixed_bytes=_pool_ext_wfold_fixed_bytes(c, j, num_heads)), n)
        naive = tn * _pool_ext_wfold_row_bytes(c, j) \
            + _pool_ext_wfold_fixed_bytes(c, j, num_heads)
        wf = _fold_wf(kvw, wo, num_heads)
        h0, macc, sacc = pl.pallas_call(
            functools.partial(
                _pool_ext_kernel_wfold,
                num_heads=num_heads,
                num_inducers=i,
            ),
            grid=(b, n // tn),
            in_specs=[
                pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, j), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((num_heads * c, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, i, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, j), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, j), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, i, c), x.dtype),
                jax.ShapeDtypeStruct((b, 1, j), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, j), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((c, j), jnp.float32)],
            compiler_params=_kernel_compiler_params(naive),
            interpret=_interpret(),
        )(x, se[:, None, :], be[:, None, :], qf, wf)
        h0 = h0.at[0, 0, 0].add(
            (0.0 * (macc[0, 0, 0] + sacc[0, 0, 0])).astype(h0.dtype)
        )
        return h0, macc, sacc
    tn = _tn_env("POOL", _pick_tile_n(n, row_bytes=_pool_ext_row_bytes(c, j),
                 fixed_bytes=_pool_ext_fixed_bytes(c, j, d)), n)
    naive = tn * _pool_ext_row_bytes(c, j) + _pool_ext_fixed_bytes(c, j, d)
    h0, macc, sacc = pl.pallas_call(
        functools.partial(
            _pool_ext_kernel,
            num_heads=num_heads,
            num_inducers=i,
        ),
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, j), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((j, j), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, i, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, i, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, j), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, j), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((j, d), jnp.float32)],
        compiler_params=_kernel_compiler_params(naive),
        interpret=_interpret(),
    )(x, se[:, None, :], be[:, None, :], qf, kvw, wo, _eye(j))
    # tie outputs against pallas-output DCE (axon Mosaic bug), in-place form
    h0 = h0.at[0, 0, 0].add(
        (0.0 * (macc[0, 0, 0] + sacc[0, 0, 0])).astype(h0.dtype)
    )
    return h0, macc, sacc


_pool_ext_p = custom_partitioning(_pool_ext_impl, static_argnums=(6,))


def _pool_ext_partition(num_heads, mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    stat_sh = NamedSharding(mesh, P(b, None, None))
    w_sh = NamedSharding(mesh, P(None, None))
    impl = lambda *a: _pool_ext_impl(*a, num_heads)
    return (
        mesh,
        impl,
        (x_sh, stat_sh, stat_sh),
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh),
    )


def _pool_ext_infer(num_heads, mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    return (x_sh, x_sh, x_sh)


_pool_ext_p.def_partition(
    _pool_ext_partition,
    infer_sharding_from_operands=_pool_ext_infer,
    sharding_rule="b n c, b c, b c, j d, e c1, c2 c3 -> b i c, b u j1, b u1 j2",
    need_replication_factors=(
        "n", "c", "j", "d", "e", "c1", "c2", "c3", "i", "u", "j1", "u1", "j2",
    ),
)


def _pool_ext_bwd_kernel_v1(
    x_ref, se_ref, be_ref, qf_ref, kvw_ref, wo_ref, eyej_ref, eyec_ref,
    gh_ref, macc_ref, sacc_ref,
    dx_ref, dse_ref, dbe_ref, dqf_ref, dwv_ref, dwo_ref,
    dm_scratch, pacc_scratch, tacc_scratch,
    *, num_heads: int, num_inducers: int,
):
    """Round-4 two-pass pool backward, kept under GECCO_POOL_BWD=v1 for
    bisection (the round-5 default is ``_pool_ext_bwd_kernel`` below).

    Two passes over the point tiles of one batch element (grid
    (b, 2, nt)): pass 0 accumulates the softmax-backward inner products
    t_j = sum_n p*dp and the pooled values (for dwo); pass 1 recomputes the
    tile forward and emits dx/dse/dbe and the weight-grad accumulators.
    ``dp``/``dv`` ride a per-batch [J, C] block-placement matrix (dmerged
    masked per head) so every big matmul stays full-width — no lane
    slicing, no concats."""
    pz = pl.program_id(1)
    ni = pl.program_id(2)
    nt = pl.num_programs(2)
    x = x_ref[0]  # [TN, C]
    c = x.shape[-1]
    d = c // num_heads
    i = num_inducers

    first_all = jnp.logical_and(
        pl.program_id(0) == 0, jnp.logical_and(pz == 0, ni == 0)
    )

    @pl.when(first_all)
    def _():
        dqf_ref[:] = jnp.zeros_like(dqf_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)

    @pl.when(jnp.logical_and(pz == 0, ni == 0))
    def _():
        # dmerged = gh @ wo, then per-head block placement into [J, C]:
        # DM[hI+i, c'] = dmerged[i, c'] if c' in head h's column block else 0
        gh_b = gh_ref[0]
        dmerged = jax.lax.dot_general(
            gh_b, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [I, C]
        col_head = jax.lax.broadcasted_iota(jnp.int32, (i, c), 1) // d
        for h in range(num_heads):
            dm_scratch[h * i : (h + 1) * i, :] = jnp.where(
                col_head == h, dmerged, 0.0
            ).astype(dm_scratch.dtype)
        pacc_scratch[:] = jnp.zeros_like(pacc_scratch)
        tacc_scratch[:] = jnp.zeros_like(tacc_scratch)
        dse_ref[0] = jnp.zeros_like(dse_ref[0])
        dbe_ref[0] = jnp.zeros_like(dbe_ref[0])

    # --- shared tile recompute (identical in both passes)
    se = se_ref[0]
    y = (x.astype(jnp.float32) * se + be_ref[0]).astype(x.dtype)
    s = jax.lax.dot_general(
        y, qf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, J]
    e = jnp.exp(jnp.maximum(s - macc_ref[0], -80.0))
    v = jax.lax.dot_general(
        y, kvw_ref[c : 2 * c, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype)  # [TN, C]
    dp = jax.lax.dot_general(
        v, dm_scratch[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, J]

    @pl.when(pz == 0)
    def _():
        tacc_scratch[:] += jnp.sum(e * dp, axis=0, keepdims=True)  # [1, J]
        e_b = e.astype(y.dtype)
        for h in range(num_heads):
            pacc_scratch[h * i : (h + 1) * i, :] += jax.lax.dot_general(
                e_b[:, h * i : (h + 1) * i], v[:, h * d : (h + 1) * d],
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )

    @pl.when(jnp.logical_and(pz == 0, ni == nt - 1))
    def _():
        inv_s = 1.0 / sacc_ref[0]  # [1, J]
        inv_col = jax.lax.dot_general(
            eyej_ref[:], inv_s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pnorm = (pacc_scratch[:] * inv_col).astype(y.dtype)  # [J, D]
        merged = jnp.zeros((i, c), jnp.float32)
        for h in range(num_heads):
            merged += jax.lax.dot_general(
                pnorm[h * i : (h + 1) * i, :], eyec_ref[h * d : (h + 1) * d, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        dwo_ref[:] += jax.lax.dot_general(
            gh_ref[0], merged.astype(y.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C(out), C(in)]
        tacc_scratch[:] = tacc_scratch[:] * inv_s  # t = (sum e*dp) / sum e

    @pl.when(pz == 1)
    def _():
        inv_s = 1.0 / sacc_ref[0]
        p = e * inv_s  # [TN, J] fp32
        # clamp-masked jacobian: de/ds = 0 where exp's -80 clamp bound the
        # recompute (exact backward of the actually-computed forward)
        ds = p * (dp - tacc_scratch[:]) * (s - macc_ref[0] > -80.0).astype(
            jnp.float32
        )
        ds_b = ds.astype(y.dtype)
        p_b = p.astype(y.dtype)
        dy = jax.lax.dot_general(
            ds_b, qf_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, C]
        dv = jax.lax.dot_general(
            p_b, dm_scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y.dtype)  # [TN, C]
        dy += jax.lax.dot_general(
            dv, kvw_ref[c : 2 * c, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[0] = (dy * se).astype(dx_ref.dtype)
        dse_ref[0] += jnp.sum(dy * x.astype(jnp.float32), axis=0, keepdims=True)
        dbe_ref[0] += jnp.sum(dy, axis=0, keepdims=True)
        dqf_ref[:] += jax.lax.dot_general(
            y, ds_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C, J]
        dwv_ref[:] += jax.lax.dot_general(
            dv, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C(out), C(in)]


def _pool_ext_bwd_kernel(
    x_ref, se_ref, be_ref, qf_ref, kvw_ref, wo_ref, eyej_ref, eyec_ref,
    gh_ref, macc_ref, sacc_ref,
    dx_ref, dse_ref, dbe_ref, dqf_ref, dwv_ref, dwo_ref,
    dm_scratch, pacc_scratch, tacc_scratch,
    *, num_heads: int, num_inducers: int,
):
    """Round-5 restructured two-pass pool backward (same grid/operands as
    v1 above; identical mathematics — associativity only). Two changes
    against v1, both aimed at the VPU/relayout time between MXU calls
    that held v1 at 53-65%% of its FLOP floor (BASELINE.md round-4
    accounting):

    1. pass 0 accumulates the FULL-WIDTH ``[J, C] = e^T v`` product in
       one MXU matmul per tile (v1: 8 lane-sliced per-head [TN,I]x[TN,D]
       matmuls at D=48 — layout-hostile) and never materialises ``dp``:
       the softmax-backward inner products follow algebraically at the
       last tile from t_j = rowsum(DM ∘ e^T v)_j / sacc_j, because DM's
       rows are zero outside their head's column block. This removes the
       [TN,C]x[C,J] dp matmul AND the [TN,J] fp32 e*dp multiply-reduce
       from every pass-0 tile.
    2. the softmax normaliser 1/sacc is folded into the block-placement
       matrix ONCE per batch element (``DMs = DM * inv_s rows``), so
       pass 1 computes ds = e ∘ (v @ DMs^T − T) ∘ clampmask and
       dv = e @ DMs directly — the per-tile [TN, J] fp32 ``p = e * inv_s``
       materialisation is gone.
    """
    pz = pl.program_id(1)
    ni = pl.program_id(2)
    nt = pl.num_programs(2)
    x = x_ref[0]  # [TN, C]
    c = x.shape[-1]
    d = c // num_heads
    i = num_inducers

    first_all = jnp.logical_and(
        pl.program_id(0) == 0, jnp.logical_and(pz == 0, ni == 0)
    )

    @pl.when(first_all)
    def _():
        dqf_ref[:] = jnp.zeros_like(dqf_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)

    @pl.when(jnp.logical_and(pz == 0, ni == 0))
    def _():
        # DMs[hI+i', c'] = dmerged[i', c'] / sacc[hI+i'] on head h's
        # column block, else 0 (dmerged = gh @ wo)
        gh_b = gh_ref[0]
        dmerged = jax.lax.dot_general(
            gh_b, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [I, C]
        inv_colJ = jax.lax.dot_general(
            eyej_ref[:], 1.0 / sacc_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [J, 1]
        col_head = jax.lax.broadcasted_iota(jnp.int32, (i, c), 1) // d
        for h in range(num_heads):
            dm_scratch[h * i : (h + 1) * i, :] = (
                jnp.where(col_head == h, dmerged, 0.0)
                * inv_colJ[h * i : (h + 1) * i, :]
            ).astype(dm_scratch.dtype)
        pacc_scratch[:] = jnp.zeros_like(pacc_scratch)
        tacc_scratch[:] = jnp.zeros_like(tacc_scratch)
        dse_ref[0] = jnp.zeros_like(dse_ref[0])
        dbe_ref[0] = jnp.zeros_like(dbe_ref[0])

    # --- shared tile recompute (identical in both passes)
    se = se_ref[0]
    y = (x.astype(jnp.float32) * se + be_ref[0]).astype(x.dtype)
    s = jax.lax.dot_general(
        y, qf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, J]
    e = jnp.exp(jnp.maximum(s - macc_ref[0], -80.0))
    v = jax.lax.dot_general(
        y, kvw_ref[c : 2 * c, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype)  # [TN, C]
    e_b = e.astype(y.dtype)

    @pl.when(pz == 0)
    def _():
        pacc_scratch[:] += jax.lax.dot_general(
            e_b, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [J, C] full-width e^T v

    @pl.when(jnp.logical_and(pz == 0, ni == nt - 1))
    def _():
        inv_s = 1.0 / sacc_ref[0]  # [1, J]
        # T_j = inv_s_j * t_j = inv_s_j * rowsum(DMs ∘ e^T v)_j — DMs is
        # already row-scaled, so one [J, C] elementwise product and a
        # ones-contraction give the [1, J] row vector directly
        tacc_scratch[:] = jax.lax.dot_general(
            jnp.ones((1, c), jnp.float32),
            dm_scratch[:].astype(jnp.float32) * pacc_scratch[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_s
        # dwo from the normalised pooled values: head-block extraction of
        # (e^T v) / sacc into merged [I, C]
        inv_colJ = jax.lax.dot_general(
            eyej_ref[:], inv_s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [J, 1]
        pnorm = pacc_scratch[:] * inv_colJ  # [J, C] fp32
        col_head = jax.lax.broadcasted_iota(jnp.int32, (i, c), 1) // d
        merged = jnp.zeros((i, c), jnp.float32)
        for h in range(num_heads):
            merged += jnp.where(
                col_head == h, pnorm[h * i : (h + 1) * i, :], 0.0
            )
        dwo_ref[:] += jax.lax.dot_general(
            gh_ref[0], merged.astype(y.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C(out), C(in)]

    @pl.when(pz == 1)
    def _():
        dp_s = jax.lax.dot_general(
            v, dm_scratch[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, J] = dp ∘ inv_s columns
        # clamp-masked jacobian (de/ds = 0 where the -80 clamp bound);
        # normaliser pre-folded — no p materialisation
        ds = e * (dp_s - tacc_scratch[:]) * (
            s - macc_ref[0] > -80.0
        ).astype(jnp.float32)
        ds_b = ds.astype(y.dtype)
        dy = jax.lax.dot_general(
            ds_b, qf_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, C]
        dv = jax.lax.dot_general(
            e_b, dm_scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y.dtype)  # p @ DM == e @ DMs
        dy += jax.lax.dot_general(
            dv, kvw_ref[c : 2 * c, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[0] = (dy * se).astype(dx_ref.dtype)
        dse_ref[0] += jnp.sum(dy * x.astype(jnp.float32), axis=0, keepdims=True)
        dbe_ref[0] += jnp.sum(dy, axis=0, keepdims=True)
        dqf_ref[:] += jax.lax.dot_general(
            y, ds_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C, J]
        dwv_ref[:] += jax.lax.dot_general(
            dv, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C(out), C(in)]


def _pool_ext_bwd_kernel_v2j(
    x_ref, se_ref, be_ref, qf_ref, kvw_ref, wo_ref, isc_ref,
    gh_ref, macc_ref, sacc_ref,
    dx_ref, dse_ref, dbe_ref, dqf_ref, dwv_ref, dwo_ref,
    dm_scratch, pacc_scratch, tacc_scratch,
    *, num_heads: int, num_inducers: int,
):
    """The v2 body above with the [J, 1] softmax-normaliser column
    ``isc = (1/sacc)^T`` passed as an operand (the transpose is one tiny
    XLA op per call) instead of synthesised in-kernel via an eye(J)
    matmul. Mathematics identical to v2; the VMEM tally drops by the
    4·J² identity + the dead 2·C² eyec, which un-gates the full-width
    [J, C] pass-0 accumulator at the 8k config (C=768, J=1024)."""
    pz = pl.program_id(1)
    ni = pl.program_id(2)
    nt = pl.num_programs(2)
    x = x_ref[0]  # [TN, C]
    c = x.shape[-1]
    d = c // num_heads
    i = num_inducers

    first_all = jnp.logical_and(
        pl.program_id(0) == 0, jnp.logical_and(pz == 0, ni == 0)
    )

    @pl.when(first_all)
    def _():
        dqf_ref[:] = jnp.zeros_like(dqf_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)

    @pl.when(jnp.logical_and(pz == 0, ni == 0))
    def _():
        gh_b = gh_ref[0]
        dmerged = jax.lax.dot_general(
            gh_b, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [I, C]
        inv_colJ = isc_ref[0]  # [J, 1]
        col_head = jax.lax.broadcasted_iota(jnp.int32, (i, c), 1) // d
        for h in range(num_heads):
            dm_scratch[h * i : (h + 1) * i, :] = (
                jnp.where(col_head == h, dmerged, 0.0)
                * inv_colJ[h * i : (h + 1) * i, :]
            ).astype(dm_scratch.dtype)
        pacc_scratch[:] = jnp.zeros_like(pacc_scratch)
        tacc_scratch[:] = jnp.zeros_like(tacc_scratch)
        dse_ref[0] = jnp.zeros_like(dse_ref[0])
        dbe_ref[0] = jnp.zeros_like(dbe_ref[0])

    # --- shared tile recompute (identical in both passes)
    se = se_ref[0]
    y = (x.astype(jnp.float32) * se + be_ref[0]).astype(x.dtype)
    s = jax.lax.dot_general(
        y, qf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, J]
    e = jnp.exp(jnp.maximum(s - macc_ref[0], -80.0))
    v = jax.lax.dot_general(
        y, kvw_ref[c : 2 * c, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype)  # [TN, C]
    e_b = e.astype(y.dtype)

    @pl.when(pz == 0)
    def _():
        pacc_scratch[:] += jax.lax.dot_general(
            e_b, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [J, C] full-width e^T v

    @pl.when(jnp.logical_and(pz == 0, ni == nt - 1))
    def _():
        inv_s = 1.0 / sacc_ref[0]  # [1, J]
        tacc_scratch[:] = jax.lax.dot_general(
            jnp.ones((1, c), jnp.float32),
            dm_scratch[:].astype(jnp.float32) * pacc_scratch[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_s
        pnorm = pacc_scratch[:] * isc_ref[0]  # [J, C] fp32
        col_head = jax.lax.broadcasted_iota(jnp.int32, (i, c), 1) // d
        merged = jnp.zeros((i, c), jnp.float32)
        for h in range(num_heads):
            merged += jnp.where(
                col_head == h, pnorm[h * i : (h + 1) * i, :], 0.0
            )
        dwo_ref[:] += jax.lax.dot_general(
            gh_ref[0], merged.astype(y.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C(out), C(in)]

    @pl.when(pz == 1)
    def _():
        dp_s = jax.lax.dot_general(
            v, dm_scratch[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, J] = dp ∘ inv_s columns
        ds = e * (dp_s - tacc_scratch[:]) * (
            s - macc_ref[0] > -80.0
        ).astype(jnp.float32)
        ds_b = ds.astype(y.dtype)
        dy = jax.lax.dot_general(
            ds_b, qf_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, C]
        dv = jax.lax.dot_general(
            e_b, dm_scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y.dtype)  # p @ DM == e @ DMs
        dy += jax.lax.dot_general(
            dv, kvw_ref[c : 2 * c, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[0] = (dy * se).astype(dx_ref.dtype)
        dse_ref[0] += jnp.sum(dy * x.astype(jnp.float32), axis=0, keepdims=True)
        dbe_ref[0] += jnp.sum(dy, axis=0, keepdims=True)
        dqf_ref[:] += jax.lax.dot_general(
            y, ds_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C, J]
        dwv_ref[:] += jax.lax.dot_general(
            dv, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C(out), C(in)]


def _pool_ext_bwd_kernel_v3(
    x_ref, se_ref, be_ref, qf_ref, kvw_ref, wo_ref, isc_ref,
    gh_ref, macc_ref, sacc_ref,
    dx_ref, dse_ref, dbe_ref, dqf_ref, dwv_ref, dwo_ref,
    dm_scratch, ety_scratch, tacc_scratch, w2_scratch, w3_scratch,
    *, num_heads: int, num_inducers: int,
):
    """Fold-everything two-pass pool backward (opt-in GECCO_POOL_BWD=v3).

    Same mathematics as v2/v2j; the restructure exploits that the softmax
    numerator matrix ``e`` only ever enters the backward through products
    with the tile activations ``y``:

    - pass 0 accumulates ONLY ``eTy = e^T y`` [J, C] (one [TN,J]x[TN,C]
      MXU matmul per tile — the value projection ``v`` is never computed
      in the backward at all). At the last pass-0 tile, the pooled values
      follow as ``pacc = eTy @ Wv^T`` (one C²J matmul per batch element),
      and two folded operands are built for pass 1:
      ``W2 = Wv^T DMs^T`` [C, J] (so dp∘inv_s = y @ W2 — replaces the
      per-tile v recompute + [TN,C]x[C,J] product) and ``W3 = DMs Wv``
      [J, C] (so the dv-side gradient is one ``e @ W3`` matmul — dv is
      never materialised).
    - pass 1 per tile: recompute s/e, dp_s = y @ W2, ds, dy = ds @ qf^T
      + e @ W3, dqf += y^T ds — five [TN,·]x[·,·] J-width matmuls, no
      C-width recompute. dwv folds once per batch element at the last
      tile: dv^T y = DMs^T (e^T y) = DMs^T eTy (eTy reused from pass 0;
      dv uses the unmasked e, exactly as v2).

    Executed FLOPs drop ~22% vs v2 at flagship shapes and both [TN, C]
    fp32 value casts leave the tile body; the extra per-batch folds are
    O(C²J), amortised over N points."""
    pz = pl.program_id(1)
    ni = pl.program_id(2)
    nt = pl.num_programs(2)
    x = x_ref[0]  # [TN, C]
    c = x.shape[-1]
    d = c // num_heads
    i = num_inducers

    first_all = jnp.logical_and(
        pl.program_id(0) == 0, jnp.logical_and(pz == 0, ni == 0)
    )

    @pl.when(first_all)
    def _():
        dqf_ref[:] = jnp.zeros_like(dqf_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)

    @pl.when(jnp.logical_and(pz == 0, ni == 0))
    def _():
        gh_b = gh_ref[0]
        dmerged = jax.lax.dot_general(
            gh_b, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [I, C]
        inv_colJ = isc_ref[0]  # [J, 1]
        col_head = jax.lax.broadcasted_iota(jnp.int32, (i, c), 1) // d
        for h in range(num_heads):
            dm_scratch[h * i : (h + 1) * i, :] = (
                jnp.where(col_head == h, dmerged, 0.0)
                * inv_colJ[h * i : (h + 1) * i, :]
            ).astype(dm_scratch.dtype)
        ety_scratch[:] = jnp.zeros_like(ety_scratch)
        tacc_scratch[:] = jnp.zeros_like(tacc_scratch)
        dse_ref[0] = jnp.zeros_like(dse_ref[0])
        dbe_ref[0] = jnp.zeros_like(dbe_ref[0])

    # --- shared tile recompute (both passes): logits + numerator only
    se = se_ref[0]
    y = (x.astype(jnp.float32) * se + be_ref[0]).astype(x.dtype)
    s = jax.lax.dot_general(
        y, qf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, J]
    e = jnp.exp(jnp.maximum(s - macc_ref[0], -80.0))
    e_b = e.astype(y.dtype)

    @pl.when(pz == 0)
    def _():
        ety_scratch[:] += jax.lax.dot_general(
            e_b, y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [J, C] e^T y

    @pl.when(jnp.logical_and(pz == 0, ni == nt - 1))
    def _():
        kvw_v = kvw_ref[c : 2 * c, :]  # [C(out a), C(in q)]
        ety_b = ety_scratch[:].astype(y.dtype)
        # pooled values: pacc[j, a] = (e^T y)[j, q] Wv[a, q]
        pacc = jax.lax.dot_general(
            ety_b, kvw_v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [J, C]
        inv_s = 1.0 / sacc_ref[0]  # [1, J]
        tacc_scratch[:] = jax.lax.dot_general(
            jnp.ones((1, c), jnp.float32),
            dm_scratch[:].astype(jnp.float32) * pacc,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_s
        pnorm = pacc * isc_ref[0]  # [J, C] fp32
        col_head = jax.lax.broadcasted_iota(jnp.int32, (i, c), 1) // d
        merged = jnp.zeros((i, c), jnp.float32)
        for h in range(num_heads):
            merged += jnp.where(
                col_head == h, pnorm[h * i : (h + 1) * i, :], 0.0
            )
        dwo_ref[:] += jax.lax.dot_general(
            gh_ref[0], merged.astype(y.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C(out), C(in)]
        # folded pass-1 operands: W2[q, j] = Wv[a, q] DMs[j, a];
        # W3[j, q] = DMs[j, a] Wv[a, q]
        w2_scratch[:] = jax.lax.dot_general(
            kvw_v, dm_scratch[:], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(w2_scratch.dtype)  # [C, J]
        w3_scratch[:] = jax.lax.dot_general(
            dm_scratch[:], kvw_v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(w3_scratch.dtype)  # [J, C]

    @pl.when(pz == 1)
    def _():
        dp_s = jax.lax.dot_general(
            y, w2_scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, J] = (v @ DMs^T) with v folded away
        ds = e * (dp_s - tacc_scratch[:]) * (
            s - macc_ref[0] > -80.0
        ).astype(jnp.float32)
        ds_b = ds.astype(y.dtype)
        dy = jax.lax.dot_general(
            ds_b, qf_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, C]
        dy += jax.lax.dot_general(
            e_b, w3_scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (e @ DMs) @ Wv with dv folded away
        dx_ref[0] = (dy * se).astype(dx_ref.dtype)
        dse_ref[0] += jnp.sum(dy * x.astype(jnp.float32), axis=0, keepdims=True)
        dbe_ref[0] += jnp.sum(dy, axis=0, keepdims=True)
        dqf_ref[:] += jax.lax.dot_general(
            y, ds_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C, J]

    @pl.when(jnp.logical_and(pz == 1, ni == nt - 1))
    def _():
        # dwv = dv^T y = DMs^T (e^T y), eTy reused from pass 0
        dwv_ref[:] += jax.lax.dot_general(
            dm_scratch[:], ety_scratch[:].astype(y.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C(out), C(in)]


def _pool_ext_bwd_impl(x, se, be, ind2, kvw, wo, g_h0, macc, sacc, num_heads):
    b, n, c = x.shape
    j, d = ind2.shape
    i = j // num_heads
    mode = _pool_bwd_mode(n, c, j, d)
    v1 = mode == "v1"
    v2j = mode in ("v2j", "v3")
    fixed = _pool_ext_bwd_fixed_bytes(c, j, d, v1, v2j)
    if mode == "v3":
        fixed += 4 * j * c  # bf16 W2 [C, J] + W3 [J, C] folded-operand scratch
    tn = _pick_tile_n(
        n, row_bytes=_pool_ext_bwd_row_bytes(c, j, v1),
        fixed_bytes=fixed,
        cap=_POOL_BWD_V3_TILE_CAP if mode == "v3" else 512,
    )
    tn = _tn_env("POOL_BWD", tn, n)
    naive = tn * _pool_ext_bwd_row_bytes(c, j, v1) + fixed
    qf = _fold_qf(ind2, kvw, num_heads).astype(x.dtype)
    kernel = {
        "v1": _pool_ext_bwd_kernel_v1,
        "v2": _pool_ext_bwd_kernel,
        "v2j": _pool_ext_bwd_kernel_v2j,
        "v3": _pool_ext_bwd_kernel_v3,
    }[mode]
    if v2j:
        # [J, 1] softmax-normaliser column (the in-kernel alternative is
        # an eye(J) matmul whose 4·J² VMEM gates v2 off at the 8k config)
        norm_ops = [jnp.swapaxes(1.0 / sacc, 1, 2)]
        norm_specs = [
            pl.BlockSpec((1, j, 1), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        norm_ops = [_eye(j), _eye(c, x.dtype)]
        norm_specs = [
            pl.BlockSpec((j, j), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        functools.partial(
            kernel,
            num_heads=num_heads,
            num_inducers=i,
        ),
        grid=(b, 2, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, pz, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, j), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            *norm_specs,
            pl.BlockSpec((1, i, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # dx is only written in pass 1; during pass 0 the map pins the
            # (bi, 0) block so no per-tile garbage blocks are flushed
            pl.BlockSpec((1, tn, c), lambda bi, pz, ni: (bi, pz * ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, j), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, j), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((j, c), x.dtype),
            # v1: per-head pooled values [J, D]; v2/v2j: full-width e^T v
            # [J, C]; v3: the e^T y accumulator (same shape)
            pltpu.VMEM((j, d if v1 else c), jnp.float32),
            pltpu.VMEM((1, j), jnp.float32),
        ] + (
            [pltpu.VMEM((c, j), x.dtype), pltpu.VMEM((j, c), x.dtype)]
            if mode == "v3" else []
        ),
        # the batch axis must be sequential: dqf/dwv/dwo accumulate
        # ACROSS batch elements into constant-index output blocks
        # (zeroed at bi==0) — cross-iteration dependencies along a
        # "parallel" axis are undefined (same reasoning as _mlp_bwd)
        compiler_params=_kernel_compiler_params(
            naive, semantics=("arbitrary", "arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(
        x, se[:, None, :], be[:, None, :], qf, kvw, wo, *norm_ops,
        g_h0, macc, sacc,
    )
    dx, dse, dbe, dqf, dwv, dwo = outs
    tie = 0.0 * (dse[0, 0, 0] + dbe[0, 0, 0] + dqf[0, 0] + dwv[0, 0] + dwo[0, 0])
    dx = dx.at[0, 0, 0].add(tie.astype(dx.dtype))  # in-place DCE tie

    # chain dqf through the fold jacobian (tiny; same algebra as the
    # resident backward)
    scale_qk = 1.0 / (d ** 0.5)
    dqf_r = dqf.reshape(c, num_heads, i)
    ind_r = ind2.reshape(num_heads, i, d).astype(jnp.float32)
    kvw_k = kvw[:c].reshape(num_heads, d, c).astype(jnp.float32)
    dwk = scale_qk * jnp.einsum("chi,hid->hdc", dqf_r, ind_r).reshape(c, c)
    dind2 = scale_qk * jnp.einsum("chi,hdc->hid", dqf_r, kvw_k).reshape(j, d)
    dkvw = jnp.concatenate([dwk, dwv], axis=0).astype(kvw.dtype)
    return (
        dx,
        dse[:, 0],
        dbe[:, 0],
        dind2.astype(ind2.dtype),
        dkvw,
        dwo.astype(wo.dtype),
    )


_pool_ext_bwd_p = custom_partitioning(_pool_ext_bwd_impl, static_argnums=(9,))


def _pool_ext_bwd_partition(num_heads, mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    stat_sh = NamedSharding(mesh, P(b, None, None))
    w_sh = NamedSharding(mesh, P(None, None))

    def impl(x, se, be, ind2, kvw, wo, g_h0, macc, sacc):
        outs = _pool_ext_bwd_impl(x, se, be, ind2, kvw, wo, g_h0, macc, sacc, num_heads)
        dx, dse, dbe, dind2, dkvw, dwo = outs
        if b is not None:
            dind2 = jax.lax.psum(dind2, b)
            dkvw = jax.lax.psum(dkvw, b)
            dwo = jax.lax.psum(dwo, b)
        return dx, dse, dbe, dind2, dkvw, dwo

    return (
        mesh,
        impl,
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh),
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh, x_sh, stat_sh, stat_sh),
    )


def _pool_ext_bwd_infer(num_heads, mesh, arg_shapes, result_shape):
    b = _spec_dim(arg_shapes[0].sharding, 0)
    x_sh = NamedSharding(mesh, P(b, None, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    w_sh = NamedSharding(mesh, P(None, None))
    return (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh)


_pool_ext_bwd_p.def_partition(
    _pool_ext_bwd_partition,
    infer_sharding_from_operands=_pool_ext_bwd_infer,
    sharding_rule=(
        "b n c, b c, b c, j d, e c1, c2 c3, b i c4, b u j1, b u1 j2 "
        "-> b n c, b c, b c, j d, e c1, c2 c3"
    ),
    need_replication_factors=(
        "n", "c", "j", "d", "e", "c1", "c2", "c3", "i", "c4", "u", "j1",
        "u1", "j2",
    ),
)


def _pool_ext_ref(x, se, be, ind2, kvw, wo, num_heads):
    """XLA twin of ``_pool_ext_impl`` (h0 only)."""
    y = (x.astype(jnp.float32) * se[:, None, :] + be[:, None, :]).astype(x.dtype)
    h0, _, _ = _pool_ref(
        y, jnp.ones_like(se), jnp.zeros_like(be), ind2, kvw, wo, 1, num_heads,
        prenorm=False,
    )
    return h0


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def folded_pool_ext(x, se, be, ind2, kvw, wo, num_heads):
    """Tiled online-softmax pool: works at any N (no VMEM gate). The
    pre-norm is external — pass the collapsed ``x * se + be`` affine."""
    h0, _, _ = _pool_ext_p(x, se, be, ind2, kvw, wo, num_heads)
    return h0


def _pool_ext_fwd(x, se, be, ind2, kvw, wo, num_heads):
    h0, macc, sacc = _pool_ext_p(x, se, be, ind2, kvw, wo, num_heads)
    return h0, (x, se, be, ind2, kvw, wo, macc, sacc)


def _pool_ext_bwd(num_heads, res, g):
    x, se, be, ind2, kvw, wo, macc, sacc = res
    n, c = x.shape[1], x.shape[2]
    j, d = ind2.shape
    mode = _pool_bwd_mode(n, c, j, d)
    v1 = mode == "v1"
    fixed = _pool_ext_bwd_fixed_bytes(c, j, d, v1, mode in ("v2j", "v3"))
    if mode == "v3":
        fixed += 4 * j * c
    fits = _tile_fits(
        n, _pool_ext_bwd_row_bytes(c, j, v1), fixed,
        cap=_POOL_BWD_V3_TILE_CAP if mode == "v3" else 512,
    )
    if _twin_bwd("pool") or not fits:
        _, vjp = jax.vjp(
            lambda *a: _pool_ext_ref(*a, num_heads), x, se, be, ind2, kvw, wo
        )
        return vjp(g)
    # bf16 cotangent truncation is intentional — see the note in _pool_bwd
    return _pool_ext_bwd_p(
        x, se, be, ind2, kvw, wo, g.astype(x.dtype), macc, sacc, num_heads
    )


folded_pool_ext.defvjp(_pool_ext_fwd, _pool_ext_bwd)


# ---------------------------------------------------------------- unpool --


def _unpool_kernel(
    x_ref, se_ref, be_ref, k_ref, v_ref, wq_ref, wo_ref, bmap_ref,
    bmapt_ref,
    o_ref, sums_ref,
    kft_scratch, vf_scratch, brow_scratch,
    *, num_heads: int, scale_qk: float, residual: bool, prenorm: bool,
):
    x = x_ref[0]  # [TN, C]
    c = x.shape[-1]
    d = c // num_heads
    i = k_ref.shape[1]
    tn = x.shape[0]

    ni = pl.program_id(1)

    # fold q/out projections against the inducer-state k/v once per batch
    # element (scratch persists across the point-tile steps of one batch).
    # The pre-norm affine is folded in too: with y = x*se + be,
    # y @ kf == x @ (se-scaled kf) + (be @ kf) — scaling wq's columns by se
    # before the fold and accumulating the bias row once per batch removes
    # the [TN, C] convert/FMA/cast pre-norm pass from every point tile.
    # (A full-width masked-matmul fold — one-hot head expansion + two
    # [J,C']x[C',C] matmuls — was tried in round 4 and measured SLOWER:
    # +0.13 ms/layer; it trades the small per-head matmuls for ~8x the
    # prologue MXU FLOPs.)
    @pl.when(ni == 0)
    def _():
        for h in range(num_heads):
            wq_h = wq_ref[h * d : (h + 1) * d, :]  # [D, C]
            if prenorm:
                wq_s = (wq_h.astype(jnp.float32) * se_ref[0]).astype(x.dtype)
            else:
                wq_s = wq_h
            k_h = k_ref[0][:, h * d : (h + 1) * d]  # [I, D]
            kft_scratch[h * i : (h + 1) * i, :] = (
                scale_qk
                * jax.lax.dot_general(
                    k_h, wq_s, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ).astype(kft_scratch.dtype)  # [I, C] rows of kft [J, C]
            if prenorm:
                bq_h = jax.lax.dot_general(
                    be_ref[0], wq_h.astype(jnp.float32), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [1, D]
                brow_scratch[:, h * i : (h + 1) * i] = (
                    scale_qk
                    * jax.lax.dot_general(
                        bq_h, k_h.astype(jnp.float32), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # [1, I]
            else:
                brow_scratch[:, h * i : (h + 1) * i] = jnp.zeros((1, i), jnp.float32)
            v_h = v_ref[0][:, h * d : (h + 1) * d]  # [I, D]
            wo_h = wo_ref[:, h * d : (h + 1) * d]  # [C, D]
            vf_scratch[h * i : (h + 1) * i, :] = jax.lax.dot_general(
                v_h, wo_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(vf_scratch.dtype)

    @pl.when(ni == 0)
    def _():
        sums_ref[0] = jnp.zeros_like(sums_ref[0])

    # software-pipelined tile body (chunk k+1's logits matmul on the MXU
    # overlaps chunk k's softmax on the VPU; 8-way measured 1.111 -> 1.005
    # ms/layer). DEFAULT IS 1 (unchunked): flagship training went NaN at
    # step 2600 with default chunks and was clean unchunked — see the pool
    # kernel's note and BASELINE.md round-4; opt back in via
    # GECCO_PIPELINE_CHUNKS for inference experiments only.
    nchunk = _pipeline_chunks(1, tn)
    step = tn // nchunk
    halves = tuple(slice(q * step, (q + 1) * step) for q in range(nchunk))
    bmap = bmap_ref[:]
    bmapt = bmapt_ref[:]
    kft = kft_scratch[:]
    vf = vf_scratch[:]
    brow = brow_scratch[:]

    ss = [
        jax.lax.dot_general(
            x[sl], kft, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + brow
        for sl in halves
    ]
    ps = [
        _blockwise_softmax_lastaxis(s, i, bmap, bmapt=bmapt if _SOFTMAX_R4 else None)
        for s in ss
    ]
    attns = [
        jax.lax.dot_general(
            p.astype(x.dtype), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for p in ps
    ]
    s12 = jnp.zeros((2, c), jnp.float32)
    for sl, attn in zip(halves, attns):
        if residual:
            attn = x[sl].astype(jnp.float32) + attn
        o_ref[0, sl] = attn.astype(o_ref.dtype)
        # accumulate s1/s2 of the OUTPUT for the next norm's statistics
        s1 = jnp.sum(attn, axis=0, keepdims=True)  # [1, C] fp32
        s2 = jnp.sum(attn * attn, axis=0, keepdims=True)
        s12 = s12 + jnp.concatenate([s1, s2], axis=0)
    sums_ref[0] += s12


def _unpool_impl(x, se, be, k, v, wq, wo, num_heads, residual=True, prenorm=True):
    """x [B, N, C]; se/be [B, C] fp32 (collapsed pre-norm); k/v [B, I, C]
    (inducer-state projections); wq/wo [C, C]
    -> (x + attn(x * se + be), output channel sums [B, 2, C] fp32)."""
    b, n, c = x.shape
    i = k.shape[1]
    j = num_heads * i
    d = c // num_heads
    # cap 1024. The 2048-point tile (a whole flagship batch element per
    # tile, round 4) measured 1.005 -> 0.912 ms/layer, but every round-4
    # flagship training run with it diverged to NaN once trained logit
    # magnitudes drifted — step 2600 (chunked bodies) and step 4700
    # (unchunked, runs/r4b_flagship.log), loss healthy until the step
    # before. The GECCO_TN_UNPOOL=1024 arm ALSO diverged, later (step
    # 11300, runs/r4b_flagship_tn1024.log) — but that arm still carried
    # the round-4 softmax formulation, so the bisect is confounded between
    # tile size and softmax machinery; both were reverted to the round-3
    # defaults (this cap + the r3 softmax in _blockwise_softmax_lastaxis).
    # Likely the same failure class as the round-2 64-wide lane-slice
    # reduction miscompile: only large kernel bodies, only at trained
    # magnitudes. GECCO_TN_UNPOOL=2048 re-enables the big tile for
    # inference experiments.
    tn = _tn_env("UNPOOL", _pick_tile_n(n, row_bytes=_unpool_row_bytes(c, j),
                 fixed_bytes=_unpool_fixed_bytes(c, j, i), cap=1024), n)
    naive = tn * _unpool_row_bytes(c, j) + _unpool_fixed_bytes(c, j, i)
    if os.environ.get("GECCO_DEBUG_TILES"):
        print(f"[gecco_tpu] unpool tile: b={b} n={n} c={c} j={j} tn={tn} "
              f"naive={naive / 2**20:.2f}MiB", file=sys.stderr)
    compiler_params = _kernel_compiler_params(naive)
    out, sums = pl.pallas_call(
        functools.partial(
            _unpool_kernel,
            num_heads=num_heads,
            scale_qk=1.0 / (d ** 0.5),
            residual=residual,
            prenorm=prenorm,
        ),
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((j, num_heads), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            # when the r4 softmax is off, the kernel never reads bmapt —
            # ship a [1, 128] dummy instead of DMA-ing the dead [H, J] map
            pl.BlockSpec(
                (num_heads, j) if _SOFTMAX_R4 else (1, 128),
                lambda bi, ni: (0, 0), memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((j, c), x.dtype),
            pltpu.VMEM((j, c), x.dtype),
            pltpu.VMEM((1, j), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=_interpret(),
    )(
        x, se[:, None, :], be[:, None, :], k, v, wq, wo,
        block_map(j, num_heads),
        block_map(j, num_heads).T if _SOFTMAX_R4
        else jnp.zeros((1, 128), jnp.float32),
    )
    # tie outputs against pallas-output DCE (axon Mosaic bug); the in-place
    # single-element form — the old full-tensor `out + 0*sums[0,0,0]` cost a
    # ~1 ms [B, N, C] elementwise pass per denoiser eval (xprof, round 3)
    out = out.at[0, 0, 0].add((0.0 * sums[0, 0, 0]).astype(out.dtype))
    return out, sums


_unpool_p = custom_partitioning(_unpool_impl, static_argnums=(7, 8, 9))


def _unpool_partition(num_heads, residual, prenorm, mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    x_sh = NamedSharding(mesh, P(b, n, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    kv_sh = NamedSharding(mesh, P(b, None, None))
    w_sh = NamedSharding(mesh, P(None, None))
    sums_sh = NamedSharding(mesh, P(b, None, None))
    impl = lambda *a: _unpool_impl(*a, num_heads, residual, prenorm)
    if n is not None:
        # point-sharded: each shard's kernel emits PARTIAL sums; reduce them
        def impl(*a):
            out, sums = _unpool_impl(*a, num_heads, residual, prenorm)
            sums = jax.lax.psum(sums, n)
            return out, sums

    return (
        mesh,
        impl,
        (x_sh, sums_sh),
        (x_sh, vec_sh, vec_sh, kv_sh, kv_sh, w_sh, w_sh),
    )


def _unpool_infer(num_heads, residual, prenorm, mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    return (
        NamedSharding(mesh, P(b, n, None)),
        NamedSharding(mesh, P(b, None, None)),
    )


_unpool_p.def_partition(
    _unpool_partition,
    infer_sharding_from_operands=_unpool_infer,
    sharding_rule="b n c, b c, b c, b i c1, b i c2, c3 c4, c5 c6 -> b n c, b t c",
    need_replication_factors=("c", "i", "c1", "c2", "c3", "c4", "c5", "c6", "t"),
)


def _unpool_bwd_kernel(
    x_ref, se_ref, be_ref, k_ref, v_ref, wq_ref, wo_ref, bmap_ref,
    bmapt_ref,
    g_ref, gs_ref,
    dx_ref, dkf_ref, dvf_ref, dse_ref, dbe_ref,
    kft_scratch, vf_scratch,
    *, num_heads: int, scale_qk: float, residual: bool, prenorm: bool,
):
    """Backward of the fused unpool: recompute the forward per tile in VMEM
    (folded operands in scratch, logits, softmax, output incl. residual),
    then the softmax/value/pre-norm backward — per-block statistics via the
    same one-hot indicator matmuls as the forward. The folded-operand
    cotangents (d_kf, d_vf) accumulate per batch element; the caller chains
    them through the (tiny) fold jacobians to dk/dv/dwq/dwo in XLA."""
    x = x_ref[0]  # [TN, C]
    c = x.shape[-1]
    d = c // num_heads
    i = k_ref.shape[1]
    ni = pl.program_id(1)

    # same per-head fold as the forward kernel, in kft [J, C] row layout
    # (the se column scaling is NOT folded here: the backward needs y
    # explicitly)
    @pl.when(ni == 0)
    def _():
        for h in range(num_heads):
            wq_h = wq_ref[h * d : (h + 1) * d, :]
            k_h = k_ref[0][:, h * d : (h + 1) * d]
            kft_scratch[h * i : (h + 1) * i, :] = (
                scale_qk
                * jax.lax.dot_general(
                    k_h, wq_h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ).astype(kft_scratch.dtype)  # [I, C] rows of kft [J, C]
            v_h = v_ref[0][:, h * d : (h + 1) * d]
            wo_h = wo_ref[:, h * d : (h + 1) * d]
            vf_scratch[h * i : (h + 1) * i, :] = jax.lax.dot_general(
                v_h, wo_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(vf_scratch.dtype)

    if prenorm:
        se = se_ref[0]
        y = (x.astype(jnp.float32) * se + be_ref[0]).astype(x.dtype)
    else:
        y = x
    bmap = bmap_ref[:]
    s = jax.lax.dot_general(
        y, kft_scratch[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p, act = _blockwise_softmax_lastaxis(
        s, i, bmap, return_active=True,
        bmapt=bmapt_ref[:] if _SOFTMAX_R4 else None,
    )
    p_b = p.astype(y.dtype)
    attn = jax.lax.dot_general(
        p_b, vf_scratch[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if residual:
        attn = x.astype(jnp.float32) + attn

    # cotangent of the (fp32) output incl. the sums outputs
    g = g_ref[0].astype(jnp.float32)
    gs1 = gs_ref[0, 0:1, :]  # [1, C]
    gs2 = gs_ref[0, 1:2, :]
    d_attn = g + gs1 + 2.0 * attn * gs2
    d_attn_b = d_attn.astype(y.dtype)

    # value side
    dp = jax.lax.dot_general(
        d_attn_b, vf_scratch[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, J]
    # softmax backward per block: ds = p * (dp - blocksum(dp * p))
    t = jax.lax.dot_general(
        dp * p, bmap, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TN, nb]
    t_exp = jax.lax.dot_general(
        t, bmap, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - t_exp) * act  # clamp-masked jacobian (see softmax docstring)
    ds_b = ds.astype(y.dtype)

    dy = jax.lax.dot_general(
        ds_b, kft_scratch[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, C]

    if prenorm:
        dx = dy * se
        if residual:
            dx = dx + d_attn
    else:
        dx = dy + d_attn if residual else dy
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(ni == 0)
    def _():
        dkf_ref[0] = jnp.zeros_like(dkf_ref[0])
        dvf_ref[0] = jnp.zeros_like(dvf_ref[0])
        dse_ref[0] = jnp.zeros_like(dse_ref[0])
        dbe_ref[0] = jnp.zeros_like(dbe_ref[0])

    dkf_ref[0] += jax.lax.dot_general(
        y, ds_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [C, J]
    dvf_ref[0] += jax.lax.dot_general(
        p_b, d_attn_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [J, C]
    if prenorm:
        dse_ref[0] += jnp.sum(dy * x.astype(jnp.float32), axis=0, keepdims=True)
        dbe_ref[0] += jnp.sum(dy, axis=0, keepdims=True)


def _unpool_bwd_impl(x, se, be, k, v, wq, wo, g, g_sums, num_heads, residual, prenorm):
    b, n, c = x.shape
    i = k.shape[1]
    j = num_heads * i
    d = c // num_heads
    tn = _pick_tile_n(n, row_bytes=_unpool_bwd_row_bytes(c, j),
                      fixed_bytes=_unpool_bwd_fixed_bytes(c, j, i), cap=512)
    naive = tn * _unpool_bwd_row_bytes(c, j) + _unpool_bwd_fixed_bytes(c, j, i)
    outs = pl.pallas_call(
        functools.partial(
            _unpool_bwd_kernel,
            num_heads=num_heads,
            scale_qk=1.0 / (d ** 0.5),
            residual=residual,
            prenorm=prenorm,
        ),
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((j, num_heads), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_heads, j) if _SOFTMAX_R4 else (1, 128),
                lambda bi, ni: (0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, j), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, c, j), jnp.float32),
            jax.ShapeDtypeStruct((b, j, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((j, c), x.dtype),
            pltpu.VMEM((j, c), x.dtype),
        ],
        compiler_params=_kernel_compiler_params(naive),
        interpret=_interpret(),
    )(
        x, se[:, None, :], be[:, None, :], k, v, wq, wo,
        block_map(j, num_heads),
        block_map(j, num_heads).T if _SOFTMAX_R4
        else jnp.zeros((1, 128), jnp.float32),
        g, g_sums,
    )
    dx, dkf, dvf, dse, dbe = outs
    tie = 0.0 * (dkf[0, 0, 0] + dvf[0, 0, 0] + dse[0, 0, 0] + dbe[0, 0, 0])
    dx = dx.at[0, 0, 0].add(tie.astype(dx.dtype))  # in-place DCE tie

    # chain the folded-operand cotangents through the fold jacobians (tiny)
    dt = x.dtype
    scale_qk = 1.0 / (d ** 0.5)
    wq_r = wq.astype(dt).reshape(num_heads, d, c)
    wo_r = wo.astype(dt).reshape(c, num_heads, d)
    dkf_r = dkf.reshape(b, c, num_heads, i)
    dvf_r = dvf.reshape(b, num_heads, i, c)
    k_r = k.reshape(b, i, num_heads, d)
    v_r = v.reshape(b, i, num_heads, d)
    dk = scale_qk * jnp.einsum(
        "hdc,bchi->bihd", wq_r.astype(jnp.float32), dkf_r
    ).reshape(b, i, c).astype(k.dtype)
    dwq = scale_qk * jnp.einsum(
        "bihd,bchi->hdc", k_r.astype(jnp.float32), dkf_r
    ).reshape(c, c).astype(wq.dtype)
    dv = jnp.einsum(
        "chd,bhic->bihd", wo_r.astype(jnp.float32), dvf_r
    ).reshape(b, i, c).astype(v.dtype)
    dwo = jnp.einsum(
        "bihd,bhic->chd", v_r.astype(jnp.float32), dvf_r
    ).reshape(c, c).astype(wo.dtype)
    return dx, dse[:, 0], dbe[:, 0], dk, dv, dwq, dwo


_unpool_bwd_p = custom_partitioning(_unpool_bwd_impl, static_argnums=(9, 10, 11))


def _unpool_bwd_partition(num_heads, residual, prenorm, mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    x_sh = NamedSharding(mesh, P(b, n, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    kv_sh = NamedSharding(mesh, P(b, None, None))
    w_sh = NamedSharding(mesh, P(None, None))
    sums_sh = NamedSharding(mesh, P(b, None, None))

    def impl(x, se, be, k, v, wq, wo, g, g_sums):
        outs = _unpool_bwd_impl(
            x, se, be, k, v, wq, wo, g, g_sums, num_heads, residual, prenorm
        )
        dx, dse, dbe, dk, dv, dwq, dwo = outs
        if n is not None:
            dse = jax.lax.psum(dse, n)
            dbe = jax.lax.psum(dbe, n)
            dk = jax.lax.psum(dk, n)
            dv = jax.lax.psum(dv, n)
        for ax in (b, n):
            if ax is not None:
                dwq = jax.lax.psum(dwq, ax)
                dwo = jax.lax.psum(dwo, ax)
        return dx, dse, dbe, dk, dv, dwq, dwo

    return (
        mesh,
        impl,
        (x_sh, vec_sh, vec_sh, kv_sh, kv_sh, w_sh, w_sh),
        (x_sh, vec_sh, vec_sh, kv_sh, kv_sh, w_sh, w_sh, x_sh, sums_sh),
    )


def _unpool_bwd_infer(num_heads, residual, prenorm, mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    x_sh = NamedSharding(mesh, P(b, n, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    kv_sh = NamedSharding(mesh, P(b, None, None))
    w_sh = NamedSharding(mesh, P(None, None))
    return (x_sh, vec_sh, vec_sh, kv_sh, kv_sh, w_sh, w_sh)


_unpool_bwd_p.def_partition(
    _unpool_bwd_partition,
    infer_sharding_from_operands=_unpool_bwd_infer,
    sharding_rule=(
        "b n c, b c, b c, b i c1, b i c2, c3 c4, c5 c6, b n c7, b t c8 "
        "-> b n c, b c, b c, b i c1, b i c2, c3 c4, c5 c6"
    ),
    need_replication_factors=(
        "c", "i", "c1", "c2", "c3", "c4", "c5", "c6", "c7", "t", "c8"
    ),
)


def _unpool_ref(x, se, be, k, v, wq, wo, num_heads, residual=True, prenorm=True):
    """XLA twin of ``_unpool_impl``."""
    b, n, c = x.shape
    i = k.shape[1]
    j = num_heads * i
    d = c // num_heads
    scale_qk = 1.0 / (d ** 0.5)
    if prenorm:
        y = (x.astype(jnp.float32) * se[:, None, :] + be[:, None, :]).astype(x.dtype)
    else:
        y = x
    kf = scale_qk * jnp.einsum(
        "hdc,bihd->bchi",
        wq.astype(y.dtype).reshape(num_heads, d, c),
        k.reshape(b, i, num_heads, d),
        preferred_element_type=jnp.float32,
    ).reshape(b, c, j).astype(y.dtype)
    vf = jnp.einsum(
        "bihd,chd->bhic",
        v.reshape(b, i, num_heads, d),
        wo.astype(y.dtype).reshape(c, num_heads, d),
        preferred_element_type=jnp.float32,
    ).reshape(b, j, c).astype(y.dtype)
    logits = jnp.einsum("bnc,bcj->bnj", y, kf, preferred_element_type=jnp.float32)
    lg = logits.reshape(b, n, num_heads, i)
    lg = lg - jax.lax.stop_gradient(lg.max(axis=-1, keepdims=True))
    p = jnp.exp(lg)
    p = (p / p.sum(axis=-1, keepdims=True)).reshape(b, n, j)
    attn = jnp.einsum(
        "bnj,bjc->bnc", p.astype(y.dtype), vf, preferred_element_type=jnp.float32
    )
    if residual:
        attn = x.astype(jnp.float32) + attn
    out = attn.astype(x.dtype)
    s1 = attn.sum(axis=1)
    s2 = (attn * attn).sum(axis=1)
    return out, jnp.stack([s1, s2], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def folded_unpool(x, se, be, k, v, wq, wo, num_heads, residual=True, prenorm=True):
    return _unpool_p(x, se, be, k, v, wq, wo, num_heads, residual, prenorm)


def _unpool_fwd(x, se, be, k, v, wq, wo, num_heads, residual, prenorm):
    out = _unpool_p(x, se, be, k, v, wq, wo, num_heads, residual, prenorm)
    return out, (x, se, be, k, v, wq, wo)


def _unpool_bwd(num_heads, residual, prenorm, res, g):
    x, se, be, k, v, wq, wo = res
    n, c = x.shape[1], x.shape[2]
    i = k.shape[1]
    j = num_heads * i
    fits = _tile_fits(
        n, _unpool_bwd_row_bytes(c, j),
        _unpool_bwd_fixed_bytes(c, j, i), cap=512,
    )
    if _twin_bwd("unpool") or not fits:
        _, vjp = jax.vjp(
            lambda *a: _unpool_ref(*a, num_heads, residual, prenorm),
            x, se, be, k, v, wq, wo,
        )
        return vjp(g)
    g_out, g_sums = g
    # bf16 cotangent truncation is intentional — see the note in _pool_bwd
    return _unpool_bwd_p(
        x, se, be, k, v, wq, wo,
        g_out.astype(x.dtype), g_sums.astype(jnp.float32),
        num_heads, residual, prenorm,
    )


folded_unpool.defvjp(_unpool_fwd, _unpool_bwd)


# ------------------------------------------------------------- fused mlp --


def _mlp_kernel(
    x_ref, se_ref, be_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, sums_ref
):
    ni = pl.program_id(1)
    x = x_ref[0]  # [TN, C]
    y = (x.astype(jnp.float32) * se_ref[0] + be_ref[0]).astype(x.dtype)
    h = jax.lax.dot_general(
        y, w1t_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:]  # [TN, W], alpha already folded into w1t/b1 by the caller
    g = jnp.exp(-0.5 * h * h).astype(y.dtype)  # Gaussian activation
    out = jax.lax.dot_general(
        g, w2t_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[:]
    o = x.astype(jnp.float32) + out
    o_ref[0] = o.astype(o_ref.dtype)

    # accumulate s1/s2 of the OUTPUT — the next layer's pool pre-norm gets
    # its GroupNorm statistics for free (same pattern as the unpool kernel)
    @pl.when(ni == 0)
    def _():
        sums_ref[0] = jnp.zeros_like(sums_ref[0])

    s1 = jnp.sum(o, axis=0, keepdims=True)  # [1, C] fp32
    s2 = jnp.sum(o * o, axis=0, keepdims=True)
    sums_ref[0] += jnp.concatenate([s1, s2], axis=0)  # [2, C]


def _mlp_impl(x, se, be, w1t, b1, w2t, b2):
    """x [B,N,C]; w1t [C,W], b1 [1,W] (alpha-folded); w2t [W,C], b2 [1,C]
    (normalized-activation-folded) -> (x + mlp(x * se + be),
    output channel sums [B, 2, C] fp32)."""
    b, n, c = x.shape
    w = w1t.shape[-1]
    tn = _tn_env("MLP", _pick_tile_n(n, row_bytes=_mlp_row_bytes(c, w),
                 fixed_bytes=_mlp_fixed_bytes(c, w)), n)
    naive = tn * _mlp_row_bytes(c, w) + _mlp_fixed_bytes(c, w)
    out, sums = pl.pallas_call(
        _mlp_kernel,
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        ],
        compiler_params=_kernel_compiler_params(naive),
        interpret=_interpret(),
    )(x, se[:, None, :], be[:, None, :], w1t, b1, w2t, b2)
    # tie outputs against pallas-output DCE (axon Mosaic bug), in-place form
    out = out.at[0, 0, 0].add((0.0 * sums[0, 0, 0]).astype(out.dtype))
    return out, sums


_mlp_p = custom_partitioning(_mlp_impl)


def _mlp_partition(mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    x_sh = NamedSharding(mesh, P(b, n, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    w_sh = NamedSharding(mesh, P(None, None))
    sums_sh = NamedSharding(mesh, P(b, None, None))
    impl = _mlp_impl
    if n is not None:
        # point-sharded: each shard's kernel emits PARTIAL sums; reduce them
        def impl(*a):
            out, sums = _mlp_impl(*a)
            return out, jax.lax.psum(sums, n)

    return (
        mesh,
        impl,
        (x_sh, sums_sh),
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh, w_sh),
    )


def _mlp_infer(mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    return (
        NamedSharding(mesh, P(b, n, None)),
        NamedSharding(mesh, P(b, None, None)),
    )


_mlp_p.def_partition(
    _mlp_partition,
    infer_sharding_from_operands=_mlp_infer,
    sharding_rule="b n c, b c, b c, c w, u w, w c1, u1 c1 -> b n c1, b t c1",
    need_replication_factors=("c", "w", "u", "c1", "u1", "t"),
)


def _mlp_bwd_kernel(
    x_ref, se_ref, be_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, g_ref, gs_ref,
    dx_ref, dse_ref, dbe_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
):
    """Backward of the fused MLP, recomputing the forward per tile in VMEM.

    Weight gradients accumulate in fp32 output blocks whose index map is
    constant over the whole (b, n-tile) grid; dse/dbe accumulate per batch
    element over its point tiles. The XLA twin's backward round-trips two
    [B, N, W] intermediates through HBM (~1.6 GB/layer at flagship shapes);
    this keeps them in VMEM. The sums-output cotangent (gs) folds into the
    effective output cotangent as g + gs1 + 2*o*gs2, which needs the output
    o recomputed (one extra [TN, W] x [W, C] matmul per tile).
    """
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    ni = pl.program_id(1)

    x = x_ref[0]  # [TN, C]
    se = se_ref[0]  # [1, C] fp32
    yf = x.astype(jnp.float32) * se + be_ref[0]
    y = yf.astype(x.dtype)
    h = jax.lax.dot_general(
        y, w1t_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:]  # [TN, W]
    a = jnp.exp(-0.5 * h * h)  # fp32
    a_b = a.astype(y.dtype)

    o = jax.lax.dot_general(
        a_b, w2t_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[:] + x.astype(jnp.float32)  # [TN, C] forward output
    gs1 = gs_ref[0, 0:1, :]  # [1, C]
    gs2 = gs_ref[0, 1:2, :]
    g = g_ref[0].astype(jnp.float32) + gs1 + 2.0 * o * gs2  # [TN, C]

    gb = g.astype(y.dtype)
    # da = g @ w2t^T ; dh = da * a * (-h)
    da = jax.lax.dot_general(
        gb, w2t_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TN, W]
    dh = da * a * (-h)
    dh_b = dh.astype(y.dtype)
    # dy = dh @ w1t^T ; dx = g + dy * se
    dy = jax.lax.dot_general(
        dh_b, w1t_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TN, C]
    dx_ref[0] = (g + dy * se).astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # weight grads: accumulate over the whole grid
    dw1t_ref[:] += jax.lax.dot_general(
        y, dh_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
    dw2t_ref[:] += jax.lax.dot_general(
        a_b, gb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[:] += jnp.sum(g, axis=0, keepdims=True)

    # pre-norm affine grads: accumulate per batch element over point tiles
    @pl.when(ni == 0)
    def _():
        dse_ref[0] = jnp.zeros_like(dse_ref[0])
        dbe_ref[0] = jnp.zeros_like(dbe_ref[0])

    dse_ref[0] += jnp.sum(dy * x.astype(jnp.float32), axis=0, keepdims=True)
    dbe_ref[0] += jnp.sum(dy, axis=0, keepdims=True)


def _mlp_bwd_impl(x, se, be, w1t, b1, w2t, b2, g, g_sums):
    b, n, c = x.shape
    w = w1t.shape[-1]
    tn = _pick_tile_n(n, row_bytes=_mlp_bwd_row_bytes(c, w),
                      fixed_bytes=_mlp_bwd_fixed_bytes(c, w), cap=512)
    naive = tn * _mlp_bwd_row_bytes(c, w) + _mlp_bwd_fixed_bytes(c, w)
    # 8k-config widths (C=768, W=3072): the fp32 weight-grad blocks alone
    # are ~19 MB — over Mosaic's default 16 MB scoped-VMEM window but far
    # under the chip's 128 MB VMEM, and the 8k activations are HBM-resident
    # anyway (the [16, 8192, 768] carry cannot be VMEM-parked), so widening
    # the window for THIS kernel evicts nothing. This replaces the round-3
    # shape gate to the XLA twin (round-4 VERDICT #2).
    compiler_params = _kernel_compiler_params(
        naive, semantics=("arbitrary", "arbitrary")
    )
    outs = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, w), jnp.float32),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
            jax.ShapeDtypeStruct((w, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=_interpret(),
    )(x, se[:, None, :], be[:, None, :], w1t, b1, w2t, b2, g, g_sums)
    dx, dse, dbe, dw1t, db1, dw2t, db2 = outs
    # tie outputs against pallas-output DCE (axon Mosaic bug) — in-place form
    tie = 0.0 * (dse[0, 0, 0] + dw1t[0, 0] + dw2t[0, 0] + db1[0, 0] + db2[0, 0] + dbe[0, 0, 0])
    dx = dx.at[0, 0, 0].add(tie.astype(dx.dtype))
    return (
        dx,
        dse[:, 0],
        dbe[:, 0],
        dw1t.astype(w1t.dtype),
        db1[0].astype(b1.dtype) if b1.ndim == 1 else db1.astype(b1.dtype),
        dw2t.astype(w2t.dtype),
        db2[0].astype(b2.dtype) if b2.ndim == 1 else db2.astype(b2.dtype),
    )


def _mlp_ref(x, se, be, w1t, b1, w2t, b2):
    y = (x.astype(jnp.float32) * se[:, None, :] + be[:, None, :]).astype(x.dtype)
    h = (
        jnp.einsum("bnc,cw->bnw", y, w1t, preferred_element_type=jnp.float32)
        + b1[None]
    )
    g = jnp.exp(-0.5 * h * h).astype(y.dtype)
    out = (
        jnp.einsum("bnw,wc->bnc", g, w2t, preferred_element_type=jnp.float32)
        + b2[None]
    )
    o = x.astype(jnp.float32) + out
    s1 = o.sum(axis=1)
    s2 = (o * o).sum(axis=1)
    return o.astype(x.dtype), jnp.stack([s1, s2], axis=1)


_mlp_bwd_p = custom_partitioning(_mlp_bwd_impl)


def _mlp_bwd_partition(mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    x_sh = NamedSharding(mesh, P(b, n, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    w_sh = NamedSharding(mesh, P(None, None))

    def impl(x, se, be, w1t, b1, w2t, b2, g, g_sums):
        outs = _mlp_bwd_impl(x, se, be, w1t, b1, w2t, b2, g, g_sums)
        dx, dse, dbe, dw1t, db1, dw2t, db2 = outs
        # weight grads reduce over BOTH sharded axes; affine grads over n
        for ax in (b, n):
            if ax is not None:
                dw1t = jax.lax.psum(dw1t, ax)
                db1 = jax.lax.psum(db1, ax)
                dw2t = jax.lax.psum(dw2t, ax)
                db2 = jax.lax.psum(db2, ax)
        if n is not None:
            dse = jax.lax.psum(dse, n)
            dbe = jax.lax.psum(dbe, n)
        return dx, dse, dbe, dw1t, db1, dw2t, db2

    return (
        mesh,
        impl,
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh, w_sh),
        (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh, w_sh, x_sh,
         NamedSharding(mesh, P(b, None, None))),
    )


def _mlp_bwd_infer(mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    x_sh = NamedSharding(mesh, P(b, n, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    w_sh = NamedSharding(mesh, P(None, None))
    return (x_sh, vec_sh, vec_sh, w_sh, w_sh, w_sh, w_sh)


_mlp_bwd_p.def_partition(
    _mlp_bwd_partition,
    infer_sharding_from_operands=_mlp_bwd_infer,
    sharding_rule=(
        "b n c, b c, b c, c w, u w, w c1, u1 c1, b n c2, b t c3 "
        "-> b n c, b c, b c, c w, u w, w c1, u1 c1"
    ),
    need_replication_factors=("c", "w", "u", "c1", "u1", "c2", "t", "c3"),
)


@jax.custom_vjp
def fused_mlp_residual(x, se, be, w1t, b1, w2t, b2):
    """-> (x + mlp(x*se+be), output channel sums [B, 2, C] fp32). The sums
    feed the NEXT layer's pool pre-norm statistics (free stats chaining)."""
    return _mlp_p(x, se, be, w1t, b1, w2t, b2)


def _mlp_fwd(x, se, be, w1t, b1, w2t, b2):
    return _mlp_p(x, se, be, w1t, b1, w2t, b2), (x, se, be, w1t, b1, w2t, b2)


def _mlp_bwd(res, g):
    x, se, be, w1t, b1, w2t, b2 = res
    g_out, g_sums = g
    n, c = x.shape[1], x.shape[2]
    w = w1t.shape[-1]
    # at 8k-config widths the fp32 weight-grad blocks exceed the default
    # scoped-VMEM window; _mlp_bwd_impl widens the window for that case
    # (vmem_limit_bytes) — only shapes beyond even the widened ceiling
    # fall back to the XLA twin (same function, HBM-resident grads)
    tn = _pick_tile_n(n, _mlp_bwd_row_bytes(c, w), _mlp_bwd_fixed_bytes(c, w), cap=512)
    naive = tn * _mlp_bwd_row_bytes(c, w) + _mlp_bwd_fixed_bytes(c, w)
    fits = naive <= _VMEM_WIDE_NAIVE_CEILING
    if _twin_bwd("mlp") or not fits:
        _, vjp = jax.vjp(_mlp_ref, x, se, be, w1t, b1, w2t, b2)
        return vjp((g_out, g_sums))
    # bf16 cotangent truncation is intentional — see the note in _pool_bwd
    return _mlp_bwd_p(
        x, se, be, w1t, b1, w2t, b2, g_out.astype(x.dtype),
        g_sums.astype(jnp.float32),
    )


fused_mlp_residual.defvjp(_mlp_fwd, _mlp_bwd)


# ---------------------------------------------------- fused unpool + mlp --
# Two passes over the point tiles of one batch element (grid (b, 2, nt)):
# pass 0 runs the whole unpool (pre-norm, folded broadcast attention,
# residual) and PARKS the intermediate stream x' in VMEM scratch while
# accumulating its channel sums; between the passes the mlp_norm GroupNorm
# statistics and embed affine collapse in-kernel; pass 1 runs the fused MLP
# on the parked tiles. x' never touches HBM: per-layer stream traffic drops
# from four passes over [B, N, C] (unpool read+write, MLP read+write) to
# two (read once, write once) — the HBM-bandwidth-bound portion of the
# denoiser eval (BASELINE.md roofline). Same math as folded_unpool +
# scale_bias_from_sums + fused_mlp_residual; reference behaviour:
# gecco-jax/src/gecco_jax/models/set_transformer.py:104-135 (SetAttention
# broadcast + MLP residual halves of one layer).


def unpool_mlp_vmem_ok(n: int, c: int, w: int, itemsize: int = 2) -> bool:
    """The megakernel parks the whole per-element [N, C] stream in VMEM and
    holds both MLP weight panels — conservative budget gate (the 8k config
    exceeds it and keeps the separate kernels)."""
    tn = 512 if n % 512 == 0 else n
    need = (
        n * c * itemsize  # parked x' stream
        + 2 * c * w * itemsize  # MLP weight panels
        + tn * w * (4 + itemsize)  # pass-1 hidden fp32 + activation
        + 4 * tn * c * (4 + itemsize)  # tile in/out + fp32 transients
        + 4 * c * c * itemsize  # wq/wo + folded kf/vf
    )
    return need <= 13 * 1024 * 1024


def _unpool_mlp_kernel(
    x_ref, se1_ref, be1_ref, k_ref, v_ref, wq_ref, wo_ref, bmap_ref,
    sc2_ref, bi2_ref, gind_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
    o_ref, sums_ref,
    kf_scratch, vf_scratch, xp_scratch, us_scratch, aff2_scratch,
    *, num_heads: int, scale_qk: float, n_tokens: int,
):
    pz = pl.program_id(1)
    ni = pl.program_id(2)
    nt = pl.num_programs(2)
    c = x_ref.shape[-1]
    d = c // num_heads
    i = k_ref.shape[1]
    tn = x_ref.shape[1]

    @pl.when(jnp.logical_and(pz == 0, ni == 0))
    def _():
        # fold q/out projections against the inducer-state k/v once per
        # batch element (same fold as the standalone unpool kernel)
        for h in range(num_heads):
            wq_h = wq_ref[h * d : (h + 1) * d, :]  # [D, C]
            k_h = k_ref[0][:, h * d : (h + 1) * d]  # [I, D]
            kf_scratch[:, h * i : (h + 1) * i] = (
                scale_qk
                * jax.lax.dot_general(
                    wq_h, k_h, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ).astype(kf_scratch.dtype)
            v_h = v_ref[0][:, h * d : (h + 1) * d]  # [I, D]
            wo_h = wo_ref[:, h * d : (h + 1) * d]  # [C, D]
            vf_scratch[h * i : (h + 1) * i, :] = jax.lax.dot_general(
                v_h, wo_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(vf_scratch.dtype)
        us_scratch[:] = jnp.zeros_like(us_scratch)

    @pl.when(pz == 0)
    def _():
        x = x_ref[0]  # [TN, C]
        y = (x.astype(jnp.float32) * se1_ref[0] + be1_ref[0]).astype(x.dtype)
        s = jax.lax.dot_general(
            y, kf_scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, J]
        p = _blockwise_softmax_lastaxis(s, i, bmap_ref[:])
        attn = x.astype(jnp.float32) + jax.lax.dot_general(
            p.astype(y.dtype), vf_scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, C] fp32, residual included
        xp_scratch[pl.ds(ni * tn, tn), :] = attn.astype(xp_scratch.dtype)
        us_scratch[0:1, :] += jnp.sum(attn, axis=0, keepdims=True)
        us_scratch[1:2, :] += jnp.sum(attn * attn, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(pz == 0, ni == nt - 1))
    def _():
        # collapse the mlp_norm GroupNorm statistics + embed affine into the
        # per-channel (se2, be2) — fp32, same math as scale_bias_from_sums
        gind = gind_ref[:]  # [C, G]
        per_group = c // gind.shape[1]
        count = float(n_tokens * per_group)
        g1 = jax.lax.dot_general(
            us_scratch[0:1, :], gind, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, G]
        g2 = jax.lax.dot_general(
            us_scratch[1:2, :], gind, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mean_g = g1 / count
        var_g = g2 / count - mean_g * mean_g
        inv_g = jax.lax.rsqrt(jnp.maximum(var_g, 0.0) + 1e-5)
        mean_c = jax.lax.dot_general(
            mean_g, gind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, C]
        inv_c = jax.lax.dot_general(
            inv_g, gind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        se2 = sc2_ref[0] * inv_c
        aff2_scratch[0:1, :] = se2
        aff2_scratch[1:2, :] = bi2_ref[0] - mean_c * se2

    @pl.when(pz == 1)
    def _():
        xi = xp_scratch[pl.ds(ni * tn, tn), :]  # [TN, C]
        y2 = (
            xi.astype(jnp.float32) * aff2_scratch[0:1, :] + aff2_scratch[1:2, :]
        ).astype(xi.dtype)
        hmid = jax.lax.dot_general(
            y2, w1t_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:]  # [TN, W]; alpha pre-folded by the caller
        g = jnp.exp(-0.5 * hmid * hmid).astype(y2.dtype)
        o = xi.astype(jnp.float32) + jax.lax.dot_general(
            g, w2t_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:]
        o_ref[0] = o.astype(o_ref.dtype)

        @pl.when(ni == 0)
        def _():
            sums_ref[0] = jnp.zeros_like(sums_ref[0])

        # channel sums of the OUTPUT — the next layer's pool pre-norm
        # statistics ride the scan carry for free (stats chain)
        sums_ref[0] += jnp.concatenate(
            [
                jnp.sum(o, axis=0, keepdims=True),
                jnp.sum(o * o, axis=0, keepdims=True),
            ],
            axis=0,
        )


def _unpool_mlp_impl(
    x, se1, be1, k, v, wq, wo, sc2, bi2, gind, w1t, b1, w2t, b2,
    num_heads, n_tokens, tie=True,
):
    """x [B, N, C]; se1/be1 [B, C] fp32 (collapsed broadcast_norm); k/v
    [B, I, C]; wq/wo [C, C]; sc2/bi2 [B, C] fp32 (mlp_norm embed affine,
    RAW — the GroupNorm statistics fold in-kernel); gind [C, G]; w1t/b1/
    w2t/b2 the folded MLP operands -> (out [B, N, C], out channel sums
    [B, 2, C] fp32)."""
    b, n, c = x.shape
    i = k.shape[1]
    j = num_heads * i
    w = w1t.shape[-1]
    tn = min(_pick_tile_n(n), 512)
    out, sums = pl.pallas_call(
        functools.partial(
            _unpool_mlp_kernel,
            num_heads=num_heads,
            scale_qk=1.0 / ((c // num_heads) ** 0.5),
            n_tokens=n_tokens,
        ),
        grid=(b, 2, n // tn),
        in_specs=[
            # x is only read in pass 0; pass 1 pins the last pass-0 block so
            # the [B, N, C] stream is DMA'd exactly once per batch element
            pl.BlockSpec(
                (1, tn, c),
                lambda bi, pz, ni, nt=n // tn: (
                    bi, ni * (1 - pz) + (nt - 1) * pz, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((j, num_heads), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(gind.shape, lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, w), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, pz, ni: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # written only in pass 1; during pass 0 the map pins the (bi, 0)
            # block so no garbage blocks are flushed (same pattern as the
            # two-pass pool backward)
            pl.BlockSpec((1, tn, c), lambda bi, pz, ni: (bi, pz * ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda bi, pz, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, j), x.dtype),
            pltpu.VMEM((j, c), x.dtype),
            pltpu.VMEM((n, c), x.dtype),
            pltpu.VMEM((2, c), jnp.float32),
            pltpu.VMEM((2, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(
        x, se1[:, None, :], be1[:, None, :], k, v, wq, wo,
        block_map(j, num_heads), sc2[:, None, :], bi2[:, None, :],
        gind, w1t, b1, w2t, b2,
    )
    if tie:
        # tie outputs against pallas-output DCE (axon Mosaic bug). Skipped
        # when the caller provably consumes the sums (the layer-scan stats
        # chain) — at the scan boundary XLA cannot alias the in-place form
        # and materialises a ~1 ms [B, N, C] copy per eval (xprof, round 3).
        out = out.at[0, 0, 0].add((0.0 * sums[0, 0, 0]).astype(out.dtype))
    return out, sums


def _affine_from_sums(sums, n_tokens, sc2, bi2, num_groups):
    """XLA twin of the in-kernel stats collapse (scale_bias_from_sums with
    explicit embed affines)."""
    b, _, c = sums.shape
    pg = c // num_groups
    g1 = sums[:, 0].reshape(b, num_groups, pg).sum(-1)
    g2 = sums[:, 1].reshape(b, num_groups, pg).sum(-1)
    count = n_tokens * pg
    mean = g1 / count
    var = g2 / count - mean**2
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    mean_c = jnp.repeat(mean, pg, axis=-1)
    inv_c = jnp.repeat(inv, pg, axis=-1)
    se2 = sc2 * inv_c
    return se2, bi2 - mean_c * se2


def _unpool_mlp_composed(
    x, se1, be1, k, v, wq, wo, sc2, bi2, w1t, b1, w2t, b2,
    num_heads, num_groups, n_tokens, axis=None,
):
    """The same function through the separate kernels (training path /
    seq-sharded fallback / backward recompute); ``axis`` psums the partial
    sums when the point axis is sharded."""
    xr, sums = folded_unpool(x, se1, be1, k, v, wq, wo, num_heads, True, True)
    if axis is not None:
        sums = jax.lax.psum(sums, axis)
    se2, be2 = _affine_from_sums(sums, n_tokens, sc2, bi2, num_groups)
    out, out_sums = fused_mlp_residual(xr, se2, be2, w1t, b1, w2t, b2)
    if axis is not None:
        out_sums = jax.lax.psum(out_sums, axis)
    return out, out_sums


_unpool_mlp_p = custom_partitioning(_unpool_mlp_impl, static_argnums=(14, 15, 16))


def _unpool_mlp_partition(num_heads, n_tokens, tie, mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    x_sh = NamedSharding(mesh, P(b, n, None))
    vec_sh = NamedSharding(mesh, P(b, None))
    kv_sh = NamedSharding(mesh, P(b, None, None))
    w_sh = NamedSharding(mesh, P(None, None))
    sums_sh = NamedSharding(mesh, P(b, None, None))
    if n is None:
        impl = lambda *a: _unpool_mlp_impl(*a, num_heads, n_tokens, tie)
    else:
        # point-sharded: the in-kernel statistics would be shard-local —
        # route through the separate kernels with explicit psums instead
        num_groups = arg_shapes[9].shape[1]  # gind [C, G]

        def impl(x, se1, be1, k, v, wq, wo, sc2, bi2, gind, w1t, b1, w2t, b2):
            return _unpool_mlp_composed(
                x, se1, be1, k, v, wq, wo, sc2, bi2, w1t, b1, w2t, b2,
                num_heads, num_groups, n_tokens, axis=n,
            )

    return (
        mesh,
        impl,
        (x_sh, sums_sh),
        (x_sh, vec_sh, vec_sh, kv_sh, kv_sh, w_sh, w_sh, vec_sh, vec_sh,
         w_sh, w_sh, w_sh, w_sh, w_sh),
    )


def _unpool_mlp_infer(num_heads, n_tokens, tie, mesh, arg_shapes, result_shape):
    b, n = (_spec_dim(arg_shapes[0].sharding, i) for i in range(2))
    return (
        NamedSharding(mesh, P(b, n, None)),
        NamedSharding(mesh, P(b, None, None)),
    )


_unpool_mlp_p.def_partition(
    _unpool_mlp_partition,
    infer_sharding_from_operands=_unpool_mlp_infer,
    sharding_rule=(
        "b n c, b c, b c, b i c1, b i c2, c3 c4, c5 c6, b c7, b c8, c9 g, "
        "c10 w, u w, w c11, u1 c11 -> b n c, b t c"
    ),
    need_replication_factors=(
        "c", "i", "c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8", "c9", "g",
        "c10", "w", "u", "c11", "u1", "t",
    ),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def fused_unpool_mlp(
    x, se1, be1, k, v, wq, wo, sc2, bi2, gind, w1t, b1, w2t, b2,
    num_heads, num_groups, n_tokens, tie=True,
):
    """Unpool + residual + mlp_norm + MLP + residual as ONE two-pass Pallas
    program (the intermediate stream lives in VMEM scratch). Forward is the
    megakernel; backward recomputes through the separate unpool/MLP kernels
    (their custom_vjps), so training gradients are identical to the
    unfused path."""
    return _unpool_mlp_p(
        x, se1, be1, k, v, wq, wo, sc2, bi2, gind, w1t, b1, w2t, b2,
        num_heads, n_tokens, tie,
    )


def _unpool_mlp_fwd(
    x, se1, be1, k, v, wq, wo, sc2, bi2, gind, w1t, b1, w2t, b2,
    num_heads, num_groups, n_tokens, tie,
):
    out = _unpool_mlp_p(
        x, se1, be1, k, v, wq, wo, sc2, bi2, gind, w1t, b1, w2t, b2,
        num_heads, n_tokens, tie,
    )
    return out, (x, se1, be1, k, v, wq, wo, sc2, bi2, w1t, b1, w2t, b2)


def _unpool_mlp_bwd(num_heads, num_groups, n_tokens, tie, res, g):
    x, se1, be1, k, v, wq, wo, sc2, bi2, w1t, b1, w2t, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _unpool_mlp_composed(*a, num_heads, num_groups, n_tokens),
        x, se1, be1, k, v, wq, wo, sc2, bi2, w1t, b1, w2t, b2,
    )
    grads = vjp(g)
    # re-insert the missing gind slot (constant indicator, no gradient)
    return grads[:9] + (None,) + grads[9:]


fused_unpool_mlp.defvjp(_unpool_mlp_fwd, _unpool_mlp_bwd)
