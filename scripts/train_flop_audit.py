"""Exact per-kernel FLOP/byte audit for the train-step floor (VERDICT #2).

The fused Pallas kernels compute the same mathematics as their XLA twins
(``_pool_ext_ref`` / ``_unpool_ref`` / ``_mlp_ref`` in
gecco_tpu/ops/pallas/folded_attention.py), so XLA cost analysis of the
twins — lowered standalone at the exact per-layer shapes, no lax.scan
(whose body XLA cost analysis counts only once) — gives exact FLOP counts:

- fwd:            the forward kernel's executed FLOPs
- bwd_stored:     vjp with stored activations — the *algorithmic* backward
                  minimum (what autodiff through library attention costs)
- bwd_recompute:  vjp through jax.checkpoint(fwd) — forward recomputed in
                  the backward, which is what the fused backward kernels
                  actually do (they re-derive tile intermediates in VMEM
                  instead of round-tripping them through HBM)

Derived per-kernel MXU floors use the measured ~150 TFLOP/s realised peak;
HBM floors use the measured ~206 GB/s with analytic stream counts.

Runs on the CPU backend; nothing is executed (compile + cost analysis only).

Usage: python scripts/train_flop_audit.py [--config flagship|8k] [--batch N]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MXU = 150e12  # measured realised bf16 matmul peak (BASELINE.md round 2)
HBM = 206e9  # measured HBM stream rate


def cost(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca["flops"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="flagship", choices=["flagship", "8k"])
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    from gecco_tpu.ops.pallas.folded_attention import (
        _mlp_ref,
        _pool_ext_ref,
        _unpool_ref,
    )

    if args.config == "flagship":
        b = args.batch or 48
        n, c, h, i, layers = 2048, 384, 8, 64, 6
    else:
        b = args.batch or 16
        n, c, h, i, layers = 8192, 768, 16, 64, 12
    j, d, w = h * i, c // h, 2 * c

    bf = jnp.bfloat16
    x = jnp.zeros((b, n, c), bf)
    se = jnp.zeros((b, c), jnp.float32)
    be = jnp.zeros((b, c), jnp.float32)
    ind2 = jnp.zeros((j, d), jnp.float32)
    kvw = jnp.zeros((2 * c, c), jnp.float32)
    wo = jnp.zeros((c, c), jnp.float32)
    k = jnp.zeros((b, i, c), bf)
    v = jnp.zeros((b, i, c), bf)
    wq = jnp.zeros((c, c), jnp.float32)
    w1t = jnp.zeros((c, w), jnp.float32)
    b1 = jnp.zeros((w,), jnp.float32)
    w2t = jnp.zeros((w, c), jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)

    kernels = {
        "pool": (lambda *a: _pool_ext_ref(*a, h), (x, se, be, ind2, kvw, wo)),
        "unpool": (lambda *a: _unpool_ref(*a, h), (x, se, be, k, v, wq, wo)),
        "mlp": (_mlp_ref, (x, se, be, w1t, b1, w2t, b2)),
    }

    def tree_sum_sq(t):
        return sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in jax.tree.leaves(t))

    print(f"config={args.config} batch={b} n={n} c={c} heads={h} layers={layers}")
    print(f"{'kernel':8s} {'fwd':>9s} {'bwd_stored':>11s} {'bwd_recomp':>11s}"
          f"  {'fwd floor':>9s} {'bwd floor':>9s}   (GFLOP/layer/step; ms at 150 TF/s)")
    tot_f, tot_bs, tot_br = 0.0, 0.0, 0.0
    for name, (fn, fargs) in kernels.items():
        f = cost(fn, *fargs)

        def loss_stored(*a, fn=fn):
            return tree_sum_sq(fn(*a))

        def loss_remat(*a, fn=fn):
            return tree_sum_sq(jax.checkpoint(fn)(*a))

        fb_stored = cost(jax.grad(loss_stored, argnums=tuple(range(len(fargs)))), *fargs)
        fb_remat = cost(jax.grad(loss_remat, argnums=tuple(range(len(fargs)))), *fargs)
        # subtract the forward that grad() includes, keep pure backward
        bs, br = fb_stored - f, fb_remat - f
        tot_f, tot_bs, tot_br = tot_f + f, tot_bs + bs, tot_br + br
        print(f"{name:8s} {f/1e9:9.1f} {bs/1e9:11.1f} {br/1e9:11.1f}"
              f"  {f/MXU*1e3:7.2f}ms {br/MXU*1e3:7.2f}ms")

    stream = b * n * c * 2  # one [B, N, C] bf16 pass
    print(f"\nper-layer totals: fwd {tot_f/1e9:.1f} GFLOP ({tot_f/MXU*1e3:.2f} ms), "
          f"bwd(recompute) {tot_br/1e9:.1f} GFLOP ({tot_br/MXU*1e3:.2f} ms)")
    print(f"x-stream unit [B,N,C] bf16 = {stream/1e6:.1f} MB "
          f"= {stream/HBM*1e3:.3f} ms at 206 GB/s")
    lf, lb = layers * tot_f / MXU * 1e3, layers * tot_br / MXU * 1e3
    print(f"\n{layers}-layer step MXU floors: fwd {lf:.1f} ms, "
          f"bwd {lb:.1f} ms, fwd+bwd {lf+lb:.1f} ms")
    print(f"algorithmic (stored-activation) fwd+bwd floor: "
          f"{layers * (tot_f + tot_bs) / MXU * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
