"""Microbench one fused Pallas kernel at flagship shapes with xprof timing.

Runs a K-call dependent chain of a single kernel (pool_ext / unpool / mlp /
hside) under ``jax.profiler.trace`` and prints per-op device self-time per
call — the iteration harness for intra-kernel pipeline work (round-4
VERDICT #1: unpool 1.119 ms/layer vs its 0.97 ms HBM stream bound, pool
0.748 vs its 0.65 ms MXU bound).

Usage: python scripts/kernel_bench.py [pool|unpool|mlp|all] [--k 32]
       [--batch 64] [--n-points 2048] [--feature-dim 384] [--heads 8]
       [--inducers 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xprof_util import per_op_self_time_ms, trace_events_from_xplane  # noqa: E402


def _time_chain(name: str, fn, x0, k_calls: int, top: int = 12):
    """Profile a k_calls-long dependent scan chain of fn and print per-op
    self time per call."""

    def chained(x):
        def body(x, _):
            return fn(x), None

        y, _ = jax.lax.scan(body, x, None, length=k_calls)
        return y.sum()

    jfn = jax.jit(chained)
    float(jfn(x0))  # compile + warm
    logdir = tempfile.mkdtemp(prefix=f"gecco_kb_{name}_")
    with jax.profiler.trace(logdir):
        float(jfn(x0))
    per_op = per_op_self_time_ms(trace_events_from_xplane(logdir))
    total = sum(per_op.values())
    print(f"== {name}: device total {total / k_calls:.4f} ms/call ==")
    for op, ms in per_op.most_common(top):
        print(f"  {ms / k_calls:8.4f} ms/call  {100 * ms / total:5.1f}%  {op[:100]}")
    return total / k_calls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kernel", nargs="?", default="all",
                    choices=["pool", "unpool", "mlp", "all"])
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-points", type=int, default=2048)
    ap.add_argument("--feature-dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--inducers", type=int, default=64)
    ap.add_argument("--blowup", type=int, default=2)
    ap.add_argument(
        "--bwd", action="store_true",
        help="time fwd+bwd per kernel (jax.grad through the custom VJP); "
        "the bwd-only estimate is (fwd+bwd chain) - (fwd chain)",
    )
    args = ap.parse_args()

    from gecco_tpu.ops.pallas.folded_attention import (
        fused_mlp_residual,
        folded_pool_ext,
        folded_unpool,
    )

    b, n, c, h, i = args.batch, args.n_points, args.feature_dim, args.heads, args.inducers
    d = c // h
    j = h * i
    w = args.blowup * c
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x0 = (jax.random.normal(ks[0], (b, n, c)) * 0.5).astype(dt)
    se = jnp.abs(jax.random.normal(ks[1], (b, c))) + 0.5  # fp32
    be = jax.random.normal(ks[2], (b, c)) * 0.1
    kk = (jax.random.normal(ks[3], (b, i, c)) * 0.3).astype(dt)
    vv = (jax.random.normal(ks[4], (b, i, c)) * 0.3).astype(dt)
    wq = (jax.random.normal(ks[5], (c, c)) / c**0.5).astype(dt)
    wo = (jax.random.normal(ks[6], (c, c)) / c**0.5).astype(dt)
    ind2 = (jax.random.normal(ks[7], (j, d)) * 0.3).astype(dt)
    kvw = (jax.random.normal(ks[8], (2 * c, c)) / c**0.5).astype(dt)
    w1t = (jax.random.normal(ks[9], (c, w)) / c**0.5).astype(dt)
    b1 = jnp.zeros((1, w), jnp.float32)
    w2t = (jax.random.normal(ks[10], (w, c)) / w**0.5).astype(dt)
    b2 = jnp.zeros((1, c), jnp.float32)

    def grad_step(f):
        # one fwd+bwd per chain step: grad w.r.t. x runs the full backward
        # kernel (it emits every cotangent in one program regardless)
        def g(x):
            gx = jax.grad(
                lambda xx: jnp.mean(f(xx).astype(jnp.float32) ** 2)
            )(x)
            return (x - 1e-3 * gx).astype(x.dtype)

        return g

    results = {}
    if args.kernel in ("pool", "all"):
        # chain via a cheap x-dependence: h0 [B, I, C] folded back into x
        def pool_step(x):
            h0 = folded_pool_ext(x, se, be, ind2, kvw, wo, args.heads)
            bump = jnp.sum(h0, axis=1, keepdims=True)
            return (x + 1e-6 * bump.astype(x.dtype)).astype(x.dtype)

        results["pool"] = _time_chain("pool_ext", pool_step, x0, args.k)
        if args.bwd:
            results["pool_fwdbwd"] = _time_chain(
                "pool_ext_fwdbwd", grad_step(pool_step), x0, args.k
            )
    if args.kernel in ("unpool", "all"):
        def unpool_step(x):
            out, sums = folded_unpool(x, se, be, kk, vv, wq, wo, args.heads)
            return (0.5 * out + 1e-6 * sums[:, :1, :].astype(out.dtype)).astype(x.dtype)

        results["unpool"] = _time_chain("unpool", unpool_step, x0, args.k)
        if args.bwd:
            results["unpool_fwdbwd"] = _time_chain(
                "unpool_fwdbwd", grad_step(unpool_step), x0, args.k
            )
    if args.kernel in ("mlp", "all"):
        def mlp_step(x):
            out, sums = fused_mlp_residual(x, se, be, w1t, b1, w2t, b2)
            return (0.5 * out + 1e-6 * sums[:, :1, :].astype(out.dtype)).astype(x.dtype)

        results["mlp"] = _time_chain("mlp", mlp_step, x0, args.k)
        if args.bwd:
            results["mlp_fwdbwd"] = _time_chain(
                "mlp_fwdbwd", grad_step(mlp_step), x0, args.k
            )
    for name in ("pool", "unpool", "mlp"):
        if f"{name}_fwdbwd" in results:
            results[f"{name}_bwd_est"] = results[f"{name}_fwdbwd"] - results[name]
    print({k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
