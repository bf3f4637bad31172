"""Drifted-magnitude kernel certifier (round-5 VERDICT #2).

Every round-4 kernel configuration that later NaN'd flagship training had
passed interpret-mode parity and short on-TPU micro-tests — the failures
only fired once *trained* logit magnitudes drifted (per-head logit scales
spreading over decades, within-head logit ranges binding the -80 exp
clamp). Each discovery cost a multi-hour single-tenant TPU run.

This script is the cheap pre-flight that was missing: it synthesizes
kernel operands at late-training magnitude profiles (controlled per-head
logit drift + large within-head ranges) and checks every fused Pallas
kernel's FORWARD and BACKWARD against its XLA twin (same folded algebra,
same bf16 casts) on the real TPU, in minutes. Gate any kernel-default
change on a clean pass.

Twin pairs certified (gecco_tpu/ops/pallas/folded_attention.py, hside.py):
    folded_pool_ext    vs _pool_ext_ref     (tiled online-softmax pool)
    folded_pool_layer  vs _pool_ref         (VMEM-gated pool + GroupNorm)
    folded_unpool      vs _unpool_ref       (blockwise-softmax unpool)
    fused_mlp_residual vs _mlp_ref          (residual MLP + stats)
    fused_h_side       vs _hside_ref        (inducer-side megakernel)

The check: with identical operands and an identical bf16-truncated
cotangent, fused and twin outputs/input-gradients must be (a) all finite
and (b) within a bf16-commensurate relative error. A Mosaic miscompile of
the class seen in rounds 2-4 (finite logits -> NaN probabilities, or a
wrong clamp jacobian) fails (a) or blows (b) by orders of magnitude.

Magnitude profiles: ``--gains`` multiplies per-head query-side weights by
log-spaced per-head factors in [1, gain] and scales the input stream, so
gain=1 is init-like while gain>=10 produces the drifted regime (per-head
logit maxima spreading 10-100x, within-head ranges past the -80 clamp).
The achieved per-head logit statistics are printed with each row so the
coverage is auditable, not assumed.

Arms (``--arms``): re-executes itself in subprocesses with the env knobs
of the three round-4 divergent configurations (GECCO_SOFTMAX_R4=1,
GECCO_TN_UNPOOL=2048, GECCO_PIPELINE_CHUNKS=4) plus the shipping default.
Kernel env knobs are read at import, so fresh subprocesses are required.

Optionally ``--ema <dir> --layers L --width C`` adds a model-level arm:
full flagship denoiser loss + grads with attn_impl='folded_pallas' vs
'folded' (identical algebra through plain XLA) at the checkpoint's real
trained magnitudes.

Usage (TPU, ~2 min warm / ~15 min cold-compile):
    python scripts/certify_kernels.py                      # shipping stack
    python scripts/certify_kernels.py --arms all           # + r4 configs
    python scripts/certify_kernels.py --ema runs/r5_flagship_ema
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the three round-4 flagship-divergent kernel configurations + shipping
ARMS = {
    "shipping": {},
    "r4_softmax": {"GECCO_SOFTMAX_R4": "1"},
    "tn2048": {"GECCO_TN_UNPOOL": "2048"},
    "chunked": {"GECCO_PIPELINE_CHUNKS": "4"},
}


def _rel_err(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = max(np.abs(b).max(), 1e-6)
    return float(np.abs(a - b).max() / denom)


def _finite(tree) -> bool:
    return all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(tree)
    )


def _head_factors(rng, num_heads, gain):
    """Per-head drift factors, log-spaced over [1, gain], shuffled."""
    f = np.logspace(0.0, np.log10(max(gain, 1.0)), num_heads)
    rng.shuffle(f)
    return jnp.asarray(f, jnp.float32)


def _logit_stats(logits, num_heads):
    """[B, N, H*I] or [B, N, H, I] logits -> per-head max spread + range."""
    lf = np.asarray(logits, np.float32)
    if lf.ndim == 3:
        b, n, j = lf.shape
        lf = lf.reshape(b, n, num_heads, j // num_heads)
    hmax = lf.max(axis=(0, 1, 3))  # [H]
    hmin = lf.min(axis=(0, 1, 3))
    return {
        "head_max_spread": float(hmax.max() - hmax.min()),
        "within_head_range_max": float((hmax - hmin).max()),
        "abs_max": float(np.abs(lf).max()),
    }


def make_cases(batch, n_points, c, num_inducers, num_heads, width, gain, seed):
    """Synthesize operand sets for each kernel at a drift profile.

    Returns {kernel_name: (fused_fn, twin_fn, primals, logit_stats)} where
    both fns take *primals and return a pytree of outputs.
    """
    from gecco_tpu.ops.pallas import folded_attention as fa
    from gecco_tpu.ops.pallas import hside as hs

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 32))
    dt = jnp.bfloat16
    b, n, i, h = batch, n_points, num_inducers, num_heads
    d = c // h
    j = h * i

    # the residual stream grows with training; gain scales its std too
    x_std = 1.0 + 0.15 * gain
    x = (jax.random.normal(next(ks), (b, n, c)) * x_std).astype(dt)
    # pre-norm affine operands: se ~ AdaGN inv_std*scale (drifts with gain),
    # be a modest shift
    se = (
        jax.random.uniform(next(ks), (b, c), minval=0.5, maxval=1.5)
        * (1.0 + 0.1 * gain) / x_std
    ).astype(jnp.float32)
    be = (0.2 * jax.random.normal(next(ks), (b, c))).astype(jnp.float32)

    hf = _head_factors(rng, h, gain)

    cases = {}

    # ---------------------------------------------------------- pool_ext
    ind2 = (jax.random.normal(next(ks), (j, d)) * hf.repeat(i)[:, None]).astype(dt)
    kvw = (jax.random.normal(next(ks), (2 * c, c)) / np.sqrt(c)).astype(dt)
    wo = (jax.random.normal(next(ks), (c, c)) / np.sqrt(c)).astype(dt)
    y = (x.astype(jnp.float32) * se[:, None, :] + be[:, None, :]).astype(dt)
    qf = fa._fold_qf(ind2, kvw, h)
    bs = min(4, b)  # logit stats on a slice — diagnostics only
    pool_logits = jnp.einsum(
        "bnc,cj->bnj", y[:bs], qf, preferred_element_type=jnp.float32
    )
    cases["pool_ext"] = (
        lambda *a: fa.folded_pool_ext(*a, h),
        lambda *a: fa._pool_ext_ref(*a, h),
        (x, se, be, ind2, kvw, wo),
        _logit_stats(pool_logits, h),
    )

    # --------------------------------------------------------- pool_layer
    # GroupNorm pre-norm variant (production: inference layer 0, 32 groups);
    # the indicator matrix is a non-learned constant — close over it so the
    # grad comparison only covers real inputs
    gind = fa.group_indicator(c, 32)
    cases["pool_layer"] = (
        lambda *a: fa.folded_pool_layer(*a, gind, h)[0],
        lambda *a: fa._pool_ref(*a, 32, h)[0],
        (x, se * x_std, be, ind2, kvw, wo),
        _logit_stats(pool_logits, h),  # same query fold, close enough
    )

    # ------------------------------------------------------------ unpool
    kk = (
        jax.random.normal(next(ks), (b, i, c)).reshape(b, i, h, d)
        * hf[None, None, :, None]
    ).reshape(b, i, c).astype(dt)
    vv = jax.random.normal(next(ks), (b, i, c)).astype(dt)
    wq = (jax.random.normal(next(ks), (c, c)) / np.sqrt(c)).astype(dt)
    wou = (jax.random.normal(next(ks), (c, c)) / np.sqrt(c)).astype(dt)
    scale_qk = 1.0 / (d ** 0.5)
    kfm = scale_qk * jnp.einsum(
        "hdc,bihd->bchi",
        wq.astype(jnp.float32).reshape(h, d, c),
        kk[:bs].astype(jnp.float32).reshape(bs, i, h, d),
    ).reshape(bs, c, j)
    unpool_logits = jnp.einsum(
        "bnc,bcj->bnj", y[:bs].astype(jnp.float32), kfm
    )
    cases["unpool"] = (
        lambda *a: fa.folded_unpool(*a, h, True, True),
        lambda *a: fa._unpool_ref(*a, h, True, True),
        (x, se, be, kk, vv, wq, wou),
        _logit_stats(unpool_logits, h),
    )

    # --------------------------------------------------------------- mlp
    w1t = (jax.random.normal(next(ks), (c, width)) / np.sqrt(c)
           * (1.0 + 0.2 * gain)).astype(dt)
    b1 = (0.1 * jax.random.normal(next(ks), (1, width))).astype(jnp.float32)
    w2t = (jax.random.normal(next(ks), (width, c)) / np.sqrt(width)).astype(dt)
    b2 = (0.1 * jax.random.normal(next(ks), (1, c))).astype(jnp.float32)
    cases["mlp"] = (
        fa.fused_mlp_residual,
        fa._mlp_ref,
        (x, se, be, w1t, b1, w2t, b2),
        {},
    )

    # ------------------------------------------------------------- hside
    h0 = (jax.random.normal(next(ks), (b, i, c)) * x_std).astype(dt)
    s1 = se
    b1n = be
    s2 = (jax.random.uniform(next(ks), (b, c), minval=0.5, maxval=1.5)
          * (1.0 + 0.1 * gain)).astype(jnp.float32)
    b2n = (0.2 * jax.random.normal(next(ks), (b, c))).astype(jnp.float32)
    wk = (jax.random.normal(next(ks), (c, c)) / np.sqrt(c)
          * hf.repeat(d)[:, None]).astype(dt)
    wv = (jax.random.normal(next(ks), (c, c)) / np.sqrt(c)).astype(dt)
    gind32 = fa.group_indicator(c, 32)
    cases["hside"] = (
        lambda a0, a1, a2, a3, a4, *w: hs.fused_h_side(
            a0, a1, a2, a3, a4, gind32, *w
        ),
        lambda a0, a1, a2, a3, a4, *w: hs._hside_ref(
            a0, a1, a2, a3, a4, gind32, *w
        ),
        (h0, s1, b1n, s2, b2n, w1t, b1, w2t, b2, wk, wv),
        {},
    )

    return cases


def run_value_and_grad(fn, primals, cot_key):
    """Value + input-grads with a shared bf16-truncated cotangent."""
    out, vjp = jax.vjp(fn, *primals)
    cots = jax.tree.map(
        lambda o: jax.random.normal(cot_key, o.shape, jnp.float32)
        .astype(jnp.bfloat16).astype(o.dtype),
        out,
    )
    grads = vjp(cots)
    return out, grads


def _to_f32(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x, tree
    )


def certify(args) -> int:
    t0 = time.time()
    results = []
    failures = 0
    only = set(args.only.split(",")) if args.only else None

    # jit once per kernel; gains/seeds reuse the compile (same shapes)
    compiled = {}
    for gain in args.gains:
        for seed in range(args.seeds):
            cases = make_cases(
                args.batch, args.n_points, args.width_c, args.inducers,
                args.heads, args.mlp_width, gain, seed,
            )
            for name, (fused, twin, primals, lstats) in cases.items():
                if only and name not in only:
                    continue
                if name not in compiled:
                    compiled[name] = (
                        jax.jit(lambda p, k, f=fused: run_value_and_grad(f, p, k)),
                        jax.jit(lambda p, k, t=twin: run_value_and_grad(t, p, k)),
                        # fp32-exact arm: the SAME twin math on fp32 casts of
                        # the operands — the yardstick that separates genuine
                        # wrongness from bf16/near-one-hot conditioning
                        jax.jit(
                            lambda p, k, t=twin: run_value_and_grad(
                                t, _to_f32(p), k
                            )
                        ),
                    )
                jf, jt, jx = compiled[name]
                ck = jax.random.PRNGKey(1000 + seed)
                fo, fg = jax.tree.map(np.asarray, jf(tuple(primals), ck))
                to, tg = jax.tree.map(np.asarray, jt(tuple(primals), ck))
                xo, xg = jax.tree.map(np.asarray, jx(tuple(primals), ck))
                fin_f = _finite((fo, fg))
                fin_t = _finite((to, tg))
                # worst leaf errors vs the fp32-exact arm for both impls
                e_fo = max(_rel_err(a, b) for a, b in
                           zip(jax.tree.leaves(fo), jax.tree.leaves(xo)))
                e_to = max(_rel_err(a, b) for a, b in
                           zip(jax.tree.leaves(to), jax.tree.leaves(xo)))
                e_fg = max(_rel_err(a, b) for a, b in
                           zip(jax.tree.leaves(fg), jax.tree.leaves(xg)))
                e_tg = max(_rel_err(a, b) for a, b in
                           zip(jax.tree.leaves(tg), jax.tree.leaves(xg)))
                # pass iff finite AND the fused error is within args.ratio x
                # the twin's own bf16 noise floor (+ an absolute floor for
                # when the twin is exact) AND never O(1)-wrong
                noise_o = max(e_to, args.tol)
                noise_g = max(e_tg, args.gtol)
                ok = (
                    fin_f and fin_t
                    and e_fo <= args.ratio * noise_o and e_fo <= 0.5
                    and e_fg <= args.ratio * noise_g and e_fg <= 0.5
                )
                failures += 0 if ok else 1
                rec = {
                    "kernel": name, "gain": gain, "seed": seed,
                    "finite_fused": fin_f, "finite_twin": fin_t,
                    "err_out_fused": round(e_fo, 6),
                    "err_out_twin": round(e_to, 6),
                    "err_grad_fused": round(e_fg, 6),
                    "err_grad_twin": round(e_tg, 6),
                    "ok": ok, **lstats,
                }
                results.append(rec)
                print(("PASS " if ok else "FAIL ") + json.dumps(rec), flush=True)

    print(
        f"[certify] {len(results)} checks, {failures} failures, "
        f"{time.time() - t0:.0f}s", flush=True,
    )
    if args.out:
        with open(args.out, "a") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
    return failures


def model_arm(args) -> int:
    """Full-model loss+grads: attn_impl='folded_pallas' vs 'folded' (same
    folded algebra through plain XLA), optionally at a checkpoint's real
    trained magnitudes."""
    import optax  # noqa: F401  (parity of imports with validate scripts)

    from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
    from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork

    key = jax.random.PRNGKey(7)
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk, n_layers=args.layers, feature_dim=args.width_c,
        num_inducers=args.inducers, embed_dim=1, num_heads=args.heads,
        compute_dtype=jnp.bfloat16, attn_impl="folded_pallas",
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=args.width_c)
    sched = LogUniformSchedule(sigma_max=165.0, sigma_min=0.002, n_solver_steps=64)
    model = Diffusion.init(
        net, sched, reparam=GaussianReparam.init([0.0] * 3, [0.35] * 3)
    )
    if args.ema:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, model)
        model = ckptr.restore(
            os.path.abspath(os.path.join(args.ema, "ema")), abstract
        )
        print(f"[certify] model arm: restored EMA from {args.ema}", flush=True)

    pts = jax.random.normal(jax.random.PRNGKey(11), (args.batch, args.n_points, 3)) * 0.35

    def loss_of(m, impl):
        m = m.replace(
            network=m.network.replace(
                backbone=m.network.backbone.replace(attn_impl=impl)
            )
        )
        return m.loss(pts, None, jax.random.PRNGKey(3))

    failures = 0
    for impl_pair in [("folded_pallas", "folded")]:
        lf, gf = jax.jit(
            lambda m: jax.value_and_grad(lambda mm: loss_of(mm, impl_pair[0]))(m)
        )(model)
        lt, gt = jax.jit(
            lambda m: jax.value_and_grad(lambda mm: loss_of(mm, impl_pair[1]))(m)
        )(model)
        lf, lt = float(lf), float(lt)
        fin = _finite((lf, gf)) and _finite((lt, gt))
        le = abs(lf - lt) / max(abs(lt), 1e-6)
        ge = max(
            (_rel_err(a, b) if np.asarray(b).size and np.abs(np.asarray(b, np.float64)).max() > 1e-4 else 0.0)
            for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gt))
        )
        ok = fin and le <= args.tol and ge <= args.model_gtol
        failures += 0 if ok else 1
        rec = {
            "kernel": "MODEL", "loss_fused": lf, "loss_twin": lt,
            "finite": fin, "rel_err_loss": round(le, 6),
            "rel_err_grad": round(ge, 6), "ok": ok,
        }
        print(("PASS " if ok else "FAIL ") + json.dumps(rec), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="",
                    help="comma list from {shipping,r4_softmax,tn2048,chunked} "
                    "or 'all': re-exec under each env config (fresh "
                    "subprocess per arm; kernel env knobs are import-time)")
    # calibrated on the CPU interpret arm: gain 1 ~ init (per-head logit
    # |max| ~6), gain 5 ~ mid-training drift (~50), gain 12 ~ late-training
    # extreme (~150, within-head ranges past the -80 clamp). Past ~15 the
    # regime is unphysical (logits >1000) and even the bf16 twin drowns in
    # conditioning noise vs exact.
    ap.add_argument("--gains", type=float, nargs="+", default=[1.0, 5.0, 12.0])
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--n-points", type=int, default=2048)
    ap.add_argument("--width-c", type=int, default=384)
    ap.add_argument("--inducers", type=int, default=64)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--mlp-width", type=int, default=768)
    ap.add_argument("--tol", type=float, default=1e-2,
                    help="absolute floor on the twin's output noise level "
                    "used in the ratio test (bf16 twins can be exact)")
    ap.add_argument("--gtol", type=float, default=3e-2,
                    help="absolute floor on the twin's grad noise level")
    ap.add_argument("--ratio", type=float, default=8.0,
                    help="fused error may exceed the twin's own bf16 error "
                    "vs the fp32-exact arm by at most this factor (and "
                    "never exceed 0.5 absolute); a miscompile is NaN or "
                    "orders of magnitude, conditioning hits both impls "
                    "equally")
    ap.add_argument("--model-gtol", type=float, default=0.15,
                    help="model-arm grad tolerance (6 scanned layers of bf16 "
                    "accumulation between the two impls)")
    ap.add_argument("--only", default="", help="subset of kernels")
    ap.add_argument("--model-arm", action="store_true")
    ap.add_argument("--ema", default="", help="EMA checkpoint dir for the model arm")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (kernels in interpret "
                    "mode) — for harness debugging only; certification "
                    "REQUIRES the TPU, interpret mode passed on every "
                    "round-4 config that later miscompiled")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.arms:
        names = list(ARMS) if args.arms == "all" else args.arms.split(",")
        # strip --arms (both "--arms X" and "--arms=X" forms) for the re-exec
        sub, skip = [], False
        for a in sys.argv[1:]:
            if skip:
                skip = False
                continue
            if a == "--arms":
                skip = True
            elif not a.startswith("--arms="):
                sub.append(a)
        rc_all = 0
        for name in names:
            env = dict(os.environ, **ARMS[name])
            print(f"\n=== arm {name} env={ARMS[name]} ===", flush=True)
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sub,
                env=env, cwd=REPO,
            ).returncode
            print(f"=== arm {name} rc={rc} ===", flush=True)
            # shipping must PASS; the r4 arms are expected to FAIL (they
            # certify the certifier) — report both, exit reflects shipping
            if name == "shipping":
                rc_all = rc
        sys.exit(rc_all)

    failures = certify(args)
    if args.model_arm or args.ema:
        failures += model_arm(args)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
