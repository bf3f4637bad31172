"""Conditional-stack certification at flagship dims (round-4 VERDICT #4).

Trains the FULL image-conditional production stack — RayNetwork over the
flagship 6x384 SetTransformer (bf16, fused Pallas kernels), ConvNeXt-tiny
feature pyramid, fused projective gather, UVL reparam with fitted stats —
on procedural in-frustum shapes with splat-rendered 256^2 images, then
certifies:

1. generative quality conditioned on HELD-OUT images: chamfer(samples, GT)
   vs the shuffled-pair baseline (conditioning specificity);
2. the exact conditional likelihood path end to end on TPU —
   ``evaluate_logp`` through the UVL ladj + VJP through the gather and the
   ConvNeXt pyramid (reference runs LogpMetric on conditional models,
   gecco-jax metrics.py:53-89) — value + per-batch timing;
3. a final eval at the flagship 128-step solver protocol.

Usage (TPU): python scripts/validate_conditional.py --steps 12000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validate_flagship import make_clouds  # noqa: E402 (procedural families)


def make_frustum_scene(rng, n, n_points, n_families=4, im_size=256):
    """Clouds placed in the camera frustum + splat-rendered uint8 images.

    K is the normalized-coordinate intrinsics used across the test suite
    ([[1,0,.5],[0,1,.5],[0,0,1]]): h = x/z + 0.5 must stay in (0, 1) with
    margin for the UVL arctanh."""
    clouds = make_clouds(rng, n, n_points, n_families=n_families) / 0.35
    # unit-ish clouds -> scale 0.22, centers inside the frustum
    clouds = clouds * 0.22
    z0 = rng.uniform(1.8, 3.2, size=(n, 1))
    # keep |x/z|, |y/z| < ~0.38 including the cloud's own extent
    xy0 = rng.uniform(-0.22, 0.22, size=(n, 2)) * z0
    centers = np.concatenate([xy0, z0], axis=1).astype(np.float32)
    clouds = clouds + centers[:, None, :]

    # project and splat-render with a depth buffer (nearest point wins,
    # brightness falls off with depth) — cheap but image-informative
    images = np.zeros((n, im_size, im_size, 3), np.uint8)
    for idx in range(n):
        pts = clouds[idx]
        z = pts[:, 2]
        u = pts[:, 0] / z + 0.5
        v = pts[:, 1] / z + 0.5
        xi = np.clip((u * im_size).astype(np.int64), 0, im_size - 1)
        yi = np.clip((v * im_size).astype(np.int64), 0, im_size - 1)
        flat = yi * im_size + xi
        depth = np.full(im_size * im_size, np.inf, np.float32)
        np.minimum.at(depth, flat, z)
        img = np.zeros(im_size * im_size, np.float32)
        vis = np.isfinite(depth)
        img[vis] = np.clip(2.2 - 0.5 * depth[vis], 0.15, 1.0)
        img8 = (img * 255).astype(np.uint8).reshape(im_size, im_size)
        images[idx] = img8[:, :, None]
    K = np.broadcast_to(
        np.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], np.float32),
        (n, 3, 3),
    ).copy()
    return clouds.astype(np.float32), images, K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--n-points", type=int, default=2048)
    ap.add_argument("--n-train", type=int, default=2048)
    ap.add_argument("--n-held-out", type=int, default=96)
    ap.add_argument("--eval-every", type=int, default=3000)
    ap.add_argument("--sampler-steps", type=int, default=64)
    ap.add_argument("--final-eval-solver-steps", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--im-size", type=int, default=256)
    ap.add_argument("--logp-batches", type=int, default=2)
    ap.add_argument("--logp-steps", type=int, default=24)
    ap.add_argument("--out", default="/tmp/conditional_validation.jsonl")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--feature-dim", type=int, default=384)
    ap.add_argument("--cpu", action="store_true", help="smoke-test on the CPU backend")
    ap.add_argument(
        "--snapshot-every", type=int, default=2000,
        help="rotating pre-divergence snapshots (model/ema/opt), keep 2; "
        "a NaN abort leaves a bisectable state (0 disables)",
    )
    ap.add_argument("--save-ema", default="",
                    help="orbax-save the final EMA tree under <dir>/ema")
    ap.add_argument(
        "--restore", default="",
        help="snapshot dir (model/ema/opt trees) to resume from, as saved "
        "by --snapshot-every",
    )
    ap.add_argument(
        "--start-step", type=int, default=0,
        help="step counter to resume at (use with --restore)",
    )
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gecco_tpu import Diffusion, LogUniformSchedule, UVLReparam
    from gecco_tpu.metrics import chamfer_distance
    from gecco_tpu.models import ConvNeXtExtractor, RayNetwork, SetTransformer
    from gecco_tpu.train import make_train_step
    from gecco_tpu.types import Context3d

    rng = np.random.default_rng(0)
    print("generating procedural frustum scenes...", flush=True)
    tr_pts, tr_img, tr_K = make_frustum_scene(rng, args.n_train, args.n_points,
                                              im_size=args.im_size)
    ho_pts, ho_img, ho_K = make_frustum_scene(
        np.random.default_rng(33333), args.n_held_out, args.n_points,
        im_size=args.im_size,
    )

    # fit UVL stats from the training distribution (find_hyperparameters
    # semantics: moments of the unnormalised uvl map)
    base = UVLReparam.init(uvl_mean=(0.0, 0.0, 0.0), uvl_std=(1.0, 1.0, 1.0))
    ctx_fit = Context3d(image=(), K=jnp.asarray(tr_K[:256]))
    uvl = np.asarray(base.data_to_diffusion(jnp.asarray(tr_pts[:256]), ctx_fit))
    flat = uvl.reshape(-1, 3)
    flat = flat[np.isfinite(flat).all(axis=1)]
    reparam = UVLReparam.init(uvl_mean=flat.mean(axis=0), uvl_std=flat.std(axis=0))
    # sigma_max from the data like find_hyperparameters.ipynb: max pairwise
    # distance in the (normalized) diffusion space, over a sample
    norm = np.asarray(
        reparam.data_to_diffusion(jnp.asarray(tr_pts[:64]), Context3d(image=(), K=jnp.asarray(tr_K[:64])))
    ).reshape(64, -1, 3)
    sub = norm[:, :: max(1, norm.shape[1] // 256)]
    dmax = 0.0
    for cl in sub:
        dd = np.linalg.norm(cl[:, None] - cl[None, :], axis=-1).max()
        dmax = max(dmax, float(dd))
    sigma_max = float(np.ceil(dmax))
    print(f"uvl stats: mean {flat.mean(axis=0)}, std {flat.std(axis=0)}, sigma_max {sigma_max}")

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    backbone = SetTransformer.init(
        keys[0], n_layers=args.layers, feature_dim=args.feature_dim,
        num_inducers=64, embed_dim=1, num_heads=8,
        compute_dtype=jnp.bfloat16, attn_impl="folded_pallas", remat=False,
    )
    net = RayNetwork.init(
        keys[1], backbone, reparam, feature_dim=args.feature_dim,
        input_ctx_dim=96 + 192 + 384,
    )
    cond = ConvNeXtExtractor.init(keys[2], size="tiny", compute_dtype=jnp.bfloat16)
    schedule = LogUniformSchedule(
        sigma_max=sigma_max, sigma_min=0.002, n_solver_steps=128
    )
    model = Diffusion.init(net, schedule, reparam=reparam, cond=cond)

    warmup = min(args.warmup, max(1, args.steps // 10))
    sched_lr = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, end_value=args.lr * 0.02
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adabelief(learning_rate=sched_lr)
    )
    step_fn = make_train_step(opt, donate=False)  # convs: no donation (axon)
    ema = jax.tree.map(jnp.copy, model)
    opt_state = opt.init(model)

    sample_fn = jax.jit(
        lambda m, k, c, steps: m.sample_stochastic(
            k, (args.n_held_out, args.n_points, 3), raw_ctx=c, s_churn=0.5,
            n_solver_steps=steps,
        ),
        static_argnums=(3,),
    )
    chamfer_vm = jax.jit(jax.vmap(chamfer_distance))
    logp_fn = jax.jit(
        lambda m, k, pts, c: m.evaluate_logp(
            k, pts, raw_ctx=c, n_solver_steps=args.logp_steps
        )
    )

    ho_ctx = Context3d(image=jnp.asarray(ho_img), K=jnp.asarray(ho_K))

    def evaluate(m, step, solver_steps, tag):
        t0 = time.perf_counter()
        samples = sample_fn(m, jax.random.PRNGKey(step + 9), ho_ctx, solver_steps)
        cd = np.asarray(chamfer_vm(samples, jnp.asarray(ho_pts)))
        # shuffled-pair baseline: sample i scored against GT of (i+7)%n
        shuf = np.asarray(
            chamfer_vm(samples, jnp.asarray(np.roll(ho_pts, 7, axis=0)))
        )
        rec = {
            "step": step,
            "tag": tag,
            "solver_steps": solver_steps,
            "chamfer_mean": float(cd.mean()),
            "chamfer_std": float(cd.std()),
            "chamfer_shuffled_mean": float(shuf.mean()),
            "specificity": float(shuf.mean() / max(cd.mean(), 1e-9)),
            "eval_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    def save_state(tag, step_no):
        import orbax.checkpoint as ocp

        path = os.path.abspath(args.out + ".snapshots/" + tag)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "model"), model, force=True)
        ckptr.save(os.path.join(path, "ema"), ema, force=True)
        ckptr.save(os.path.join(path, "opt"), opt_state, force=True)
        ckptr.wait_until_finished()
        print(f"[validate] saved {tag} at step {step_no} -> {path}", flush=True)
        return path

    if args.restore:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        base = os.path.abspath(args.restore)
        model = ckptr.restore(
            os.path.join(base, "model"),
            jax.tree.map(ocp.utils.to_shape_dtype_struct, model),
        )
        ema = ckptr.restore(
            os.path.join(base, "ema"),
            jax.tree.map(ocp.utils.to_shape_dtype_struct, ema),
        )
        opt_state = ckptr.restore(
            os.path.join(base, "opt"),
            jax.tree.map(ocp.utils.to_shape_dtype_struct, opt_state),
        )
        print(f"[validate] restored snapshot {base}", flush=True)
        rng = np.random.default_rng((919, args.start_step))

    # Park the full training set in HBM once and gather batches on-device
    # from a [batch]-int32 index transfer. The per-step host->device stream
    # (~10 MB/step with 256^2 images) is not merely slow through the relay:
    # the axon runtime retains host staging buffers per transfer, which
    # OOM-killed the original run of this script at ~130 GB RSS after
    # ~10.7k steps (round-5 queue, stage 3).
    tr_pts_d = jax.device_put(tr_pts)
    tr_img_d = jax.device_put(tr_img)
    tr_K_d = jax.device_put(tr_K)

    key = jax.random.PRNGKey(5)
    order = np.arange(args.n_train)
    t0 = time.perf_counter()
    losses = []
    snaps = []
    for step in range(args.start_step, args.steps):
        if step % (args.n_train // args.batch) == 0:
            rng.shuffle(order)
        sel = order[
            (step * args.batch) % args.n_train :
            (step * args.batch) % args.n_train + args.batch
        ]
        if len(sel) < args.batch:
            sel = order[: args.batch]
        sel_d = jnp.asarray(sel.astype(np.int32))
        pts = jnp.take(tr_pts_d, sel_d, axis=0)
        ctx = Context3d(
            image=jnp.take(tr_img_d, sel_d, axis=0),
            K=jnp.take(tr_K_d, sel_d, axis=0),
        )
        key, sk = jax.random.split(key)
        loss, model, ema, opt_state = step_fn(model, ema, opt_state, pts, ctx, sk)
        if step % 250 == 0:
            lv = float(loss)
            losses.append(lv)
            if not np.isfinite(lv):
                save_state("divergent", step)
                with open(args.out, "a") as f:
                    f.write(json.dumps({
                        "step": step, "aborted": "non-finite loss",
                        "last_snapshots": snaps[-2:],
                    }) + "\n")
                print(f"[validate] ABORT: non-finite loss at step {step}; "
                      f"pre-divergence snapshots: {snaps[-2:]}", flush=True)
                raise SystemExit(3)
            rate = (step + 1 - args.start_step) / (time.perf_counter() - t0)
            print(f"step {step} loss {lv:.4f} ({rate:.1f} it/s)", flush=True)
        if args.snapshot_every and (step + 1) % args.snapshot_every == 0:
            snaps.append(save_state(f"snap-{step + 1}", step + 1))
            while len(snaps) > 2:
                import shutil

                shutil.rmtree(snaps.pop(0), ignore_errors=True)
        if step > 0 and step % args.eval_every == 0:
            evaluate(ema, step, args.sampler_steps, "periodic")

    if args.save_ema:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(os.path.join(args.save_ema, "ema")), ema)
        ckptr.wait_until_finished()
        print(f"saved final EMA under {args.save_ema}/ema", flush=True)

    evaluate(ema, args.steps, args.sampler_steps, "final-64")
    evaluate(ema, args.steps, args.final_eval_solver_steps, "final-128")

    # conditional exact-likelihood end to end (UVL ladj + VJP through the
    # projective gather + ConvNeXt): value + timing
    for b in range(args.logp_batches):
        sel = slice(b * args.batch, (b + 1) * args.batch)
        pts = jnp.asarray(ho_pts[sel])
        ctx = Context3d(image=jnp.asarray(ho_img[sel]), K=jnp.asarray(ho_K[sel]))
        t0 = time.perf_counter()
        logp = logp_fn(ema, jax.random.PRNGKey(100 + b), pts, ctx)
        lp = float(np.asarray(logp).mean())
        dt = time.perf_counter() - t0
        rec = {
            "tag": "conditional-logp",
            "batch": b,
            "logp_per_point_mean": lp,
            "seconds_per_batch": round(dt, 2),
            "n_solver_steps": args.logp_steps,
        }
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
