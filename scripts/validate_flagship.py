"""Flagship-scale convergence validation (VERDICT r1 #4).

Trains the FLAGSHIP denoiser (6 layers x feature_dim 384, 64 inducers,
8 heads — ref gecco-torch/example_configs/shapenet_airplane_unconditional.py:
32-43) in its production setup (bf16, remat, fused Pallas kernels, batch 48)
on a procedural shape distribution, and periodically measures generative
quality (1-NN / MMD / COV, gecco_tpu.benchmark semantics) of the EMA model.

Purpose: certify that the custom Pallas forward+backward is quality-neutral
at full scale — run once with ``--attn-impl folded_pallas`` and once with
``--attn-impl xla`` and compare curves; 1-NN -> ~0.5 means samples are
indistinguishable from held-out data.

The procedural distribution is a 4-family parametric shape mixture
(ellipsoid shells, boxes, two-lobe blends, tori) with per-example pose and
scale jitter: structured enough that an untrained model scores 1-NN ~ 1.0,
cheap enough to generate on the fly.

Usage (TPU, ~30 min per arm at the default 3000 steps):
    python scripts/validate_flagship.py --attn-impl folded_pallas \
        --steps 3000 --out /tmp/flagship_folded.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_clouds(
    rng: np.random.Generator, n: int, n_points: int, n_families: int = 4
) -> np.ndarray:
    """Sample n procedural clouds [n, n_points, 3], zero-mean, ~0.35 std."""
    out = np.empty((n, n_points, 3), np.float32)
    for idx in range(n):
        family = rng.integers(n_families)
        u = rng.uniform(0, 2 * np.pi, n_points)
        v = rng.uniform(-1, 1, n_points)
        if family == 0:  # ellipsoid shell
            r = np.sqrt(1 - v**2)
            pts = np.stack([r * np.cos(u), r * np.sin(u), v], -1)
            pts *= rng.uniform(0.4, 1.0, 3)
        elif family == 1:  # box surface
            pts = rng.uniform(-1, 1, (n_points, 3))
            ax = rng.integers(0, 3, n_points)
            pts[np.arange(n_points), ax] = np.sign(pts[np.arange(n_points), ax])
            pts *= rng.uniform(0.4, 0.9, 3)
        elif family == 2:  # two-lobe blend
            r = np.sqrt(1 - v**2)
            pts = np.stack([r * np.cos(u), r * np.sin(u), v], -1) * 0.5
            side = rng.integers(0, 2, n_points) * 2 - 1
            pts[:, 0] += side * rng.uniform(0.3, 0.6)
        else:  # torus
            w = rng.uniform(0, 2 * np.pi, n_points)
            rr = rng.uniform(0.15, 0.35)
            pts = np.stack(
                [
                    (1 + rr * np.cos(w)) * np.cos(u),
                    (1 + rr * np.cos(w)) * np.sin(u),
                    rr * np.sin(w),
                ],
                -1,
            ) * 0.6
        # random rotation about z + global scale to ~0.35 std
        th = rng.uniform(0, 2 * np.pi)
        rot = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        )
        pts = pts @ rot.T
        pts -= pts.mean(0)
        pts *= 0.35 / (pts.std() + 1e-8)
        out[idx] = pts
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn-impl", default="folded_pallas")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--n-points", type=int, default=2048)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--eval-clouds", type=int, default=64)
    ap.add_argument("--sampler-steps", type=int, default=64)
    ap.add_argument("--out", default="/tmp/flagship_validation.jsonl")
    ap.add_argument(
        "--families", type=int, default=4,
        help="number of shape families in the mixture (1 = ellipsoids only, "
        "an easier target where 1-NN ~ 0.5 is reachable in a few k steps)",
    )
    ap.add_argument(
        "--lr-schedule", default="constant",
        choices=("constant", "cosine", "invsqrt"),
        help="learning-rate schedule over --steps: the round-2 fixed-lr runs "
        "oscillated on the 4-family mixture after the 6k-step minimum "
        "(BASELINE.md); decay stabilises the tail",
    )
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument(
        "--final-eval-solver-steps", type=int, default=0,
        help="if set, run one extra evaluation of the final EMA with this "
        "many Heun steps (the periodic evals use --sampler-steps=64 for "
        "speed; the flagship protocol is 128 — reference "
        "infer_unconditional/__main__.py:61)",
    )
    ap.add_argument(
        "--final-eval-clouds", type=int, default=0,
        help="sample/held-out set size for the final full-protocol eval "
        "(0 = reuse --eval-clouds). The final eval always draws a FRESH "
        "held-out set (seed 54321) so it is independent of the periodic "
        "evals' comparison set",
    )
    ap.add_argument(
        "--save-ema", default="",
        help="directory to orbax-save the final EMA tree into (restorable "
        "with orbax StandardCheckpointer against an abstract tree of the "
        "same model); empty = don't save",
    )
    ap.add_argument(
        "--remat", action="store_true",
        help="per-layer rematerialisation: required for --attn-impl xla at "
        "batch 48 (plain attention OOMs HBM without it); the fused-kernel "
        "path fits without and runs ~14%% faster",
    )
    ap.add_argument(
        "--snapshot-every", type=int, default=1000,
        help="rotating pre-divergence snapshots (model/ema/opt) every N "
        "steps, keeping the last 2 — a NaN abort then leaves a bisectable "
        "state at most N steps before the divergence (round-4 lesson: the "
        "r4b runs burned 2800+ steps printing 'loss nan' and left nothing "
        "to bisect from; 0 disables)",
    )
    ap.add_argument(
        "--snapshot-dir", default="",
        help="snapshot directory (default: <out>.snapshots)",
    )
    ap.add_argument(
        "--restore", default="",
        help="resume model/ema/opt from a snapshot dir saved by "
        "--snapshot-every (for single-variable divergence bisects: restore "
        "the last clean state, change ONE kernel env knob, rerun)",
    )
    ap.add_argument(
        "--start-step", type=int, default=0,
        help="first step index when resuming (affects LR schedule position, "
        "data stream and PRNG folding)",
    )
    args = ap.parse_args()

    from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
    from gecco_tpu.benchmark import batched_pairwise_distance, cov, mmd, one_nn_accuracy
    from gecco_tpu.metrics import chamfer_distance
    from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork
    from gecco_tpu.train import make_train_step

    key = jax.random.PRNGKey(0)
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk, n_layers=6, feature_dim=384, num_inducers=64, embed_dim=1,
        num_heads=8, compute_dtype=jnp.bfloat16, attn_impl=args.attn_impl,
        remat=args.remat,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=384)
    sched = LogUniformSchedule(
        sigma_max=165.0, sigma_min=0.002, n_solver_steps=args.sampler_steps
    )
    model = Diffusion.init(
        net, sched, reparam=GaussianReparam.init([0.0] * 3, [0.35] * 3)
    )

    if args.lr_schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, args.warmup, args.steps, end_value=0.02 * args.lr
        )
    elif args.lr_schedule == "invsqrt":
        w = max(args.warmup, 1)
        lr = lambda t: args.lr * jnp.minimum(t / w, 1.0) * jnp.sqrt(
            w / jnp.maximum(t, w)
        )
    else:
        lr = args.lr
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adabelief(lr))
    step = make_train_step(opt)
    ema = jax.tree.map(jnp.copy, model)
    opt_state = opt.init(model)

    rng = np.random.default_rng(0)
    heldout = make_clouds(
        np.random.default_rng(12345), args.eval_clouds, args.n_points, args.families
    )

    sample_fn = jax.jit(
        lambda m, k: m.sample(k, (args.eval_clouds, args.n_points, 3))
    )

    def evaluate(ema_model, step_no, t_start, extra=None, n_clouds=None, ref=None):
        if n_clouds is None:
            samples = np.asarray(sample_fn(ema_model, jax.random.PRNGKey(step_no)))
            ref = heldout
        else:
            samples = np.asarray(
                jax.jit(lambda m, k: m.sample(k, (n_clouds, args.n_points, 3)))(
                    ema_model, jax.random.PRNGKey(step_no)
                )
            )
        ss = np.asarray(batched_pairwise_distance(samples, samples, chamfer_distance))
        sd = np.asarray(batched_pairwise_distance(samples, ref, chamfer_distance))
        dd = np.asarray(batched_pairwise_distance(ref, ref, chamfer_distance))
        rec = {
            "step": step_no,
            "attn_impl": args.attn_impl,
            "wall_s": round(time.time() - t_start, 1),
            "one_nn": round(one_nn_accuracy(ss, sd, dd), 4),
            "mmd": mmd(sd),
            "cov": cov(sd),
        }
        if extra:
            rec.update(extra)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    def save_state(tag, step_no):
        """Orbax-save (model, ema, opt) under <snapshot-dir>/<tag>."""
        import orbax.checkpoint as ocp

        base = args.snapshot_dir or (args.out + ".snapshots")
        path = os.path.abspath(os.path.join(base, tag))
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
        # reseed the host data stream deterministically from the resume
        # point: every bisect arm resuming from the same snapshot sees the
        # same batches (replaying the original generator exactly would cost
        # minutes of host RNG; i.i.d. procedural data makes it unnecessary)
        rng = np.random.default_rng((917, args.start_step))

    t0 = time.time()
    losses = []
    snaps: list[str] = []
    for i in range(args.start_step, args.steps):
        pts = jnp.asarray(make_clouds(rng, args.batch, args.n_points, args.families))
        loss, model, ema, opt_state = step(
            model, ema, opt_state, pts, None, jax.random.fold_in(key, i)
        )
        if i % 100 == 0:
            losses.append(float(loss))
            print(f"step {i} loss {losses[-1]:.4f}", flush=True)
            if not np.isfinite(losses[-1]):
                # NaN abort (round-4 lesson: the r4b runs printed 'loss nan'
                # for thousands of steps, then spent the final-eval budget
                # sampling a NaN model — and left no bisectable state).
                # Save the divergent state next to the last clean snapshot.
                save_state("divergent", i)
                with open(args.out, "a") as f:
                    f.write(json.dumps({
                        "step": i, "attn_impl": args.attn_impl,
                        "aborted": "non-finite loss",
                        "last_snapshots": snaps[-2:],
                    }) + "\n")
                print(
                    f"[validate] ABORT: non-finite loss at step {i}; "
                    f"pre-divergence snapshots: {snaps[-2:]}", flush=True,
                )
                raise SystemExit(3)
        if args.snapshot_every and (i + 1) % args.snapshot_every == 0:
            snaps.append(save_state(f"snap-{i + 1}", i + 1))
            while len(snaps) > 2:  # rotate, keep the last two
                shutil.rmtree(snaps.pop(0), ignore_errors=True)
        if (i + 1) % args.eval_every == 0 or i + 1 == args.steps:
            evaluate(ema, i + 1, t0)

    if args.final_eval_solver_steps:
        # n_solver_steps is a static field, so this retraces sample_fn once
        ema_full = ema.replace(
            schedule=ema.schedule.replace(
                n_solver_steps=args.final_eval_solver_steps
            )
        )
        n_final = args.final_eval_clouds or args.eval_clouds
        heldout_final = make_clouds(
            np.random.default_rng(54321), n_final, args.n_points, args.families
        )
        evaluate(
            ema_full, args.steps, t0,
            extra={"final_eval_solver_steps": args.final_eval_solver_steps,
                   "final_eval_clouds": n_final},
            n_clouds=n_final, ref=heldout_final,
        )

    if args.save_ema:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(os.path.join(args.save_ema, "ema")), ema)
        ckptr.wait_until_finished()
        print(f"saved final EMA under {args.save_ema}/ema", flush=True)


if __name__ == "__main__":
    main()
