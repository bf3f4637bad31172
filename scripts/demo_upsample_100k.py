"""100k-point upsampling demo (the reference's headline capability).

The reference showcases inducer-cache upsampling to ~100k points in
gecco-torch/notebooks/inference.ipynb (``n_new=100_000``, mechanism at
gecco-torch/src/gecco_torch/diffusion.py:354-470). This script demonstrates
the same at scale on the TPU stack:

1. trains a small denoiser on procedural ellipsoid shells (minutes),
2. takes a 2048-point observation of a HELD-OUT dense ground-truth cloud,
3. upsamples it to ``--n-new`` points with ``Diffusion.upsample`` (per noise
   level: one full pass on the observation to refresh the per-layer inducer
   caches, then n_substeps cheap unpool-only passes on the new points),
4. reports wall time and chamfer(upsampled -> dense GT) vs the baselines
   chamfer(observation -> dense GT) and chamfer(unconditional sample -> GT).

Run: python scripts/demo_upsample_100k.py --n-new 100000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

# the axon sitecustomize pre-imports jax under JAX_PLATFORMS=axon, so a
# plain env var is too late to select CPU for off-TPU smoke runs
if os.environ.get("GECCO_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from scripts.validate_flagship import make_clouds  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-new", type=int, default=100_000)
    ap.add_argument("--n-obs", type=int, default=2048)
    ap.add_argument("--train-steps", type=int, default=8000)
    ap.add_argument("--train-points", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--n-substeps", type=int, default=5)
    ap.add_argument("--solver-steps", type=int, default=64)
    ap.add_argument(
        "--ema-path", default="",
        help="orbax dir holding a saved EMA tree (validate_flagship "
        "--save-ema layout: <dir>/ema). When set, training is skipped and "
        "the demo upsamples with that model — pass matching --layers/"
        "--width/--heads (the flagship EMA is 6/384/8)",
    )
    ap.add_argument(
        "--families", type=int, default=1,
        help="shape families for the dense GT cloud (match what the model "
        "was trained on: validate_flagship default is 4)",
    )
    ap.add_argument(
        "--attn-impl", default="folded_pallas",
        help="xla for off-TPU smoke runs (the Pallas kernels fall back to "
        "interpret mode on CPU, which is far too slow for this demo)",
    )
    args = ap.parse_args()

    import optax

    from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
    from gecco_tpu.metrics import chamfer_distance
    from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork
    from gecco_tpu.train import make_train_step

    key = jax.random.PRNGKey(0)
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk, n_layers=args.layers, feature_dim=args.width,
        num_inducers=64, embed_dim=1, num_heads=args.heads,
        compute_dtype=jnp.bfloat16, attn_impl=args.attn_impl,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=args.width)
    sched = LogUniformSchedule(
        sigma_max=165.0, sigma_min=0.002, n_solver_steps=args.solver_steps
    )
    model = Diffusion.init(
        net, sched, reparam=GaussianReparam.init([0.0] * 3, [0.35] * 3)
    )

    if args.ema_path:
        import orbax.checkpoint as ocp

        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, model)
        ema = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(args.ema_path, "ema")), abstract
        )
        print(f"restored EMA from {args.ema_path}/ema — skipping training")
    else:
        opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adabelief(3e-4))
        step = make_train_step(opt)
        ema = jax.tree.map(jnp.copy, model)
        opt_state = opt.init(model)

        rng = np.random.default_rng(0)
        t0 = time.time()
        for i in range(args.train_steps):
            pts = jnp.asarray(
                make_clouds(rng, args.batch, args.train_points, args.families)
            )
            loss, model, ema, opt_state = step(
                model, ema, opt_state, pts, None, jax.random.fold_in(key, i)
            )
            if i % 500 == 0:
                print(f"step {i} loss {float(loss):.4f}", flush=True)
        print(f"trained {args.train_steps} steps in {time.time()-t0:.0f} s")

    # held-out dense GT; the observation is a random 2048-point subset
    dense_gt = make_clouds(np.random.default_rng(999), 1, args.n_new, args.families)
    obs_idx = np.random.default_rng(1).permutation(args.n_new)[: args.n_obs]
    obs = dense_gt[:, obs_idx]

    up_fn = jax.jit(
        lambda m, k, d: m.upsample(k, d, n_new=args.n_new, n_substeps=args.n_substeps)
    )
    up = up_fn(ema, jax.random.PRNGKey(7), jnp.asarray(obs))
    _ = float(up.sum())  # compile barrier
    t1 = time.time()
    up = up_fn(ema, jax.random.PRNGKey(8), jnp.asarray(obs))
    _ = float(up.sum())
    wall = time.time() - t1

    samp = jax.jit(lambda m, k: m.sample(k, (1, args.n_obs, 3)))(
        ema, jax.random.PRNGKey(9)
    )

    cd = jax.jit(chamfer_distance)
    rec = {
        "n_new": args.n_new,
        "upsample_wall_s": round(wall, 2),
        "chamfer_upsampled_vs_dense_gt": float(cd(np.asarray(up)[0], dense_gt[0])),
        "chamfer_observation_vs_dense_gt": float(cd(obs[0], dense_gt[0])),
        "chamfer_uncond_sample_vs_dense_gt": float(
            cd(np.asarray(samp)[0], dense_gt[0])
        ),
        "model": f"{args.layers}x{args.width}, I=64"
        + (f" (EMA from {args.ema_path})" if args.ema_path else ""),
        "families": args.families,
        "n_substeps": args.n_substeps,
        "solver_steps": args.solver_steps,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
