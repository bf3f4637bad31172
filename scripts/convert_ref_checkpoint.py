#!/usr/bin/env python
"""Convert a reference gecco-jax EMA checkpoint (.eqx) to a gecco_tpu orbax
checkpoint, ready for `python -m gecco_tpu.infer`.

Fetch -> convert -> eval recipe (BASELINE.md "chamfer within 1%" target):

1. FETCH (needs network access; this container has none):
     wget https://datasets.epfl.ch/gecco-weights/shapenet_airplane.eqx
   (released EMA weights, gecco-jax/README.md:9)
2. CONVERT:
     python scripts/convert_ref_checkpoint.py shapenet_airplane.eqx \
         --out /path/to/run_dir
   writes /path/to/run_dir/checkpoint-step-0/{model,ema,opt-absent} in our
   layout (EMA == model: the reference ships EMA weights only).
3. EVAL (one command; computes 1-NN / MMD / COV of samples vs the val set):
     python scripts/eval_reference_parity.py /path/to/run_dir \
         --data $SHAPENET_PF_ROOT --category 02691156

Architecture knobs default to the flagship (6 layers, C=384, I=64, H=8,
sigma_max=165); override to match other released checkpoints. The model is
built with ref_jax_compat=True so the forward matches gecco-jax bit for bit
(second-MLP stream quirk, reference models/set_transformer.py:216-217).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_model(
    n_layers=6,
    feature_dim=384,
    num_inducers=64,
    num_heads=8,
    sigma_max=165.0,
    reparam_mean=(0.0, 0.0, 0.0),
    reparam_std=(0.35, 0.35, 0.35),
):
    from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
    from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork

    bk, nk = jax.random.split(jax.random.PRNGKey(0))
    backbone = SetTransformer.init(
        bk,
        n_layers=n_layers,
        feature_dim=feature_dim,
        num_inducers=num_inducers,
        embed_dim=1,
        num_heads=num_heads,
        compute_dtype=jnp.bfloat16,
        attn_impl="folded_pallas",
        ref_jax_compat=True,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=feature_dim)
    sched = LogUniformSchedule(sigma_max=sigma_max, sigma_min=0.002, n_solver_steps=128)
    return Diffusion.init(
        net,
        sched,
        reparam=GaussianReparam.init(list(reparam_mean), list(reparam_std)),
    )


def convert(eqx_path: str, **arch_kw):
    from gecco_tpu.compat import load_flagship_from_eqx

    model = build_model(**arch_kw)
    # the checkpoint's embedded reparam stats overwrite the placeholders
    return load_flagship_from_eqx(model, eqx_path)


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("eqx", help="reference EMA checkpoint (.eqx)")
    p.add_argument("--out", required=True, help="output run directory")
    p.add_argument("--n-layers", type=int, default=6)
    p.add_argument("--feature-dim", type=int, default=384)
    p.add_argument("--num-inducers", type=int, default=64)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--sigma-max", type=float, default=165.0)
    args = p.parse_args()

    import orbax.checkpoint as ocp

    model = convert(
        args.eqx,
        n_layers=args.n_layers,
        feature_dim=args.feature_dim,
        num_inducers=args.num_inducers,
        num_heads=args.num_heads,
        sigma_max=args.sigma_max,
    )

    ckpt_dir = os.path.abspath(os.path.join(args.out, "checkpoint-step-0"))
    ckptr = ocp.StandardCheckpointer()
    for name in ("model", "ema"):  # reference ships EMA weights only
        ckptr.save(os.path.join(ckpt_dir, name), model)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({"step": 0, "source": os.path.abspath(args.eqx)}, f)
    print(f"Converted {args.eqx} -> {ckpt_dir}")


if __name__ == "__main__":
    main()
