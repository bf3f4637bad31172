#!/usr/bin/env python
"""Evaluate a (converted) checkpoint against a dataset with the reference's
benchmark protocol — 1-NN accuracy / MMD / COV over sample-vs-data Chamfer
distance matrices (reference benchmark.py:55-231).

One command for the BASELINE.md parity check once reference weights land:

    python scripts/eval_reference_parity.py <run_dir> \
        --data $SHAPENET_PF_ROOT --category 02691156 [--split val] \
        [--n-examples 256] [--batch 64]

Prints one JSON line with the metrics. Interpreting parity: on the val set,
a faithful conversion of the released weights reproduces the paper-level
1-NN (~0.5-0.6); a broken conversion collapses to 1-NN ~1.0.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("run_dir", help="directory containing checkpoint-step-N/")
    p.add_argument("--data", required=True, help="ShapeNet-PointFlow root")
    p.add_argument("--category", default="02691156")
    p.add_argument("--split", default="val")
    p.add_argument("--n-examples", type=int, default=256)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n-points", type=int, default=2048)
    args = p.parse_args()

    import orbax.checkpoint as ocp

    from gecco_tpu.benchmark import BenchmarkCallback
    from gecco_tpu.config import latest_checkpoint
    from gecco_tpu.data import dataloader
    from gecco_tpu.data.shapenet_pointflow import ShapeNetPointFlow

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from convert_ref_checkpoint import build_model

    model = build_model()
    ckpt, _ = latest_checkpoint(args.run_dir, return_step_number=True)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, model)
    model = ocp.StandardCheckpointer().restore(os.path.join(ckpt, "ema"), abstract)

    dataset = ShapeNetPointFlow(
        args.data, args.category, args.split, n_points=args.n_points
    )
    loader = dataloader(
        dataset, batch_size=args.batch, fixed_sampler=True, num_workers=4
    )
    bench = BenchmarkCallback.from_loader(loader, n_examples=args.n_examples)
    samples = bench.sample_from_model(model)
    scalars, _ = bench.call_without_logging(samples)
    print(json.dumps({k: float(v) for k, v in scalars.items()}))


if __name__ == "__main__":
    main()
