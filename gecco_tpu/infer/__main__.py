"""Batch unconditional inference CLI.

Parity with gecco-jax/src/gecco_jax/infer_unconditional/__main__.py:13-79:
``python -m gecco_tpu.infer <config.py> <checkpoint-dir> [--sampler ode|sde]
[--n-solver-steps N] ...`` — rebuilds the model from the config, loads the
EMA weights, samples in batches, writes one big npz.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from gecco_tpu.config import latest_checkpoint, load_config


def load_ema_model(make_model, checkpoint_dir: str):
    """Rebuild the model from a config and restore the EMA weights."""
    import orbax.checkpoint as ocp

    model = make_model(jax.random.PRNGKey(0))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, model)
    # checkpoints store model / ema / opt as separate trees; inference uses
    # the EMA weights (reference infer_unconditional/__main__.py:18-22)
    return ckptr.restore(
        os.path.join(os.path.abspath(checkpoint_dir), "ema"), abstract
    )


def main():
    parser = argparse.ArgumentParser(description="Sample from a trained model")
    parser.add_argument("config", help="path to the training config .py")
    parser.add_argument(
        "checkpoint",
        nargs="?",
        default=None,
        help="checkpoint dir (default: latest next to the config)",
    )
    parser.add_argument("--sampler", choices=("ode", "sde"), default="ode")
    parser.add_argument("--n-samples", type=int, default=64)
    parser.add_argument("--n-points", type=int, default=2048)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--n-solver-steps", type=int, default=None)
    parser.add_argument("--s-churn", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output", default="samples.npz")
    args = parser.parse_args()

    config = load_config(os.path.abspath(args.config))
    checkpoint = args.checkpoint or latest_checkpoint(
        os.path.dirname(os.path.abspath(args.config))
    )
    model = load_ema_model(config.make_model, checkpoint)

    if args.sampler == "ode":
        sample_fn = jax.jit(
            lambda m, k: m.sample(
                k,
                (args.batch_size, args.n_points, 3),
                n_solver_steps=args.n_solver_steps,
            )
        )
    else:
        sample_fn = jax.jit(
            lambda m, k: m.sample_stochastic(
                k,
                (args.batch_size, args.n_points, 3),
                s_churn=args.s_churn,
                n_solver_steps=args.n_solver_steps,
            )
        )

    key = jax.random.PRNGKey(args.seed)
    chunks = []
    remaining = args.n_samples
    while remaining > 0:
        key, sub = jax.random.split(key)
        chunks.append(np.asarray(sample_fn(model, sub)))
        remaining -= args.batch_size
    samples = np.concatenate(chunks, axis=0)[: args.n_samples]

    np.savez(args.output, samples=samples)
    print(f"Wrote {samples.shape} samples to {args.output}")


if __name__ == "__main__":
    main()
