"""Per-op xprof accounting of the TRAIN step (round-4 VERDICT #2).

Mirrors scripts/profile_denoiser.py for the full jitted train step (loss ->
grads -> optimizer -> EMA): runs a few steps under ``jax.profiler.trace``
and prints per-op device self-time per step, so the forward/backward kernel
split and the optimizer/EMA overhead are itemised against a derived
fwd+bwd roofline.

Usage: python scripts/profile_train_step.py [--config flagship|8k]
       [--batch 48] [--steps 4] [--top 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xprof_util import per_op_self_time_ms, trace_events_from_xplane  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="flagship", choices=["flagship", "8k"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from bench import build_model, build_scaled8k_model
    from gecco_tpu.train import make_train_step

    if args.config == "flagship":
        model = build_model(jnp.bfloat16, attn_impl="folded_pallas")
        batch = args.batch or 48
        n_points = 2048
    else:
        model = build_scaled8k_model()
        batch = args.batch or 16
        n_points = 8192

    opt = optax.adabelief(3e-4)
    step_fn = make_train_step(opt, donate=False)
    ema = jax.tree.map(jnp.copy, model)
    opt_state = opt.init(model)
    pts = jax.random.normal(jax.random.PRNGKey(0), (batch, n_points, 3)) * 0.35

    key = jax.random.PRNGKey(1)

    def run(k_steps, m, e, o):
        loss = None
        for i in range(k_steps):
            loss, m, e, o = step_fn(m, e, o, pts, None, jax.random.fold_in(key, i))
        return float(loss), m, e, o

    _, model, ema, opt_state = run(2, model, ema, opt_state)  # compile + warm

    logdir = tempfile.mkdtemp(prefix="gecco_trainprof_")
    with jax.profiler.trace(logdir):
        run(args.steps, model, ema, opt_state)

    per_op = per_op_self_time_ms(trace_events_from_xplane(logdir))
    total = sum(per_op.values())
    print(
        f"device self-time total: {total:.3f} ms over {args.steps} steps "
        f"({total / args.steps:.3f} ms/step, batch {batch}, {n_points} pts)"
    )
    print(f"{'ms/step':>9}  {'% ':>6}  op (self time)")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms / args.steps:9.4f}  {100 * ms / total:5.1f}%  {name[:120]}")


if __name__ == "__main__":
    main()
