"""8k-config training smoke for kernel-default changes.

The kernel-change policy (BASELINE round-5 notes) gates defaults on the
drifted-magnitude certifier plus a trained-magnitude training segment.
The flagship segment covers the kernel BODIES at 6x384 shapes; this
script adds the missing shape coverage for the 12x768/8192-pt config —
a from-scratch training run long enough for logit magnitudes to grow
well past init (loss from ~1.3 to <0.95 on the procedural mixture),
with a NaN abort. It cannot substitute for a trained-magnitude segment
(no long-trained 8k state exists to restore), and is documented as
exactly that: a gross-instability smoke at the 8k kernel shapes
(v3 pool backward TN=256, widened scoped-VMEM MLP backward, v2
unpool backward tiles).

Usage: python scripts/smoke_train_8k.py [--steps 1200] [--batch 16]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validate_flagship import make_clouds  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-points", type=int, default=8192)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    from bench import build_scaled8k_model
    from gecco_tpu.train import make_train_step

    model = build_scaled8k_model()
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adabelief(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, 200, args.steps, end_value=args.lr * 0.02
            )
        ),
    )
    step_fn = make_train_step(opt, donate=False)
    ema = jax.tree.map(jnp.copy, model)
    opt_state = opt.init(model)

    rng = np.random.default_rng(17)
    # a fixed pool of clouds re-batched each step: large enough to force
    # generalisation-style gradients, small enough to build once
    pool = make_clouds(rng, 256, args.n_points)
    key = jax.random.PRNGKey(3)

    t0 = time.time()
    losses = []
    for i in range(args.steps):
        idx = rng.integers(0, len(pool), args.batch)
        pts = jnp.asarray(pool[idx])
        loss, model, ema, opt_state = step_fn(
            model, ema, opt_state, pts, None, jax.random.fold_in(key, i)
        )
        if (i + 1) % args.log_every == 0 or i == 0:
            lv = float(loss)
            losses.append(lv)
            print(f"step {i + 1} loss {lv:.4f}", flush=True)
            if not math.isfinite(lv):
                print(f"[smoke] NON-FINITE LOSS at step {i + 1} — ABORT")
                sys.exit(2)
    dt = time.time() - t0
    print(
        f"[smoke] {args.steps} steps in {dt:.0f} s "
        f"({1000 * dt / args.steps:.1f} ms/step incl. host sync), "
        f"loss first/last logged {losses[0]:.4f} -> {losses[-1]:.4f}"
    )
    if losses[-1] >= losses[0]:
        print("[smoke] WARNING: loss did not decrease")
        sys.exit(3)
    print("[smoke] PASS")


if __name__ == "__main__":
    main()
