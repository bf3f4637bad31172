"""Headline benchmark: sampled clouds/sec/chip on the flagship config.

Protocol (BASELINE.md): ShapeNet-scale unconditional denoiser — 6 layers,
feature_dim 384, 64 inducers, 8 heads — sampling 2048-point clouds with the
128-step Karras/Heun ODE sampler at batch 64.

The reference repo publishes no absolute numbers (BASELINE.md), so the
baseline is a faithful reference-STRUCTURE implementation run on the SAME
chip with the SAME weights (gecco_tpu/baselines/reference_jax.py): per-example
modules under vmap, per-head vmap attention with separate/unfused projections,
a python loop over layers, fp32 activations, fixed-grid Heun — mirroring
gecco-jax/src/gecco_jax/models/{set_transformer.py:17-249, diffusion.py:333-439}.
``tests/test_reference_baseline.py`` proves it computes the same function as
the optimized model. ``vs_baseline`` is optimized throughput over that
reference-structure throughput: an implementation comparison, not a strawman.

Timing notes (axon v5e relay): ``block_until_ready()`` does not block, so all
timings force a scalar host fetch; per-call dispatch overhead is ~30 ms, so
per-eval latency is amortized over an in-program scan chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork

BATCH = 64
N_POINTS = 2048
N_STEPS = 128


def build_model(compute_dtype, attn_impl="xla"):
    key = jax.random.PRNGKey(0)
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk,
        n_layers=6,
        feature_dim=384,
        num_inducers=64,
        embed_dim=1,
        num_heads=8,
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=384)
    sched = LogUniformSchedule(sigma_max=165.0, sigma_min=0.002, n_solver_steps=N_STEPS)
    return Diffusion.init(
        net, sched, reparam=GaussianReparam.init([0.0] * 3, [0.35] * 3)
    )


def _time_calls(fn, reps, *args):
    """min-of-reps wall time of ``float(fn(*args))`` after one warmup call.

    The scalar host fetch is the only honest completion barrier on the axon
    runtime (block_until_ready returns early)."""
    float(fn(*args))  # compile + warm
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def time_sampler(model, reps):
    sample_fn = jax.jit(lambda m, k: m.sample(k, (BATCH, N_POINTS, 3)).sum())
    best = _time_calls(sample_fn, reps, model, jax.random.PRNGKey(1))
    return BATCH / best  # clouds per second


def time_ref_sampler(model, reps):
    """Reference-structure baseline arm, same weights, same protocol."""
    from gecco_tpu.baselines import ref_sample

    fn = jax.jit(
        lambda m, k: ref_sample(m, k, (BATCH, N_POINTS, 3), n_solver_steps=N_STEPS).sum()
    )
    best = _time_calls(fn, reps, model, jax.random.PRNGKey(1))
    return BATCH / best


def time_denoise_step(model, reps=10, k_evals=8):
    """p50 per-eval latency, amortized over an in-program chain of k_evals
    dependent denoiser calls (otherwise the ~30 ms relay dispatch overhead
    doubles the number)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (BATCH, N_POINTS, 3))
    sigma = jnp.full((BATCH,), 1.0)

    def chained(m, x0):
        def body(x, _):
            y = m.denoise(sigma, x)
            return y.astype(x.dtype), None

        y, _ = jax.lax.scan(body, x0, None, length=k_evals)
        return y.sum()

    fn = jax.jit(chained)
    float(fn(model, x))  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(model, x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / k_evals  # p50, per eval


def time_train_step(reps=5):
    """Full train step (loss->grad->adabelief->EMA) at the reference's
    batch 48, with remat + pallas attention (the training configs' setup)."""
    import optax

    from gecco_tpu.train import make_train_step

    key = jax.random.PRNGKey(0)
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk, n_layers=6, feature_dim=384, num_inducers=64, embed_dim=1,
        num_heads=8, compute_dtype=jnp.bfloat16, attn_impl="folded_pallas", remat=True,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=384)
    sched = LogUniformSchedule(sigma_max=165.0, sigma_min=0.002, n_solver_steps=N_STEPS)
    model = Diffusion.init(net, sched, reparam=GaussianReparam.init([0.0] * 3, [0.35] * 3))
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adabelief(3e-4))
    step = make_train_step(opt)
    ema = jax.tree.map(jnp.copy, model)
    opt_state = opt.init(model)
    pts = 0.35 * jax.random.normal(jax.random.PRNGKey(1), (48, N_POINTS, 3))

    loss, model, ema, opt_state = step(model, ema, opt_state, pts, None, key)
    float(loss)
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        loss, model, ema, opt_state = step(
            model, ema, opt_state, pts, None, jax.random.fold_in(key, i)
        )
        float(loss)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    optimized = build_model(jnp.bfloat16, attn_impl="folded_pallas")
    clouds_per_sec = time_sampler(optimized, reps=3)
    p50_step = time_denoise_step(optimized)

    # reference-structure arm: same weights, fp32, unfused, per-example vmap
    baseline_clouds_per_sec = time_ref_sampler(optimized, reps=2)

    try:
        train_step_s = time_train_step()
    except Exception:
        train_step_s = None

    result = {
        "metric": "sampled clouds/sec/chip (2048 pts, 128-step Heun ODE, batch 64)",
        "value": round(clouds_per_sec, 3),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / baseline_clouds_per_sec, 3),
        "extra": {
            "p50_denoiser_step_ms": round(p50_step * 1e3, 3),
            "baseline": (
                "reference-structure impl (gecco_tpu/baselines/reference_jax.py): "
                "same weights, fp32, per-example vmap, per-head vmap attention, "
                "unfused projections, python layer loop"
            ),
            "baseline_clouds_per_sec": round(baseline_clouds_per_sec, 3),
            "train_step_ms_batch48": (
                round(train_step_s * 1e3, 1) if train_step_s else None
            ),
            "train_examples_per_sec": (
                round(48 / train_step_s, 1) if train_step_s else None
            ),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
