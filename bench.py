"""Headline benchmark: sampled clouds/sec/chip on the flagship config.

Protocol (BASELINE.md): ShapeNet-scale unconditional denoiser — 6 layers,
feature_dim 384, 64 inducers, 8 heads — sampling 2048-point clouds with the
128-step Karras/Heun ODE sampler at batch 64.

Since the reference repo publishes no absolute numbers (BASELINE.md), the
baseline measured here is a faithful reference-style implementation run on
the SAME chip: fp32 activations (the reference jax package has no mixed
precision) with the same architecture. ``vs_baseline`` is our optimized
(bf16, fused-kv, scan-compiled) throughput over that reference-style
throughput.

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


def time_sampler(model, reps):
    # reduce to a scalar on device and fetch it: on the axon runtime,
    # block_until_ready() returns before remote execution completes, so only
    # a host fetch gives honest timings
    sample_fn = jax.jit(lambda m, k: m.sample(k, (BATCH, N_POINTS, 3)).sum())
    key = jax.random.PRNGKey(1)
    float(sample_fn(model, key))  # compile
    times = []
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        float(sample_fn(model, k))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return BATCH / best  # clouds per second


def time_denoise_step(model, reps=20):
    x = jax.random.normal(jax.random.PRNGKey(2), (BATCH, N_POINTS, 3))
    sigma = jnp.full((BATCH,), 1.0)
    fn = jax.jit(lambda m, s, x: m.denoise(s, x).sum())
    float(fn(model, sigma, x))  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(model, sigma, x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]  # p50


def time_train_step(reps=5):
    """Full train step (loss->grad->adabelief->EMA) at the reference's
    batch 48, with remat + pallas attention (the training configs' setup)."""
    import optax

    from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork
    from gecco_tpu.train import make_train_step

    key = jax.random.PRNGKey(0)
    bk, nk = jax.random.split(key)
    backbone = SetTransformer.init(
        bk, n_layers=6, feature_dim=384, num_inducers=64, embed_dim=1,
        num_heads=8, compute_dtype=jnp.bfloat16, attn_impl="pallas", remat=True,
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
    optimized = build_model(jnp.bfloat16, attn_impl="pallas")
    clouds_per_sec = time_sampler(optimized, reps=3)
    p50_step = time_denoise_step(optimized)

    baseline = build_model(jnp.float32, attn_impl="xla")
    baseline_clouds_per_sec = time_sampler(baseline, reps=2)

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
            "baseline": "same architecture, fp32 (reference-style precision)",
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
