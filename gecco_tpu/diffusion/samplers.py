"""Scan-compiled EDM samplers (deterministic Heun, stochastic churn+Heun,
inpainting/completion).

The reference implements the ODE sampler via diffrax Heun + StepTo
(gecco-jax/src/gecco_jax/models/diffusion.py:333-374) and the SDE sampler as
a ``lax.fori_loop`` (gecco-jax/src/gecco_jax/models/stochastic.py:13-69); the
torch package loops in Python with one device sync per step
(gecco-torch/src/gecco_torch/diffusion.py:314-347). Here everything is one
``jax.lax.scan`` over the Karras sigma grid — a single compiled program,
zero host round-trips, batched over ``[B, N, D]``.

Both samplers share one Heun core; the deterministic (probability-flow ODE)
sampler is the stochastic one with churn 0 and second-order correction on
every transition, which matches diffrax's fixed-grid Heun semantics.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["heun_sampler", "inpaint_sampler"]

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (sigma, x) -> x_hat


def heun_sampler(
    denoise_fn: DenoiseFn,
    sigmas: jnp.ndarray,  # [T] decreasing sigma grid
    x_init: jnp.ndarray,  # [B, N, D] drawn from N(0, sigmas[0]^2)
    key: jax.Array,
    s_churn: float = 0.0,
    s_noise: float = 1.0,
    heun_on_last: bool = False,
    save_trajectory: bool = False,
):
    """EDM Algorithm-2 sampler over a fixed sigma grid.

    With ``s_churn=0`` and ``heun_on_last=True`` this is the deterministic
    Heun probability-flow sampler (models/diffusion.py:333-374); with churn
    it reproduces the stochastic sampler (models/stochastic.py:29-57), whose
    final transition is Euler-only (``i < n_steps - 1`` cond at :50-55).

    Returns ``(x_final, trajectory | None)`` where the trajectory stacks the
    state after every transition, ``[T-1, B, N, D]``.
    """
    n_transitions = sigmas.shape[0] - 1
    gamma = min(s_churn / n_transitions, math.sqrt(2.0) - 1.0)

    sigma_cur = sigmas[:-1]
    sigma_next = sigmas[1:]
    is_last = jnp.arange(n_transitions) == n_transitions - 1

    def body(carry, inp):
        x, rng = carry
        s_cur, s_next, last = inp
        rng, churn_key = jax.random.split(rng)

        s_hat = s_cur * (1.0 + gamma)
        churn_std = jnp.sqrt(jnp.maximum(s_hat**2 - s_cur**2, 0.0)) * s_noise
        x_hat = x + churn_std * jax.random.normal(churn_key, x.shape, x.dtype)

        denoised = denoise_fn(s_hat, x_hat)
        d_cur = (x_hat - denoised) / s_hat
        x_euler = x_hat + (s_next - s_hat) * d_cur

        def second_order(x_e):
            denoised2 = denoise_fn(s_next, x_e)
            d_prime = (x_e - denoised2) / s_next
            return x_hat + (s_next - s_hat) * (0.5 * d_cur + 0.5 * d_prime)

        if heun_on_last:
            x_next = second_order(x_euler)
        else:
            x_next = jax.lax.cond(last, lambda v: v, second_order, x_euler)

        out = x_next if save_trajectory else None
        return (x_next, rng), out

    (x_final, _), trajectory = jax.lax.scan(
        body, (x_init, key), (sigma_cur, sigma_next, is_last)
    )
    return x_final, trajectory


def inpaint_sampler(
    denoise_fn: DenoiseFn,
    sigmas: jnp.ndarray,  # [T] decreasing (extended grid)
    known_diff: jnp.ndarray,  # [B, M, D] known points in diffusion space
    m_to_inpaint: int,
    key: jax.Array,
    s_churn: float = 0.0,
    s_noise: float = 1.0,
    n_substeps: int = 1,
):
    """RePaint-style completion (models/stochastic.py:101-202), batched.

    At every noise level the known points are re-noised to sigma and clamped
    into the tail of the state; ``n_substeps`` resampling iterations re-noise
    back up between denoising steps. Returns the ``m_to_inpaint`` generated
    points, ``[B, m_to_inpaint, D]``.
    """
    b, m, d = known_diff.shape
    n_transitions = sigmas.shape[0] - 1
    gamma = min(s_churn / n_transitions, math.sqrt(2.0) - 1.0)

    init_key, loop_key = jax.random.split(key)

    x_init = jnp.concatenate(
        [jnp.zeros((b, m_to_inpaint, d), known_diff.dtype), known_diff], axis=1
    )
    x_init = x_init + sigmas[0] * jax.random.normal(init_key, x_init.shape)

    sigma_cur = sigmas[:-1]
    sigma_next = sigmas[1:]
    is_last = jnp.arange(n_transitions) == n_transitions - 1

    def outer_body(carry, inp):
        s_cur, s_next, last = inp

        def inner_body(j, x_and_rng):
            x, rng = x_and_rng
            rng, churn_key, known_key, redo_key = jax.random.split(rng, 4)

            # clamp the known points, re-noised to the current level
            # (models/stochastic.py:136-142)
            known_noisy = known_diff + s_cur * jax.random.normal(
                known_key, known_diff.shape
            )
            x = jnp.concatenate([x[:, :m_to_inpaint], known_noisy], axis=1)

            s_hat = s_cur * (1.0 + gamma)
            churn_std = jnp.sqrt(jnp.maximum(s_hat**2 - s_cur**2, 0.0)) * s_noise
            x_hat = x + churn_std * jax.random.normal(churn_key, x.shape)

            denoised = denoise_fn(s_hat, x_hat)
            d_cur = (x_hat - denoised) / s_hat
            x_euler = x_hat + (s_next - s_hat) * d_cur

            def second_order(x_e):
                denoised2 = denoise_fn(s_next, x_e)
                d_prime = (x_e - denoised2) / s_next
                return x_hat + (s_next - s_hat) * (0.5 * d_cur + 0.5 * d_prime)

            x_next = jax.lax.cond(last, lambda v: v, second_order, x_euler)

            # resample: re-noise back up unless this is the final substep
            # (models/stochastic.py:165-174)
            def redo_noise(v):
                std = jnp.sqrt(jnp.maximum(s_cur**2 - s_next**2, 0.0))
                return v + std * jax.random.normal(redo_key, v.shape)

            x_next = jax.lax.cond(
                j < n_substeps - 1, redo_noise, lambda v: v, x_next
            )
            return (x_next, rng)

        carry = jax.lax.fori_loop(0, n_substeps, inner_body, carry)
        return carry, None

    (x_final, _), _ = jax.lax.scan(
        outer_body, (x_init, loop_key), (sigma_cur, sigma_next, is_last)
    )
    return x_final[:, :m_to_inpaint]
