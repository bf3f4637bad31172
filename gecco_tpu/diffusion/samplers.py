"""Scan-compiled EDM samplers (deterministic Heun, stochastic churn+Heun,
inpainting/completion).

The reference implements the ODE sampler via diffrax Heun + StepTo
(gecco-jax/src/gecco_jax/models/diffusion.py:333-374) and the SDE sampler as
a ``lax.fori_loop`` (gecco-jax/src/gecco_jax/models/stochastic.py:13-69); the
torch package loops in Python with one device sync per step
(gecco-torch/src/gecco_torch/diffusion.py:314-347). Here everything is one
``jax.lax.scan`` over the Karras sigma grid — a single compiled program,
zero host round-trips, batched over ``[B, N, D]``.

All samplers (including ``Diffusion.upsample``) share ONE transition core,
``heun_step``: churn then Heun with an optional second-order correction. The
deterministic (probability-flow ODE) sampler is the stochastic one with churn
0 and second-order correction on every transition, which matches diffrax's
fixed-grid Heun semantics.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

__all__ = ["heun_step", "churn_gamma", "heun_sampler", "inpaint_sampler"]

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (sigma, x) -> x_hat


def churn_gamma(s_churn: float, n_transitions: int) -> float:
    """EDM churn rate per transition, clamped at sqrt(2)-1
    (models/stochastic.py:33-35). A static Python float: when ``s_churn=0``
    the churn branch is skipped entirely at trace time — no wasted
    per-step normal draw in the deterministic sampler."""
    return min(s_churn / n_transitions, math.sqrt(2.0) - 1.0)


def heun_step(
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,  # [B, N, D] state at sigma = s_cur
    s_cur: jnp.ndarray,
    s_next: jnp.ndarray,
    *,
    gamma: float = 0.0,
    s_noise: float = 1.0,
    key: Optional[jax.Array] = None,
    second_order: Union[bool, jnp.ndarray] = True,
) -> jnp.ndarray:
    """One EDM Algorithm-2 transition s_cur -> s_next, shared by every
    sampler (ODE / SDE / inpaint / upsample).

    ``gamma`` is a static Python float (churn is traced out when 0);
    ``second_order`` may be static (ODE sampler: always True) or traced
    (SDE/inpaint: Euler-only on the final transition,
    models/stochastic.py:50-55).
    """
    if gamma > 0.0:
        if key is None:
            raise ValueError("churn (gamma > 0) requires a PRNG key")
        s_hat = s_cur * (1.0 + gamma)
        churn_std = jnp.sqrt(jnp.maximum(s_hat**2 - s_cur**2, 0.0)) * s_noise
        x_hat = x + churn_std * jax.random.normal(key, x.shape, x.dtype)
    else:
        s_hat, x_hat = s_cur, x

    denoised = denoise_fn(s_hat, x_hat)
    d_cur = (x_hat - denoised) / s_hat
    x_euler = x_hat + (s_next - s_hat) * d_cur

    def _second_order(x_e):
        denoised2 = denoise_fn(s_next, x_e)
        d_prime = (x_e - denoised2) / s_next
        return x_hat + (s_next - s_hat) * (0.5 * d_cur + 0.5 * d_prime)

    if isinstance(second_order, bool):
        return _second_order(x_euler) if second_order else x_euler
    return jax.lax.cond(second_order, _second_order, lambda v: v, x_euler)


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
    gamma = churn_gamma(s_churn, n_transitions)

    sigma_cur = sigmas[:-1]
    sigma_next = sigmas[1:]
    is_last = jnp.arange(n_transitions) == n_transitions - 1

    def body(carry, inp):
        x, rng = carry
        s_cur, s_next, last = inp
        if gamma > 0.0:
            rng, churn_key = jax.random.split(rng)
        else:
            churn_key = None

        x_next = heun_step(
            denoise_fn,
            x,
            s_cur,
            s_next,
            gamma=gamma,
            s_noise=s_noise,
            key=churn_key,
            second_order=True if heun_on_last else jnp.logical_not(last),
        )
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
    back up between denoising steps. Like the reference (stochastic.py:165-174),
    the re-noise-up (redo) step is guarded only by the substep counter — it
    also runs on the final noise level (contrast ``Diffusion.upsample``, which
    additionally skips it there). Returns the ``m_to_inpaint`` generated
    points, ``[B, m_to_inpaint, D]``.
    """
    b, m, d = known_diff.shape
    n_transitions = sigmas.shape[0] - 1
    gamma = churn_gamma(s_churn, n_transitions)

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

            x_next = heun_step(
                denoise_fn,
                x,
                s_cur,
                s_next,
                gamma=gamma,
                s_noise=s_noise,
                key=churn_key if gamma > 0.0 else None,
                second_order=jnp.logical_not(last),
            )

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
