"""EDM noise schedules and preconditioning coefficients.

Parity with gecco-jax/src/gecco_jax/models/diffusion.py:63-171 (Karras et al.
2206.00364 "EDM" formulation). All coefficient functions are elementwise over
arrays of any shape, so a per-batch ``sigma: [B]`` flows through without vmap.

Conventions (matching the authoritative jax package, NOT gecco-torch):
- ``c_noise(sigma) = sigma`` (models/diffusion.py:94-96; torch uses
  ``log(sigma)/4``, diffusion.py:51 — a documented behavioural divergence).
- The Karras sigma grid ``t_i`` does NOT append a final 0
  (models/diffusion.py:118-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gecco_tpu.utils import module, static

__all__ = [
    "Schedule",
    "LogUniformSchedule",
    "LogNormalSchedule",
    "low_discrepancy_uniform",
]


@module
class Schedule:
    """Base EDM schedule: sigma(t) = t, scale(t) = 1 (variance exploding)."""

    sigma_max: float = static(default=25.0)
    sigma_data: float = static(default=1.0)
    n_solver_steps: int = static(default=16)
    sigma_min: float = static(default=0.002)
    rho: float = static(default=7.0)
    # 'sigma': jax-package convention (models/diffusion.py:94-96);
    # 'log_quarter': gecco-torch convention log(sigma)/4 (diffusion.py:48-52)
    c_noise_mode: str = static(default="sigma")

    # -- preconditioning (models/diffusion.py:80-96) --

    def c_skip(self, sigma):
        s_d = self.sigma_data
        return (s_d**2) / (sigma**2 + s_d**2)

    def c_out(self, sigma):
        s_d = self.sigma_data
        return sigma * s_d / jnp.sqrt(s_d**2 + sigma**2)

    def c_in(self, sigma):
        s_d = self.sigma_data
        return 1.0 / jnp.sqrt(sigma**2 + s_d**2)

    def c_noise(self, sigma):
        if self.c_noise_mode == "log_quarter":
            return jnp.log(sigma) / 4
        return sigma

    def loss_weight(self, sigma):
        """lambda(sigma) (models/diffusion.py:110-116)."""
        s_d = self.sigma_data
        return (sigma**2 + s_d**2) / ((sigma * s_d) ** 2)

    # -- the Karras solver grid (models/diffusion.py:118-126) --

    def t_i(self, i):
        """sigma at solver step ``i`` (array or scalar), rho-spaced."""
        rho = self.rho
        n = self.n_solver_steps
        rho_inv = 1.0 / rho
        a = self.sigma_max**rho_inv
        b = self.sigma_min**rho_inv
        return (a + i / (n - 1) * (b - a)) ** rho

    def solver_grid(self, n_steps: int | None = None) -> jnp.ndarray:
        """sigma values ``[t_0 .. t_{N-1}]`` (t_0 = sigma_max, t_{N-1} = sigma_min)."""
        if n_steps is None:
            n_steps = self.n_solver_steps
        if n_steps != self.n_solver_steps:
            # re-derive the grid at a different resolution
            sched = self.replace(n_solver_steps=n_steps)
            return sched.solver_grid()
        return self.t_i(jnp.arange(n_steps, dtype=jnp.float32))

    def extended_solver_grid(self) -> jnp.ndarray:
        """``[t_0 .. t_N]`` — the stochastic sampler steps one index past
        sigma_min, evaluating t_i at i = N (models/stochastic.py:27-43)."""
        return self.t_i(jnp.arange(self.n_solver_steps + 1, dtype=jnp.float32))

    # -- training-time sigma sampling --

    def sample_sigma(self, key: jax.Array, n: int) -> jnp.ndarray:
        raise NotImplementedError

    def sample_latent(self, key: jax.Array, shape) -> jnp.ndarray:
        """Draw from the terminal prior N(0, sigma_max^2)
        (models/diffusion.py:106-108)."""
        return self.sigma_max * jax.random.normal(key, shape)


def low_discrepancy_uniform(
    key: jax.Array, n: int, minval: float = 0.0, maxval: float = 1.0
) -> jnp.ndarray:
    """Stratified uniform draw (models/diffusion.py:129-139): one sample per
    stratum of width 1/n, reducing gradient variance across the batch."""
    u = jax.random.uniform(key, (n,), minval=0.0, maxval=1.0 / n)
    u = u + jnp.arange(n) / n
    return u * (maxval - minval) + minval


@module
class LogUniformSchedule(Schedule):
    """sigma ~ exp(U[log sigma_min, log sigma_max]), low-discrepancy
    (models/diffusion.py:142-156)."""

    def sample_sigma(self, key: jax.Array, n: int) -> jnp.ndarray:
        import math

        log_sigma = low_discrepancy_uniform(
            key, n, minval=math.log(self.sigma_min), maxval=math.log(self.sigma_max)
        )
        return jnp.exp(log_sigma)


@module
class LogNormalSchedule(Schedule):
    """sigma ~ LogNormal(mean, std) (models/diffusion.py:159-171)."""

    sigma_log_mean: float = static(default=0.5)
    sigma_log_std: float = static(default=1.0)

    def sample_sigma(self, key: jax.Array, n: int) -> jnp.ndarray:
        normal = jax.random.normal(key, (n,))
        return jnp.exp(self.sigma_log_std * normal + self.sigma_log_mean)
