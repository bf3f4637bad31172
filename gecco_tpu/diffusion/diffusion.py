"""EDM diffusion model: preconditioning, loss, sampling, likelihood.

Parity with gecco-jax/src/gecco_jax/models/diffusion.py:195-580 plus the
torch-only cached upsampler (gecco-torch/src/gecco_torch/diffusion.py:354-470),
in one batched TPU-native class:

- everything is batched ``[B, N, D]``; no per-example vmap;
- samplers are ``lax.scan`` programs (gecco_tpu/diffusion/samplers.py);
- the exact-likelihood augmented ODE uses VJP-based Hutchinson divergence
  inside the same scan (matching the reference's grad-of-dot formulation,
  models/diffusion.py:174-192; VJP rather than JVP because the Pallas
  attention is a custom_vjp function);
- the conditioner runs once per batch and its output is shared by every
  solver step (models/diffusion.py:430).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from gecco_tpu.diffusion.samplers import (
    churn_gamma,
    heun_sampler,
    heun_step,
    inpaint_sampler,
)
from gecco_tpu.diffusion.schedule import Schedule
from gecco_tpu.reparam import Reparam
from gecco_tpu.types import LogpDetails, SampleDetails
from gecco_tpu.utils import module, static

__all__ = ["Diffusion", "NoCond"]


@module
class NoCond:
    """Identity conditioner for unconditional models
    (models/diffusion.py:36-44)."""

    def __call__(self, raw_ctx, key: Optional[jax.Array] = None):
        del key
        return raw_ctx


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-example mean-squared divergence (models/divergences.py:4-6),
    batched: [B, N, D] x [B, N, D] -> [B]."""
    return jnp.mean((a - b) ** 2, axis=(-2, -1))


@module
class Diffusion:
    network: Any  # net(t [B], x [B,N,D], ctx, hs=..., return_h=...) -> [B,N,D]
    cond: Any  # raw_ctx -> ctx, run once per batch
    reparam: Reparam
    schedule: Schedule
    divergence_fn: Any = static(default=None)  # (x_hat, x) -> [B]; None = mse

    @classmethod
    def init(
        cls,
        network: Any,
        schedule: Schedule,
        reparam: Optional[Reparam] = None,
        cond: Optional[Any] = None,
        divergence_fn: Optional[Any] = None,
    ) -> "Diffusion":
        return cls(
            network=network,
            cond=cond if cond is not None else NoCond(),
            reparam=reparam if reparam is not None else Reparam(),
            schedule=schedule,
            divergence_fn=divergence_fn,
        )

    # -- preconditioned denoiser (models/diffusion.py:220-262) --

    def _broadcast_sigma(self, sigma, x):
        from gecco_tpu.utils.checks import check_points, check_sigma_batch

        check_points(x, "x")
        sigma = jnp.asarray(sigma, x.dtype)
        check_sigma_batch(sigma, x.shape[0])
        return jnp.broadcast_to(sigma, x.shape[:1])  # [B]

    def denoise(
        self,
        sigma,
        x: jnp.ndarray,
        ctx: Any = None,
        hs: Optional[jnp.ndarray] = None,
        return_h: bool = False,
        key: Optional[jax.Array] = None,
    ):
        """D(x; sigma) with EDM pre/post-conditioning. ``sigma``: scalar or [B].

        ``key`` enables train-time stochastic layers (dropout) in the network;
        inference (key=None) is deterministic — the analog of the reference's
        eqx inference mode (training.py:472-475)."""
        sig = self._broadcast_sigma(sigma, x)
        c_in = self.schedule.c_in(sig)[:, None, None]
        c_noise = self.schedule.c_noise(sig)
        c_skip = self.schedule.c_skip(sig)[:, None, None]
        c_out = self.schedule.c_out(sig)[:, None, None]

        out = self.network(c_noise, c_in * x, ctx, hs=hs, return_h=return_h, key=key)
        if return_h:
            f, stored = out
            return c_skip * x + c_out * f, stored
        return c_skip * x + c_out * out

    def score(self, sigma, x: jnp.ndarray, ctx: Any = None) -> jnp.ndarray:
        """(Unnormalised) score direction x - D(x) (models/diffusion.py:253-262)."""
        return x - self.denoise(sigma, x, ctx)

    # -- training loss (models/diffusion.py:264-308) --

    def loss(
        self,
        points: jnp.ndarray,  # [B, N, D] data space
        raw_ctx: Any,
        key: jax.Array,
        loss_scale: float = 1.0,
        train_in_inference_mode: bool = False,
    ) -> jnp.ndarray:
        """Denoising score-matching loss (models/diffusion.py:264-308).

        ``train_in_inference_mode=True`` withholds the network PRNG key so
        stochastic layers (dropout) run deterministically during training —
        the reference Trainer's flag of the same name (training.py:158,
        472-475)."""
        from gecco_tpu.utils.checks import check_points

        check_points(points, "points")
        b = points.shape[0]
        sigma_key, noise_key, cond_key, net_key = jax.random.split(key, 4)

        x = self.reparam.data_to_diffusion(points, raw_ctx)
        ctx = self.cond(raw_ctx, key=cond_key)

        sigma = self.schedule.sample_sigma(sigma_key, b)  # [B]
        noise = jax.random.normal(noise_key, x.shape, x.dtype)
        perturbed = x + sigma[:, None, None] * noise

        x_hat = self.denoise(
            sigma,
            perturbed,
            ctx,
            key=None if train_in_inference_mode else net_key,
        )
        weight = self.schedule.loss_weight(sigma)  # [B]
        div_fn = self.divergence_fn if self.divergence_fn is not None else mse
        divergence = div_fn(x_hat, x)  # [B]
        return loss_scale * jnp.mean(weight * divergence)

    # -- sampling --

    @staticmethod
    def _tile_ctx(ctx, n: int):
        """Repeat every batched ctx leaf n times along the batch axis —
        the batched equivalent of the reference's vmap-over-n-sample-keys
        sharing one conditioned context (models/diffusion.py:415-439)."""
        if n == 1:
            return ctx

        def _tile(x):
            if hasattr(x, "ndim") and x.ndim >= 1:
                return jnp.repeat(x, n, axis=0)
            return x

        return jax.tree.map(_tile, ctx)

    def sample(
        self,
        key: jax.Array,
        shape: tuple,  # (B, N, D)
        raw_ctx: Any = None,
        ctx: Any = None,
        n_solver_steps: Optional[int] = None,
        temperature: float = 1.0,
        return_details: bool = False,
        n: int = 1,
    ):
        """Deterministic probability-flow (Heun) sampler over the Karras grid
        (models/diffusion.py:333-439). Grid: ``[t_0 .. t_{N-1}]``, every
        transition second-order (diffrax StepTo semantics).

        ``n > 1`` draws n samples per context: the conditioner runs once,
        its output is tiled, and ``shape[0]`` must equal ctx_batch * n.
        """
        if (ctx is not None) and (raw_ctx is not None):
            raise ValueError("Both `ctx` and `raw_ctx` were provided.")
        if len(shape) != 3:
            raise ValueError(f"shape must be (B, N, D), got {shape}")
        cond_key, latent_key, ode_key = jax.random.split(key, 3)
        if ctx is None:
            ctx = self.cond(raw_ctx, key=cond_key)
        ctx = self._tile_ctx(ctx, n)

        sigmas = self.schedule.solver_grid(n_solver_steps)
        latent = temperature * self.schedule.sample_latent(latent_key, shape)

        denoise_fn = lambda sigma, x: self.denoise(sigma, x, ctx)
        x_final, traj = heun_sampler(
            denoise_fn,
            sigmas,
            latent,
            ode_key,
            s_churn=0.0,
            heun_on_last=True,
            save_trajectory=return_details,
        )
        sample_data = self.reparam.diffusion_to_data(x_final, ctx)
        if not return_details:
            return sample_data
        traj_data = jax.vmap(lambda d: self.reparam.diffusion_to_data(d, ctx))(traj)
        return SampleDetails(
            latent=latent,
            sample_diff=x_final,
            sample_data=sample_data,
            trajectory_diff=traj,
            trajectory_data=traj_data,
        )

    def sample_stochastic(
        self,
        key: jax.Array,
        shape: tuple,  # (B, N, D)
        raw_ctx: Any = None,
        ctx: Any = None,
        s_churn: float = 0.0,
        s_noise: float = 1.0,
        n_solver_steps: Optional[int] = None,
        n: int = 1,
    ) -> jnp.ndarray:
        """EDM stochastic sampler (models/stochastic.py:13-98): extended grid
        ``[t_0 .. t_N]``, Euler-only final transition. ``n > 1`` draws n
        samples per context (conditioner runs once)."""
        if (ctx is not None) and (raw_ctx is not None):
            raise ValueError("Both `ctx` and `raw_ctx` were provided.")
        if len(shape) != 3:
            raise ValueError(f"shape must be (B, N, D), got {shape}")
        cond_key, init_key, loop_key = jax.random.split(key, 3)
        if ctx is None:
            ctx = self.cond(raw_ctx, key=cond_key)
        ctx = self._tile_ctx(ctx, n)

        sched = (
            self.schedule
            if n_solver_steps is None
            else self.schedule.replace(n_solver_steps=n_solver_steps)
        )
        sigmas = sched.extended_solver_grid()
        x_init = sigmas[0] * jax.random.normal(init_key, shape)

        denoise_fn = lambda sigma, x: self.denoise(sigma, x, ctx)
        x_final, _ = heun_sampler(
            denoise_fn,
            sigmas,
            x_init,
            loop_key,
            s_churn=s_churn,
            s_noise=s_noise,
            heun_on_last=False,
        )
        return self.reparam.diffusion_to_data(x_final, ctx)

    def sample_inpaint(
        self,
        key: jax.Array,
        known: jnp.ndarray,  # [B, M, D] data space
        m_to_inpaint: int,
        raw_ctx: Any = None,
        ctx: Any = None,
        s_churn: float = 0.0,
        s_noise: float = 1.0,
        n_substeps: int = 1,
    ) -> jnp.ndarray:
        """Completion via RePaint-style resampling (models/stochastic.py:101-231)."""
        if (ctx is not None) and (raw_ctx is not None):
            raise ValueError("Both `ctx` and `raw_ctx` were provided.")
        from gecco_tpu.utils.checks import check_points

        check_points(known, "known")
        cond_key, loop_key = jax.random.split(key)
        if ctx is None:
            ctx = self.cond(raw_ctx, key=cond_key)

        known_diff = self.reparam.data_to_diffusion(known, ctx)
        sigmas = self.schedule.extended_solver_grid()
        denoise_fn = lambda sigma, x: self.denoise(sigma, x, ctx)
        x = inpaint_sampler(
            denoise_fn,
            sigmas,
            known_diff,
            m_to_inpaint,
            loop_key,
            s_churn=s_churn,
            s_noise=s_noise,
            n_substeps=n_substeps,
        )
        return self.reparam.diffusion_to_data(x, ctx)

    def upsample(
        self,
        key: jax.Array,
        data: jnp.ndarray,  # [B, M, D] existing cloud, data space
        n_new: int,
        raw_ctx: Any = None,
        ctx: Any = None,
        n_substeps: int = 5,
        s_churn: float = 0.5,
        s_noise: float = 1.0,
    ) -> jnp.ndarray:
        """Inducer-cache upsampler (torch diffusion.py:354-470): per noise
        level the *existing* cloud is re-noised and run through the full
        network once to produce per-layer inducer states; the new points are
        then denoised ``n_substeps`` times against the cached states, running
        only the cheap N x I unpool side. Scales generation to ~100k points.
        """
        if (ctx is not None) and (raw_ctx is not None):
            raise ValueError("Both `ctx` and `raw_ctx` were provided.")
        from gecco_tpu.utils.checks import check_points

        check_points(data, "data")
        cond_key, latent_key, loop_key = jax.random.split(key, 3)
        if ctx is None:
            ctx = self.cond(raw_ctx, key=cond_key)

        data_diff = self.reparam.data_to_diffusion(data, ctx)
        sigmas = self.schedule.extended_solver_grid()
        n_transitions = sigmas.shape[0] - 1
        gamma = churn_gamma(s_churn, n_transitions)

        b, _, d = data.shape
        # The fused Pallas kernels tile the point axis in multiples of 128;
        # points are exchangeable, so generating up to the next multiple and
        # slicing back is exact (the reference's n_new=100_000 notebook cell
        # works verbatim). No-op when n_new is already aligned.
        n_gen = -(-n_new // 128) * 128
        x_init = sigmas[0] * jax.random.normal(latent_key, (b, n_gen, d))

        def outer_body(carry, inp):
            x, rng = carry
            s_cur, s_next, last = inp
            rng, ctx_noise_key = jax.random.split(rng)

            # refresh the cache at this noise level (torch :430-437)
            noisy_data = data_diff + s_cur * jax.random.normal(
                ctx_noise_key, data_diff.shape
            )
            _, cache = self.denoise(s_cur, noisy_data, ctx, return_h=True)
            cached_denoise = lambda s, x_: self.denoise(s, x_, ctx, hs=cache)

            def inner_body(j, x_and_rng):
                x, rng = x_and_rng
                rng, churn_key, redo_key = jax.random.split(rng, 3)

                x_next = heun_step(
                    cached_denoise,
                    x,
                    s_cur,
                    s_next,
                    gamma=gamma,
                    s_noise=s_noise,
                    key=churn_key if gamma > 0.0 else None,
                    second_order=jnp.logical_not(last),
                )

                # re-noise up between substeps; unlike inpaint_sampler (which
                # matches the reference, stochastic.py:165-174) the redo is
                # additionally skipped on the final noise level so the last
                # substep's output is returned as-is (torch diffusion.py:438-450)
                def redo(v):
                    std = jnp.sqrt(jnp.maximum(s_cur**2 - s_next**2, 0.0))
                    return v + std * jax.random.normal(redo_key, v.shape)

                x_next = jax.lax.cond(
                    jnp.logical_and(j < n_substeps - 1, jnp.logical_not(last)),
                    redo,
                    lambda v: v,
                    x_next,
                )
                return (x_next, rng)

            x, rng = jax.lax.fori_loop(0, n_substeps, inner_body, (x, rng))
            return (x, rng), None

        is_last = jnp.arange(n_transitions) == n_transitions - 1
        (x_final, _), _ = jax.lax.scan(
            outer_body, (x_init, loop_key), (sigmas[:-1], sigmas[1:], is_last)
        )
        return self.reparam.diffusion_to_data(x_final[:, :n_new], ctx)

    # -- exact likelihood (models/diffusion.py:444-541) --

    def evaluate_logp(
        self,
        key: jax.Array,
        data: jnp.ndarray,  # [B, N, D]
        raw_ctx: Any = None,
        ctx: Any = None,
        n_log_det_jac_samples: int = 1,
        n_solver_steps: Optional[int] = None,
        return_details: bool = False,
    ):
        """Exact log-likelihood via the reverse probability-flow ODE with
        Hutchinson trace estimation (VJP-based, one noise draw per trajectory
        as in the reference's fixed ``noise_key``)."""
        if (ctx is not None) and (raw_ctx is not None):
            raise ValueError("Both `ctx` and `raw_ctx` were provided.")
        from gecco_tpu.utils.checks import check_points

        check_points(data, "data")
        cond_key, noise_key = jax.random.split(key)
        if ctx is None:
            ctx = self.cond(raw_ctx, key=cond_key)

        sched = (
            self.schedule
            if n_solver_steps is None
            else self.schedule.replace(n_solver_steps=n_solver_steps)
        )
        sigmas = sched.solver_grid()[::-1]  # increasing: sigma_min -> sigma_max

        x0 = self.reparam.data_to_diffusion(data, ctx)
        eps = jax.random.rademacher(
            noise_key, (n_log_det_jac_samples, *x0.shape)
        ).astype(x0.dtype)

        def field(x, sigma):
            return (x - self.denoise(sigma, x, ctx)) / sigma

        def aug_field(x, sigma):
            # VJP-based Hutchinson (eps^T J eps = (J^T eps) . eps), matching
            # the reference's grad-of-dot formulation
            # (models/diffusion.py:174-192). VJP (not JVP) because the Pallas
            # attention is a custom_vjp function, which forward-mode autodiff
            # cannot cross.
            f, vjp_fn = jax.vjp(lambda y: field(y, sigma), x)

            def single(e):
                (jte,) = vjp_fn(e)
                return jnp.sum(jte * e, axis=(-2, -1))  # [B]

            # python loop, not vmap: the SPMD-wrapped (custom_partitioning)
            # attention backward has no batching rule, and
            # n_log_det_jac_samples is 1 in practice (reference default)
            divs = jnp.stack([single(eps[i]) for i in range(eps.shape[0])])
            return f, divs.mean(axis=0)

        def body(carry, inp):
            x, logv = carry
            s_cur, s_next = inp
            h = s_next - s_cur
            f1, d1 = aug_field(x, s_cur)
            x_e = x + h * f1
            f2, d2 = aug_field(x_e, s_next)
            x_next = x + h * 0.5 * (f1 + f2)
            logv_next = logv + h * 0.5 * (d1 + d2)
            out = x_next if return_details else None
            return (x_next, logv_next), out

        init = (x0, jnp.zeros(x0.shape[0], x0.dtype))
        (latent, delta_div), traj = jax.lax.scan(
            body, init, (sigmas[:-1], sigmas[1:])
        )

        prior_logp = jax.scipy.stats.norm.logpdf(
            latent, loc=0.0, scale=self.schedule.sigma_max
        ).sum(axis=(-2, -1))
        delta_reparam = self.reparam.ladj_data_to_diffusion(data, ctx)
        logp = prior_logp + delta_div + delta_reparam

        if not return_details:
            return logp
        traj_data = jax.vmap(lambda d: self.reparam.diffusion_to_data(d, ctx))(traj)
        return LogpDetails(
            logp=logp,
            prior_logp=prior_logp,
            delta_reparam=delta_reparam,
            delta_jacobian=delta_div,
            trajectory_diff=traj,
            trajectory_data=traj_data,
            latent=latent,
        )
