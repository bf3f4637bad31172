"""Validation metrics (parity with gecco-jax/src/gecco_jax/metrics.py:16-221).

Differences from the reference, TPU-first:
- every metric is batched (no ``eqx.filter_vmap`` per example);
- ``sinkhorn_emd`` is our own log-domain Sinkhorn (``lax.scan``) instead of an
  ott-jax dependency (metrics.py:144-165) — runs fully on device;
- exact EMD comes in two flavours: ``scipy_emd`` routes the Hungarian
  assignment through ``jax.pure_callback`` to scipy on host (the reference's
  approach, metrics.py:113-141) — but the axon TPU runtime has no host
  callbacks, so ``auction_emd`` solves the same assignment problem ON DEVICE
  with an eps-scaled auction algorithm (Bertsekas 1988), runnable inside jit
  on TPU where the reference's exact-EMD metric cannot run at all;
- no ``MetricPmapWrapper``: metrics already run under jit over the mesh.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gecco_tpu.geometry import distance_matrix

__all__ = [
    "Metric",
    "LossMetric",
    "LogpMetric",
    "SupervisedMetric",
    "chamfer_distance",
    "chamfer_distance_squared",
    "scipy_emd",
    "auction_lsa",
    "auction_emd",
    "sinkhorn_emd",
]


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray, squared: bool = False):
    """Symmetric Chamfer distance, ``[..., N, D] x [..., M, D] -> [...]``
    (metrics.py:92-102)."""
    dist_m = distance_matrix(a, b, squared=squared)
    min_a = dist_m.min(axis=-2).mean(axis=-1)
    min_b = dist_m.min(axis=-1).mean(axis=-1)
    return (min_a + min_b) / 2


def chamfer_distance_squared(a: jnp.ndarray, b: jnp.ndarray):
    return chamfer_distance(a, b, squared=True)


def _scipy_lsa(cost_matrix: jnp.ndarray):
    """Host-side Hungarian assignment under pure_callback
    (metrics.py:113-126). ``cost_matrix: [N, N]`` -> (rows, cols)."""
    from scipy.optimize import linear_sum_assignment

    n = cost_matrix.shape[-1]
    shape = jax.ShapeDtypeStruct((n,), jnp.int32)

    def inner(cm):
        rows, cols = linear_sum_assignment(np.asarray(cm))
        return rows.astype(np.int32), cols.astype(np.int32)

    return jax.pure_callback(
        inner, (shape, shape), jax.lax.stop_gradient(cost_matrix)
    )


def scipy_emd(p1: jnp.ndarray, p2: jnp.ndarray, match="l1", average="l1"):
    """Exact EMD via optimal assignment (metrics.py:129-141).
    Unbatched ``[N, D]``; vmap for batches."""
    match_squared = {"l1": False, "l2": True}[match]
    match_dist = distance_matrix(p1, p2, squared=match_squared)
    rows, cols = _scipy_lsa(match_dist)

    average_squared = {"l1": False, "l2": True}[average]
    if average_squared == match_squared:
        average_dist = match_dist
    else:
        average_dist = distance_matrix(p1, p2, squared=average_squared)
    return average_dist[rows, cols].mean()


def _auction_phase(benefit, prices, eps, max_iters):
    """One eps-phase of the Jacobi (all-bid-at-once) auction: every
    unassigned person bids on its best object simultaneously; each object
    accepts the highest bid. Terminates with an assignment satisfying
    eps-complementary-slackness, i.e. total benefit within ``n * eps`` of
    optimal (Bertsekas, "The auction algorithm", 1988)."""
    n = benefit.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        person_obj, _, _, it = state
        return jnp.any(person_obj < 0) & (it < max_iters)

    def body(state):
        person_obj, obj_person, prices, it = state
        unassigned = person_obj < 0
        values = benefit - prices[None, :]  # [person, object]
        j1 = jnp.argmax(values, axis=1).astype(jnp.int32)
        v1 = jnp.take_along_axis(values, j1[:, None], axis=1)[:, 0]
        v2 = jnp.where(iota[None, :] == j1[:, None], -jnp.inf, values).max(axis=1)
        # n == 1 (or a -inf column sneaking in): fall back to a unit raise
        v2 = jnp.where(jnp.isfinite(v2), v2, v1 - 1.0)
        p = jnp.take(prices, j1)
        # floor the raise at ~2 fp32 ulps of the price so tied bidders
        # (v1 == v2) always make representable progress even when eps has
        # fallen below the ulp — ties are equal-cost, so which tied person
        # wins does not change the total
        raise_ = jnp.maximum(v1 - v2 + eps, jnp.abs(p) * 3e-7 + 1e-30)
        bid = jnp.where(unassigned, p + raise_, -jnp.inf)
        # per-object best bid and the bidding person that made it
        bids_po = jnp.where(j1[:, None] == iota[None, :], bid[:, None], -jnp.inf)
        best_bid = bids_po.max(axis=0)  # [object]
        winner = jnp.argmax(bids_po, axis=0).astype(jnp.int32)
        has_bid = jnp.isfinite(best_bid)
        prices = jnp.where(has_bid, best_bid, prices)
        # the previous owner of every re-auctioned object loses its object
        prev = jnp.where(has_bid, obj_person, -1)
        person_obj = person_obj.at[jnp.where(prev >= 0, prev, n)].set(-1, mode="drop")
        # winners (necessarily previously-unassigned persons) take the objects
        person_obj = person_obj.at[jnp.where(has_bid, winner, n)].set(
            jnp.where(has_bid, iota, -1), mode="drop"
        )
        obj_person = jnp.where(has_bid, winner, obj_person)
        return person_obj, obj_person, prices, it + 1

    person_obj = jnp.full((n,), -1, jnp.int32)
    obj_person = jnp.full((n,), -1, jnp.int32)
    person_obj, obj_person, prices, _ = jax.lax.while_loop(
        cond, body, (person_obj, obj_person, prices, jnp.int32(0))
    )
    return person_obj, obj_person, prices


def auction_lsa(
    cost_matrix: jnp.ndarray,
    *,
    n_phases: int = 14,
    max_iters_per_phase: int = 4000,
    rel_tol: float = 1e-6,
):
    """On-device linear assignment via the eps-scaling auction algorithm.

    ``cost_matrix: [N, N]`` -> ``cols [N] int32`` with row ``i`` matched to
    column ``cols[i]`` minimising the total cost. Pure ``lax.while_loop``
    program — runs inside jit on TPU, where the reference's host Hungarian
    (``jax.pure_callback`` + scipy, reference metrics.py:113-126) cannot
    execute because the axon runtime lacks host callbacks.

    Exactness: the returned assignment's total cost is within
    ``N * eps_final`` of the optimum with ``eps_final = max(rel_tol, 2e-6) *
    (cost range)`` (Bertsekas' eps-complementary-slackness bound; the 2e-6
    floor keeps eps above fp32 price resolution). In practice the bound is
    very pessimistic — the tests check equality with scipy's Hungarian
    totals to 1e-5 relative on random and point-cloud instances. Prices
    persist across the ``n_phases`` geometric eps reductions; assignments
    reset each phase.
    """
    n = cost_matrix.shape[-1]
    benefit = -jax.lax.stop_gradient(cost_matrix).astype(jnp.float32)
    span = jnp.maximum(benefit.max() - benefit.min(), 1e-30)
    eps_start = span / 4.0
    eps_final = span * max(rel_tol, 2e-6)
    # geometric schedule from eps_start down to eps_final (static length)
    ratio = (eps_final / eps_start) ** (1.0 / max(n_phases - 1, 1))
    epses = eps_start * ratio ** jnp.arange(n_phases)

    def phase(carry, eps):
        prices = carry
        person_obj, _, prices = _auction_phase(
            benefit, prices, eps, max_iters_per_phase
        )
        return prices, person_obj

    prices0 = jnp.zeros((n,), jnp.float32)
    _, assignments = jax.lax.scan(phase, prices0, epses)
    cols = assignments[-1]
    # if the last phase hit the iteration cap with stragglers (should not
    # happen at the default caps), complete greedily so the result is always
    # a valid permutation: unmatched rows take unmatched columns in order.
    taken = jnp.zeros((n,), bool).at[jnp.where(cols >= 0, cols, n)].set(
        True, mode="drop"
    )
    free_cols = jnp.argsort(jnp.where(taken, n, jnp.arange(n)))
    unmatched_rank = jnp.cumsum(cols < 0) - 1
    cols = jnp.where(cols >= 0, cols, jnp.take(free_cols, unmatched_rank, mode="clip"))
    return cols.astype(jnp.int32)


def auction_emd(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    match: str = "l1",
    average: str = "l1",
    **auction_kw,
):
    """Exact EMD via on-device optimal assignment — same semantics as
    ``scipy_emd`` (reference metrics.py:129-141) but runnable inside jit on
    TPU. Unbatched ``[N, D]``; vmap for batches. Gradients flow through the
    matched distances with the assignment held fixed (as in the reference)."""
    match_squared = {"l1": False, "l2": True}[match]
    match_dist = distance_matrix(p1, p2, squared=match_squared)
    cols = auction_lsa(match_dist, **auction_kw)

    average_squared = {"l1": False, "l2": True}[average]
    if average_squared == match_squared:
        average_dist = match_dist
    else:
        average_dist = distance_matrix(p1, p2, squared=average_squared)
    n = average_dist.shape[0]
    return average_dist[jnp.arange(n), cols].mean()


def sinkhorn_emd(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    epsilon: float = 0.01,
    n_iters: int = 100,
):
    """Entropy-regularised EMD ``<P, C>`` via log-domain Sinkhorn, on device.

    ``p1, p2: [..., N, D]`` with uniform marginals. Replaces the reference's
    ott-jax call (metrics.py:144-156).
    """
    cost = distance_matrix(p1, p2, squared=False).astype(jnp.float32)
    n, m = cost.shape[-2], cost.shape[-1]
    log_mu = jnp.full(cost.shape[:-1], -jnp.log(n))  # [..., N]
    log_nu = jnp.full((*cost.shape[:-2], m), -jnp.log(m))

    neg_c = -cost / epsilon

    def body(carry, _):
        f, g = carry
        # f_i = eps * (log mu_i - logsumexp_j((g_j - C_ij)/eps))
        f = epsilon * (
            log_mu - jax.scipy.special.logsumexp(neg_c + g[..., None, :] / epsilon, axis=-1)
        )
        g = epsilon * (
            log_nu - jax.scipy.special.logsumexp(neg_c + f[..., :, None] / epsilon, axis=-2)
        )
        return (f, g), None

    init = (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu))
    (f, g), _ = jax.lax.scan(body, init, None, length=n_iters)

    log_p = neg_c + (f[..., :, None] + g[..., None, :]) / epsilon
    plan = jnp.exp(log_p)
    return jnp.sum(plan * cost, axis=(-2, -1))


class Metric:
    """Protocol: ``__call__(model, points, raw_ctx, key) -> dict`` of
    per-batch arrays (metrics.py:16-26)."""

    name: str

    def __call__(self, model, points, raw_ctx, key):
        raise NotImplementedError


class LossMetric(Metric):
    """Validation loss (metrics.py:29-50)."""

    def __init__(self, loss_scale: float = 1.0):
        self.loss_scale = loss_scale
        self.name = "loss"
        self._fn = jax.jit(
            lambda model, pts, ctx, key: model.loss(
                pts, ctx, key, loss_scale=self.loss_scale
            )
        )

    def __call__(self, model, points, raw_ctx, key) -> Dict[str, jnp.ndarray]:
        return {"loss": self._fn(model, points, raw_ctx, key)}


class LogpMetric(Metric):
    """Exact likelihood decomposition (metrics.py:53-89).

    ``n_solver_steps`` overrides the schedule's grid for the reverse ODE —
    at the sampling default (128 steps) a validation batch costs ~256 VJP
    denoiser evals per example batch, which is unaffordable as a recurring
    metric; 24-32 steps gives a stable relative likelihood at ~20% of that
    cost (the absolute value shifts with step count — compare runs only at
    equal settings)."""

    def __init__(
        self,
        n_log_det_jac_samples: int = 1,
        n_solver_steps: int | None = None,
    ):
        self.name = "logp"
        self._fn = jax.jit(
            lambda model, pts, ctx, key: model.evaluate_logp(
                key,
                pts,
                raw_ctx=ctx,
                n_log_det_jac_samples=n_log_det_jac_samples,
                n_solver_steps=n_solver_steps,
                return_details=True,
            )
        )

    def __call__(self, model, points, raw_ctx, key) -> Dict[str, jnp.ndarray]:
        details = self._fn(model, points, raw_ctx, key)
        return {
            "total": details.logp,
            "prior": details.prior_logp,
            "det-jac": details.delta_jacobian,
            "reparam": details.delta_reparam,
        }


class SupervisedMetric(Metric):
    """Sample conditionally, compare to ground truth (metrics.py:168-203)."""

    def __init__(self, metrics: Sequence[Callable] = (chamfer_distance,)):
        self.name = "supervised"
        self.metrics = tuple(metrics)

        def _run(model, pts, ctx, key):
            samples = model.sample(key, pts.shape, raw_ctx=ctx)
            return {
                getattr(m, "__name__", str(m)): m(samples, pts)
                for m in self.metrics
            }

        self._fn = jax.jit(_run)

    def __call__(self, model, points, raw_ctx, key) -> Dict[str, jnp.ndarray]:
        return self._fn(model, points, raw_ctx, key)
