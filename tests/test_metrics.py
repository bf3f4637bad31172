"""Metric correctness tests (ref: gecco-jax/src/gecco_jax/metrics.py,
benchmark.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gecco_tpu.benchmark import (
    batched_pairwise_distance,
    cov,
    mmd,
    one_nn_accuracy,
)
from gecco_tpu.metrics import (
    chamfer_distance,
    scipy_emd,
    sinkhorn_emd,
)


def test_chamfer_brute_force():
    a = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    cd = float(chamfer_distance(a, b))
    an, bn = np.asarray(a), np.asarray(b)
    d = np.linalg.norm(an[:, None] - bn[None, :], axis=-1)
    expected = (d.min(0).mean() + d.min(1).mean()) / 2
    np.testing.assert_allclose(cd, expected, rtol=1e-5)


def test_chamfer_identity_zero():
    # fp32 einsum-based distances carry ~1e-4 noise near zero (the clamped
    # sqrt of catastrophic cancellation) — same property as the reference.
    a = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    assert float(chamfer_distance(a, a)) < 1e-3


def test_chamfer_batched():
    a = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 3))
    b = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 3))
    cd = chamfer_distance(a, b)
    assert cd.shape == (4,)
    np.testing.assert_allclose(
        float(cd[0]), float(chamfer_distance(a[0], b[0])), rtol=1e-5
    )


def test_scipy_emd_exact_on_permutation():
    """EMD of a cloud against a permutation of itself is zero."""
    a = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    perm = jax.random.permutation(jax.random.PRNGKey(6), 16)
    assert float(scipy_emd(a, a[perm])) < 1e-3


def test_scipy_emd_matches_bruteforce_assignment():
    from scipy.optimize import linear_sum_assignment

    a = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    b = np.random.default_rng(1).normal(size=(10, 3)).astype(np.float32)
    d = np.linalg.norm(a[:, None] - b[None], axis=-1)
    r, c = linear_sum_assignment(d)
    expected = d[r, c].mean()
    np.testing.assert_allclose(
        float(scipy_emd(jnp.asarray(a), jnp.asarray(b))), expected, rtol=1e-4
    )


def test_sinkhorn_emd_close_to_exact():
    """Small-epsilon Sinkhorn approximates the exact EMD."""
    a = jax.random.normal(jax.random.PRNGKey(7), (24, 3))
    b = jax.random.normal(jax.random.PRNGKey(8), (24, 3)) + 0.5
    exact = float(scipy_emd(a, b))
    approx = float(sinkhorn_emd(a, b, epsilon=0.01, n_iters=500))
    np.testing.assert_allclose(approx, exact, rtol=0.05)


def test_one_nn_ideal_is_half():
    """Samples drawn from the data distribution => 1-NN accuracy ~ 0.5."""
    rng = np.random.default_rng(0)
    samples = rng.normal(size=(64, 32, 3)).astype(np.float32)
    data = rng.normal(size=(64, 32, 3)).astype(np.float32)
    ss = batched_pairwise_distance(samples, samples, chamfer_distance, 16)
    sd = batched_pairwise_distance(samples, data, chamfer_distance, 16)
    dd = batched_pairwise_distance(data, data, chamfer_distance, 16)
    acc = one_nn_accuracy(ss, sd, dd)
    assert 0.3 < acc < 0.7, acc


def test_one_nn_disjoint_is_one():
    rng = np.random.default_rng(1)
    samples = rng.normal(size=(32, 16, 3)).astype(np.float32)
    data = rng.normal(size=(32, 16, 3)).astype(np.float32) + 10.0
    ss = batched_pairwise_distance(samples, samples, chamfer_distance, 16)
    sd = batched_pairwise_distance(samples, data, chamfer_distance, 16)
    dd = batched_pairwise_distance(data, data, chamfer_distance, 16)
    assert one_nn_accuracy(ss, sd, dd) > 0.95


def test_mmd_and_cov():
    sd = np.array([[1.0, 5.0], [4.0, 0.5]])
    assert mmd(sd) == 0.5
    # sample 0 -> data 0, sample 1 -> data 1: full coverage
    assert cov(sd) == 1.0
    sd2 = np.array([[1.0, 5.0], [0.9, 6.0]])
    assert cov(sd2) == 0.5


def test_batched_pairwise_matches_direct():
    a = np.random.default_rng(2).normal(size=(10, 8, 3)).astype(np.float32)
    m = batched_pairwise_distance(a, a, chamfer_distance, block_size=3)
    direct = np.zeros((10, 10))
    for i in range(10):
        for j in range(10):
            direct[i, j] = float(chamfer_distance(jnp.asarray(a[i]), jnp.asarray(a[j])))
    np.testing.assert_allclose(m, direct, rtol=1e-3, atol=1e-4)


def test_logp_metric_step_count_override():
    """n_solver_steps plumbs through to the reverse ODE (VERDICT r1 #7):
    fewer steps -> cheaper, same ballpark value on an analytic model."""
    import jax
    import jax.numpy as jnp

    from gecco_tpu import Diffusion, GaussianReparam, LogUniformSchedule
    from gecco_tpu.metrics import LogpMetric
    from gecco_tpu.models import SetTransformer, UnconditionalPointNetwork

    bk, nk = jax.random.split(jax.random.PRNGKey(0))
    backbone = SetTransformer.init(
        bk, n_layers=1, feature_dim=32, num_inducers=4, embed_dim=1,
        num_heads=4, compute_dtype=jnp.float32,
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=32)
    model = Diffusion.init(
        net,
        LogUniformSchedule(sigma_max=10.0, n_solver_steps=64),
        reparam=GaussianReparam.init([0.0] * 3, [1.0] * 3),
    )
    pts = np.random.default_rng(0).normal(size=(2, 16, 3)).astype(np.float32)

    out_16 = LogpMetric(n_solver_steps=16)(model, pts, None, jax.random.PRNGKey(1))
    out_64 = LogpMetric()(model, pts, None, jax.random.PRNGKey(1))
    v16 = np.asarray(out_16["total"])
    v64 = np.asarray(out_64["total"])
    assert np.isfinite(v16).all() and np.isfinite(v64).all()
    # both integrate the same ODE; coarse grid stays within ~10% of fine
    assert np.abs(v16 - v64).max() / np.abs(v64).max() < 0.1


def test_auction_lsa_matches_hungarian():
    """On-device auction assignment (gecco_tpu/metrics.py) reaches the same
    total cost as scipy's Hungarian — the TPU-runnable replacement for the
    reference's pure_callback exact EMD (reference metrics.py:113-126)."""
    import jax

    from scipy.optimize import linear_sum_assignment

    from gecco_tpu.metrics import auction_lsa

    rng = np.random.default_rng(7)
    fn = jax.jit(auction_lsa)
    for n in (1, 3, 32, 128):
        cost = rng.normal(size=(n, n)).astype(np.float32) * rng.uniform(0.1, 5)
        rows, cols_ref = linear_sum_assignment(cost)
        opt = cost[rows, cols_ref].sum()
        cols = np.asarray(fn(jnp.asarray(cost)))
        # valid permutation
        assert sorted(cols.tolist()) == list(range(n))
        ours = cost[np.arange(n), cols].sum()
        np.testing.assert_allclose(ours, opt, rtol=1e-5, atol=1e-6)


def test_auction_emd_matches_scipy_emd():
    """auction_emd == scipy_emd on point clouds (the near-tie-heavy real
    workload), under jit, for both l1 and l2 match metrics."""
    import jax

    from gecco_tpu.metrics import auction_emd, scipy_emd

    rng = np.random.default_rng(3)
    a = rng.normal(size=(96, 3)).astype(np.float32)
    b = (0.7 * rng.normal(size=(96, 3)) + 0.2).astype(np.float32)
    for match in ("l1", "l2"):
        ref = float(scipy_emd(jnp.asarray(a), jnp.asarray(b), match=match))
        ours = float(
            jax.jit(lambda x, y: auction_emd(x, y, match=match))(
                jnp.asarray(a), jnp.asarray(b)
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_benchmark_callback_compiles_once(tmp_path):
    """VERDICT r3 #5: the callback must not retrace/recompile per validation
    epoch — on the axon runtime every retrace is a minutes-long cold compile.
    Trace counters on the sampler and the distance fn must not grow on the
    second invocation."""
    import jax

    from gecco_tpu.benchmark import BenchmarkCallback
    from gecco_tpu.utils.modules import module

    trace_counts = {"sample": 0, "dist": 0}

    @module
    class CountingSampler:
        scale: jax.Array

        def sample(self, key, shape):
            trace_counts["sample"] += 1
            return self.scale * jax.random.normal(key, shape)

    def counting_dist(a, b):
        trace_counts["dist"] += 1
        return jnp.mean(jnp.sum((a - b) ** 2, axis=-1))

    data = np.random.default_rng(0).normal(size=(8, 16, 3)).astype(np.float32)
    cb = BenchmarkCallback(data, batch_size=4, distance_fn=counting_dist)
    model = CountingSampler(scale=jnp.float32(1.0))

    class NullLogger:
        def add_scalar(self, *a, **k):
            pass

        def add_figure(self, *a, **k):
            pass

    cb(model, NullLogger(), epoch=0)
    counts_after_first = dict(trace_counts)
    assert counts_after_first["sample"] >= 1 and counts_after_first["dist"] >= 1
    cb(model, NullLogger(), epoch=1)
    assert trace_counts == counts_after_first, (
        f"callback retraced on second call: {counts_after_first} -> {trace_counts}"
    )
