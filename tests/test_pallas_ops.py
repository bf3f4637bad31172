"""Pallas kernel correctness on the CPU backend (interpret mode).

The same kernels run compiled on TPU; interpret mode checks the math.
TPU-compiled validation is part of the bench workflow."""

import jax
import jax.numpy as jnp
import numpy as np

from gecco_tpu.ops.attention import rect_attention


def _compare(m, n, dtype=jnp.float32):
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, m, 48), dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, n, 48), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, n, 48), dtype)
    a = rect_attention(q, k, v, impl="xla")
    b = rect_attention(q, k, v, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-3, atol=2e-3
    )


def test_pallas_attention_pool_shape():
    _compare(64, 256)  # inducers x points


def test_pallas_attention_unpool_shape():
    _compare(256, 64)  # points x inducers


def test_pallas_attention_grads_match_xla():
    def loss(impl):
        def f(q, k, v):
            return rect_attention(q, k, v, impl=impl).sum()

        return f

    q = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 32, 48))
    k = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 64, 48))
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 64, 48))
    ga = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_pallas_projective_gather_matches_xla():
    from gecco_tpu.ops.projective import lookup_pyramid

    feats = (
        jax.random.normal(jax.random.PRNGKey(10), (2, 16, 16, 8)),
        jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 16)),
    )
    hw01 = jax.random.uniform(jax.random.PRNGKey(12), (2, 64, 2), minval=-0.1, maxval=1.1)
    a = lookup_pyramid(feats, hw01, impl="xla")
    b = lookup_pyramid(feats, hw01, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pallas_projective_gather_grads():
    from gecco_tpu.ops.pallas.projective_gather import bilinear_lookup_pallas
    from gecco_tpu.ops.projective import bilinear_lookup

    level = jax.random.normal(jax.random.PRNGKey(13), (2, 8, 8, 4))
    coords = jax.random.uniform(jax.random.PRNGKey(14), (2, 16, 2)) * 8.0

    def loss(fn):
        return lambda lv, co: (fn(lv, co) ** 2).sum()

    ga = jax.grad(loss(bilinear_lookup), argnums=(0, 1))(level, coords)
    gb = jax.grad(loss(bilinear_lookup_pallas), argnums=(0, 1))(level, coords)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pallas_attention_spmd_data_and_seq():
    """The custom_partitioning wrapping: pallas attention must produce
    identical results (and shardings that keep the query axis distributed)
    when batch is sharded over 'data' and points over 'seq'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gecco_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, seq=2)
    q = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 64, 48))
    k = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 16, 48))
    v = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 16, 48))

    f = jax.jit(lambda a, b, c: rect_attention(a, b, c, impl="pallas"))
    ref = np.asarray(f(q, k, v))

    # unpool-style: queries (points) sharded over seq, kv replicated
    qs = jax.device_put(q, NamedSharding(mesh, P("data", None, "seq", None)))
    ks = jax.device_put(k, NamedSharding(mesh, P("data", None, None, None)))
    vs = jax.device_put(v, NamedSharding(mesh, P("data", None, None, None)))
    np.testing.assert_allclose(np.asarray(f(qs, ks, vs)), ref, rtol=1e-4, atol=1e-6)

    # pool-style: keys/values (points) sharded over seq -> forced gather
    q2 = jax.device_put(k, NamedSharding(mesh, P("data", None, None, None)))
    k2 = jax.device_put(q, NamedSharding(mesh, P("data", None, "seq", None)))
    v2 = jax.device_put(v[:, :, :16].repeat(4, axis=2), NamedSharding(mesh, P("data", None, "seq", None)))
    out2 = np.asarray(f(q2, k2, v2))
    ref2 = np.asarray(f(k, q, v[:, :, :16].repeat(4, axis=2)))
    np.testing.assert_allclose(out2, ref2, rtol=1e-4, atol=1e-6)


def test_pallas_attention_spmd_grads():
    """Gradients through the SPMD-wrapped custom_vjp under a sharded mesh
    must match the unsharded result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gecco_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, seq=2)
    q = jax.random.normal(jax.random.PRNGKey(3), (4, 2, 32, 48))
    k = jax.random.normal(jax.random.PRNGKey(4), (4, 2, 16, 48))
    v = jax.random.normal(jax.random.PRNGKey(5), (4, 2, 16, 48))

    grad_fn = jax.jit(
        jax.grad(
            lambda a, b, c: (rect_attention(a, b, c, impl="pallas") ** 2).sum(),
            argnums=(0, 1, 2),
        )
    )
    ref = grad_fn(q, k, v)
    qs = jax.device_put(q, NamedSharding(mesh, P("data", None, "seq", None)))
    ks = jax.device_put(k, NamedSharding(mesh, P("data", None, None, None)))
    vs = jax.device_put(v, NamedSharding(mesh, P("data", None, None, None)))
    out = grad_fn(qs, ks, vs)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_pallas_gather_spmd():
    """The fused projective gather under data x seq sharding (points sharded)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gecco_tpu.ops.pallas.projective_gather import bilinear_lookup_pallas
    from gecco_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, seq=2)
    level = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 16))
    coords = jax.random.uniform(
        jax.random.PRNGKey(1), (4, 32, 2), minval=-1.0, maxval=9.0
    )
    f = jax.jit(bilinear_lookup_pallas)
    ref = np.asarray(f(level, coords))

    ls = jax.device_put(level, NamedSharding(mesh, P("data", None, None, None)))
    cs = jax.device_put(coords, NamedSharding(mesh, P("data", "seq", None)))
    np.testing.assert_allclose(np.asarray(f(ls, cs)), ref, rtol=1e-5)


def test_folded_attention_pool_matches_xla():
    """The folded-projection pool (ops/attention.py) is the same function as
    the per-head path — exact algebra, different matmul shapes."""
    from gecco_tpu.models.set_transformer import AttentionPool

    pool = AttentionPool.init(jax.random.PRNGKey(0), 96, num_heads=4, num_inducers=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 128, 96))
    a = pool(x, attn_impl="xla")
    b = pool(x, attn_impl="folded")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_folded_attention_unpool_matches_xla():
    from gecco_tpu.models.set_transformer import Unpool

    unpool = Unpool.init(jax.random.PRNGKey(2), 96, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 128, 96))
    h = jax.random.normal(jax.random.PRNGKey(4), (3, 16, 96))
    a = unpool(x, h, attn_impl="xla")
    b = unpool(x, h, attn_impl="folded")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_folded_attention_grads_match_xla():
    """Folded path is plain einsums — autodiff must agree with the per-head
    path for both the inputs and the (folded) projection weights."""
    from gecco_tpu.models.set_transformer import Broadcast

    layer = Broadcast.init(
        jax.random.PRNGKey(5), 64, num_inducers=8, embed_dim=32, num_heads=4
    )
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 64))
    embed = jax.random.normal(jax.random.PRNGKey(7), (2, 32))

    def loss(impl):
        def f(lyr, xx):
            out, _ = lyr(xx, embed, attn_impl=impl)
            return (out**2).sum()

        return f

    ga = jax.grad(loss("xla"), argnums=(0, 1))(layer, x)
    gb = jax.grad(loss("folded"), argnums=(0, 1))(layer, x)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_folded_attention_spmd_data_and_seq():
    """Folded attention is plain einsums: GSPMD must partition it over
    data x seq with identical numerics (no custom_partitioning needed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gecco_tpu.models.set_transformer import SetTransformer
    from gecco_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, seq=2)
    st = SetTransformer.init(
        jax.random.PRNGKey(8), n_layers=2, feature_dim=64, num_inducers=8,
        embed_dim=32, num_heads=4, compute_dtype=jnp.float32, attn_impl="folded",
    )
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 64, 64))
    embed = jax.random.normal(jax.random.PRNGKey(10), (4, 32))

    f = jax.jit(lambda xx, ee: st(xx, ee))
    ref = np.asarray(f(x, embed))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))
    es = jax.device_put(embed, NamedSharding(mesh, P("data", None)))
    np.testing.assert_allclose(np.asarray(f(xs, es)), ref, rtol=1e-4, atol=1e-5)


def test_folded_pallas_matches_xla():
    """The folded megakernels (ops/pallas/folded_attention.py) in interpret
    mode: same function as the per-head XLA path, grads included."""
    from gecco_tpu.models.set_transformer import AttentionPool, Broadcast, Unpool

    pool = AttentionPool.init(jax.random.PRNGKey(0), 96, num_heads=4, num_inducers=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 128, 96))
    np.testing.assert_allclose(
        np.asarray(pool(x, attn_impl="xla")),
        np.asarray(pool(x, attn_impl="folded_pallas")),
        rtol=1e-4, atol=1e-5,
    )

    unpool = Unpool.init(jax.random.PRNGKey(2), 96, num_heads=4)
    h = jax.random.normal(jax.random.PRNGKey(4), (3, 16, 96))
    np.testing.assert_allclose(
        np.asarray(unpool(x, h, attn_impl="xla")),
        np.asarray(unpool(x, h, attn_impl="folded_pallas")),
        rtol=1e-4, atol=1e-5,
    )

    layer = Broadcast.init(
        jax.random.PRNGKey(5), 64, num_inducers=8, embed_dim=32, num_heads=4
    )
    xx = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 64))
    embed = jax.random.normal(jax.random.PRNGKey(7), (2, 32))

    def loss(impl):
        def f(lyr, z):
            out, _ = lyr(z, embed, attn_impl=impl)
            return (out**2).sum()

        return f

    ga = jax.grad(loss("xla"), argnums=(0, 1))(layer, xx)
    gb = jax.grad(loss("folded_pallas"), argnums=(0, 1))(layer, xx)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_folded_pallas_spmd_data_and_seq():
    """folded_pallas under a data x seq mesh (custom_partitioning wrapping):
    forward and grads match the unsharded run up to reduction-order noise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gecco_tpu.models.set_transformer import SetTransformer
    from gecco_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, seq=2)
    st = SetTransformer.init(
        jax.random.PRNGKey(8), n_layers=2, feature_dim=64, num_inducers=8,
        embed_dim=32, num_heads=4, compute_dtype=jnp.float32,
        attn_impl="folded_pallas",
    )
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 64, 64))
    embed = jax.random.normal(jax.random.PRNGKey(10), (4, 32))
    f = jax.jit(lambda xx, ee: st(xx, ee))
    ref = np.asarray(f(x, embed))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))
    es = jax.device_put(embed, NamedSharding(mesh, P("data", None)))
    np.testing.assert_allclose(np.asarray(f(xs, es)), ref, rtol=5e-3, atol=5e-4)

    g = jax.jit(jax.grad(lambda m, xx: (m(xx, embed) ** 2).sum(), argnums=(0, 1)))
    ga = g(st, x)
    gb = g(st, xs)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_folded_pool_vmem_gate_falls_back():
    """Shapes whose [N, J] logits exceed VMEM must silently take the XLA
    folded path (the scaled 8k config)."""
    from gecco_tpu.ops.pallas.folded_attention import pool_vmem_ok

    assert pool_vmem_ok(2048, 384, 512)
    assert not pool_vmem_ok(8192, 512, 512)


def test_pallas_gather_bwd_spmd():
    """The Pallas-native gather backward under a data x seq mesh: grads match
    the unsharded run (point axis gathered around the backward)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gecco_tpu.ops.pallas.projective_gather import bilinear_lookup_pallas
    from gecco_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, seq=2)
    level = jax.random.normal(jax.random.PRNGKey(20), (4, 8, 8, 16))
    coords = jax.random.uniform(
        jax.random.PRNGKey(21), (4, 32, 2), minval=-1.0, maxval=9.0
    )
    grad_fn = jax.jit(
        jax.grad(
            lambda lv, co: (bilinear_lookup_pallas(lv, co) ** 2).sum(),
            argnums=(0, 1),
        )
    )
    ref = grad_fn(level, coords)
    ls = jax.device_put(level, NamedSharding(mesh, P("data", None, None, None)))
    cs = jax.device_put(coords, NamedSharding(mesh, P("data", "seq", None)))
    out = grad_fn(ls, cs)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_mlp_pallas_backward_matches_twin():
    """The Pallas backward of the fused MLP (weight grads accumulated
    in-kernel) must agree with autodiff through the XLA twin."""
    from gecco_tpu.ops.pallas.folded_attention import _mlp_ref, fused_mlp_residual

    B, N, C, W = 2, 128, 64, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
    se = jax.random.normal(jax.random.PRNGKey(1), (B, C)) * 0.1 + 1.0
    be = jax.random.normal(jax.random.PRNGKey(2), (B, C)) * 0.1
    w1t = jax.random.normal(jax.random.PRNGKey(3), (C, W)) / 8
    b1 = jax.random.normal(jax.random.PRNGKey(4), (1, W)) * 0.1
    w2t = jax.random.normal(jax.random.PRNGKey(5), (W, C)) / 11
    b2 = jax.random.normal(jax.random.PRNGKey(6), (1, C)) * 0.1

    # forward parity incl. the sums output
    out_k = fused_mlp_residual(x, se, be, w1t, b1, w2t, b2)
    out_r = _mlp_ref(x, se, be, w1t, b1, w2t, b2)
    for a, b in zip(out_k, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    # gradients through BOTH outputs (the sums feed the next layer's norm)
    def loss(fn):
        def f(*a):
            o, s = fn(*a)
            return (o.astype(jnp.float32) ** 2).sum() + 1e-3 * (s**2).sum()

        return f

    gk = jax.grad(loss(fused_mlp_residual), argnums=tuple(range(7)))(
        x, se, be, w1t, b1, w2t, b2
    )
    gr = jax.grad(loss(_mlp_ref), argnums=tuple(range(7)))(
        x, se, be, w1t, b1, w2t, b2
    )
    for i, (a, b) in enumerate(zip(gk, gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=f"arg {i}"
        )


def test_folded_unpool_pallas_backward_matches_twin():
    """The Pallas backward of the fused unpool (softmax backward via the
    one-hot block maps, folded-operand cotangents chained through the fold
    jacobians) must agree with autodiff through the XLA twin, in all
    residual/prenorm variants."""
    from gecco_tpu.ops.pallas.folded_attention import _unpool_ref, folded_unpool

    B, N, C, H, I = 2, 128, 64, 4, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
    se = jax.random.normal(jax.random.PRNGKey(1), (B, C)) * 0.1 + 1.0
    be = jax.random.normal(jax.random.PRNGKey(2), (B, C)) * 0.1
    k = jax.random.normal(jax.random.PRNGKey(3), (B, I, C)) / 3
    v = jax.random.normal(jax.random.PRNGKey(4), (B, I, C)) / 3
    wq = jax.random.normal(jax.random.PRNGKey(5), (C, C)) / 8
    wo = jax.random.normal(jax.random.PRNGKey(6), (C, C)) / 8

    for residual in (True, False):
        for prenorm in (True, False):
            def loss(fn):
                def f(*a):
                    out, sums = fn(*a, H, residual, prenorm)
                    return (out**2).sum() + (sums * 0.01).sum()

                return f

            gk = jax.grad(loss(folded_unpool), argnums=tuple(range(7)))(
                x, se, be, k, v, wq, wo
            )
            gr = jax.grad(loss(_unpool_ref), argnums=tuple(range(7)))(
                x, se, be, k, v, wq, wo
            )
            for i, (a, b) in enumerate(zip(gk, gr)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5,
                    err_msg=f"arg {i} residual={residual} prenorm={prenorm}",
                )


def test_ref_jax_compat_fused_matches_plain():
    """ref_jax_compat (second MLP on the un-normed stream) through the fused
    kernel path must match the plain XLA path — the fused MLP runs with an
    identity pre-norm in compat mode."""
    from gecco_tpu.models.set_transformer import SetTransformer

    for compat in (False, True):
        st_x = SetTransformer.init(
            jax.random.PRNGKey(0), n_layers=2, feature_dim=64, num_inducers=8,
            embed_dim=32, num_heads=4, compute_dtype=jnp.float32,
            attn_impl="xla", ref_jax_compat=compat,
        )
        st_p = st_x.replace(attn_impl="folded_pallas")
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64))
        embed = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
        np.testing.assert_allclose(
            np.asarray(st_x(x, embed)), np.asarray(st_p(x, embed)),
            rtol=1e-4, atol=1e-5, err_msg=f"compat={compat}",
        )


def test_fused_cached_upsampling_path_matches_plain():
    """The h-cached (upsampling) route through the fused kernels: pool is
    skipped, the unpool pre-norm uses an XLA stats pass — must match the
    plain path given the same cached inducer states."""
    from gecco_tpu.models.set_transformer import SetTransformer

    st_x = SetTransformer.init(
        jax.random.PRNGKey(0), n_layers=2, feature_dim=64, num_inducers=8,
        embed_dim=32, num_heads=4, compute_dtype=jnp.float32, attn_impl="xla",
    )
    st_p = st_x.replace(attn_impl="folded_pallas")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64))
    embed = jax.random.normal(jax.random.PRNGKey(2), (2, 32))

    _, hs_x = st_x(x, embed, return_h=True)
    _, hs_p = st_p(x, embed, return_h=True)
    np.testing.assert_allclose(np.asarray(hs_x), np.asarray(hs_p), rtol=1e-4, atol=1e-5)

    x2 = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 64))
    np.testing.assert_allclose(
        np.asarray(st_x(x2, embed, hs=hs_x)),
        np.asarray(st_p(x2, embed, hs=hs_x)),
        rtol=1e-4, atol=1e-5,
    )


def test_folded_pool_pallas_backward_matches_twin():
    """The Pallas backward of the pool layer-side (hand-derived set-level
    GroupNorm backward, softmax-over-points backward, folded-query cotangent
    chained through the fold jacobian) must agree with autodiff through the
    XLA twin, with and without the fused pre-norm."""
    from gecco_tpu.ops.pallas.folded_attention import (
        _pool_ref,
        folded_pool_layer,
        group_indicator,
    )

    B, N, C, H, I = 2, 128, 64, 4, 8
    J, D = H * I, C // H
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
    scale = jax.random.normal(jax.random.PRNGKey(1), (B, C)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (B, C)) * 0.1
    ind2 = jax.random.normal(jax.random.PRNGKey(3), (J, D)) / 2
    kvw = jax.random.normal(jax.random.PRNGKey(4), (2 * C, C)) / 8
    wo = jax.random.normal(jax.random.PRNGKey(5), (C, C)) / 8
    gind = group_indicator(C, 8)

    for prenorm in (True, False):
        def loss(fn, *extra):
            def f(*a):
                h0, mean, inv = fn(*a, *extra)
                return (h0**2).sum() + (mean * 0.05).sum() + (inv * 0.02).sum()

            return f

        gk = jax.grad(loss(folded_pool_layer, gind, H, prenorm), argnums=tuple(range(6)))(
            x, scale, bias, ind2, kvw, wo
        )
        gr = jax.grad(loss(_pool_ref, gind.shape[1], H, prenorm), argnums=tuple(range(6)))(
            x, scale, bias, ind2, kvw, wo
        )
        for i, (a, b) in enumerate(zip(gk, gr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                err_msg=f"arg {i} prenorm={prenorm}",
            )


def test_fused_h_side_matches_twin_and_module_path():
    """fused_h_side (ops/pallas/hside.py): interpret-mode kernel vs its XLA
    twin, and the whole norm_1 -> MLP -> norm_2 -> k/v chain vs the plain
    module composition; gradients against the twin."""
    from gecco_tpu.models.set_transformer import Broadcast, _fold_mlp_operands
    from gecco_tpu.ops.pallas.folded_attention import group_indicator
    from gecco_tpu.ops.pallas.hside import _hside_ref, fused_h_side

    c, w, i, b = 64, 128, 8, 3
    bc = Broadcast.init(
        jax.random.PRNGKey(0), c, num_inducers=i, embed_dim=32, num_heads=4
    )
    h0 = jax.random.normal(jax.random.PRNGKey(1), (b, i, c))
    embed = jax.random.normal(jax.random.PRNGKey(2), (b, 32))
    ef = embed.astype(jnp.float32)

    w1t, b1, w2t, b2 = _fold_mlp_operands(bc.mlp, h0.dtype)
    args = (
        h0,
        bc.norm_1.scale_linear(ef), bc.norm_1.bias_linear(ef),
        bc.norm_2.scale_linear(ef), bc.norm_2.bias_linear(ef),
        group_indicator(c, bc.norm_1.num_groups),
        w1t, b1, w2t, b2,
        bc.unpool.k_proj.weight, bc.unpool.v_proj.weight,
    )
    out_k = fused_h_side(*args)
    out_t = _hside_ref(*args)
    for a, t in zip(out_k, out_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=1e-4, atol=1e-5)

    # module-path reference: norm_1 -> mlp -> norm_2 -> k/v projections
    hh = bc.norm_2(bc.mlp(bc.norm_1(h0, embed)), embed)
    np.testing.assert_allclose(np.asarray(out_k[0]), np.asarray(hh), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_k[1]), np.asarray(hh @ bc.unpool.k_proj.weight.T),
        rtol=1e-4, atol=1e-5,
    )

    def loss(fn):
        return lambda *a: sum((o.astype(jnp.float32) ** 2).sum() for o in fn(*a))

    ga = jax.grad(loss(fused_h_side), argnums=(0, 1, 6, 8, 10))(*args)
    gb = jax.grad(loss(_hside_ref), argnums=(0, 1, 6, 8, 10))(*args)
    for a, t in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=2e-3, atol=2e-4)


def test_folded_pool_ext_matches_ref():
    """Tiled online-softmax pool (folded_pool_ext): forward vs the XLA twin
    at a multi-tile point count, and gradients through the tiled backward
    kernel vs the twin."""
    from gecco_tpu.ops.pallas import folded_attention as fa

    c, heads, i, b, n = 96, 4, 16, 2, 384  # 384 = 3 x 128 tiles
    key = iter(jax.random.split(jax.random.PRNGKey(0), 10))
    x = jax.random.normal(next(key), (b, n, c))
    se = 1.0 + 0.1 * jax.random.normal(next(key), (b, c))
    be = 0.1 * jax.random.normal(next(key), (b, c))
    ind2 = jax.random.normal(next(key), (heads * i, c // heads))
    kvw = jax.random.normal(next(key), (2 * c, c)) / c**0.5
    wo = jax.random.normal(next(key), (c, c)) / c**0.5

    args = (x, se, be, ind2, kvw, wo)
    out = fa.folded_pool_ext(*args, heads)
    ref = fa._pool_ext_ref(*args, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda *a: (fn(*a, heads).astype(jnp.float32) ** 2).sum()

    ga = jax.grad(loss(fa.folded_pool_ext), argnums=(0, 1, 2, 3, 4, 5))(*args)
    gb = jax.grad(loss(fa._pool_ext_ref), argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, t in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=2e-3, atol=2e-4)


def test_pool_ext_wfold_vs_vstream_branches(monkeypatch):
    """_pool_ext_impl has two formulations: the folded value-side kernel
    (U = E^T Y with Wv@Wo^T pre-folded) and the v-stream kernel it falls
    back to when H*C^2 exceeds VMEM (the 8k config). Both must agree."""
    from gecco_tpu.ops.pallas import folded_attention as fa

    c, heads, i, b, n = 96, 4, 16, 2, 384
    key = iter(jax.random.split(jax.random.PRNGKey(7), 10))
    x = jax.random.normal(next(key), (b, n, c))
    se = 1.0 + 0.1 * jax.random.normal(next(key), (b, c))
    be = 0.1 * jax.random.normal(next(key), (b, c))
    ind2 = jax.random.normal(next(key), (heads * i, c // heads))
    kvw = jax.random.normal(next(key), (2 * c, c)) / c**0.5
    wo = jax.random.normal(next(key), (c, c)) / c**0.5
    args = (x, se, be, ind2, kvw, wo, heads)

    out_wfold = fa._pool_ext_impl(*args)
    # force the v-stream fallback by making the wfold fixed tally enormous
    monkeypatch.setattr(
        fa, "_pool_ext_wfold_fixed_bytes", lambda *a: 1 << 40
    )
    out_vstream = fa._pool_ext_impl(*args)
    for a, t in zip(out_wfold, out_vstream):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(t), rtol=1e-4, atol=1e-5
        )


def test_folded_pool_bwd_ext_decomposition(monkeypatch):
    """When the resident pool backward exceeds VMEM, folded_pool_layer's vjp
    decomposes into XLA stats + the tiled ext kernels — must match the
    resident backward (forced at small shapes via the gate)."""
    from gecco_tpu.ops.pallas import folded_attention as fa

    c, heads, i, b, n = 64, 4, 8, 2, 128
    key = iter(jax.random.split(jax.random.PRNGKey(1), 10))
    x = jax.random.normal(next(key), (b, n, c))
    scale = 1.0 + 0.1 * jax.random.normal(next(key), (b, c))
    bias = 0.1 * jax.random.normal(next(key), (b, c))
    ind2 = jax.random.normal(next(key), (heads * i, c // heads))
    kvw = jax.random.normal(next(key), (2 * c, c)) / c**0.5
    wo = jax.random.normal(next(key), (c, c)) / c**0.5
    gind = fa.group_indicator(c, 16)

    def loss(*a):
        h0, mean, inv = fa.folded_pool_layer(*a, heads, True)
        return (h0.astype(jnp.float32) ** 2).sum() + (mean * inv).sum()

    args = (x, scale, bias, ind2, kvw, wo, gind)
    g_resident = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args)
    monkeypatch.setattr(fa, "pool_bwd_vmem_ok", lambda *a, **k: False)
    g_ext = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, t in zip(jax.tree.leaves(g_resident), jax.tree.leaves(g_ext)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=2e-3, atol=2e-4)


def test_pool_ext_bwd_v1_v2_equivalence(monkeypatch):
    """The round-5 restructured pool backward (_pool_ext_bwd_kernel: one
    full-width e^T v matmul in pass 0, 1/sacc pre-folded into the
    placement matrix) is associativity-only vs the round-4 v1 body:
    gradients agree tightly on the same operands. The shape gate
    (_pool_bwd_mode) serves v3 wherever its tally admits a tile — its
    4·J·C folded operands cost less VMEM than the 4·J² identity + 2·C²
    eyec they replace, so v3 covers both the flagship AND the 8k shapes
    (measured faster at both, r5e arms); v1 remains the fallback for
    shapes whose v3 tally fits no tile."""
    from gecco_tpu.ops.pallas import folded_attention as fa

    assert fa._pool_bwd_mode(2048, 384, 512, 48) == "v3"  # flagship
    assert fa._pool_bwd_mode(8192, 768, 1024, 96) == "v3"  # 8k (v2 gated off)
    # a width where even v3's fixed operands blow the budget -> v1
    assert fa._pool_bwd_mode(65536, 3072, 4096, 384) == "v1"

    c, heads, i, b, n = 96, 4, 16, 2, 384  # 3 x 128 tiles
    key = iter(jax.random.split(jax.random.PRNGKey(3), 10))
    x = jax.random.normal(next(key), (b, n, c))
    se = 1.0 + 0.1 * jax.random.normal(next(key), (b, c))
    be = 0.1 * jax.random.normal(next(key), (b, c))
    ind2 = jax.random.normal(next(key), (heads * i, c // heads))
    kvw = jax.random.normal(next(key), (2 * c, c)) / c**0.5
    wo = jax.random.normal(next(key), (c, c)) / c**0.5
    args = (x, se, be, ind2, kvw, wo)

    def grads():
        return jax.grad(
            lambda *a: (
                fa.folded_pool_ext(*a, heads).astype(jnp.float32) ** 2
            ).sum(),
            argnums=(0, 1, 2, 3, 4, 5),
        )(*args)

    monkeypatch.setattr(fa, "_POOL_BWD_ENV", "v2")
    g2 = grads()
    monkeypatch.setattr(fa, "_POOL_BWD_ENV", "v1")
    g1 = grads()
    for a, t in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=2e-3, atol=2e-4)

    # v2j (1/sacc as a [J, 1] operand instead of the in-kernel eye(J)
    # matmul) is the same mathematics again; its eyej-free VMEM tally
    # fits the 8k config where v2's does not, but it stays opt-in via
    # GECCO_POOL_BWD=v2j until certified on TPU
    monkeypatch.setattr(fa, "_POOL_BWD_ENV", "v2j")
    gj = grads()
    for a, t in zip(jax.tree.leaves(gj), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=1e-5, atol=1e-6)

    # v3 (fold-everything body: e^T y accumulator, W2/W3 folded pass-1
    # operands, v never materialised) is the same mathematics with one
    # extra bf16 rounding on the folded operands — gradients agree to
    # bf16-product tolerance with both earlier bodies
    # every kernel body reachable via the monkeypatched module global must
    # also survive the env-string parse (round-5 regression: "v3" was
    # missing from the accepted set, so the bench arms silently ran v2)
    for m in ("v1", "v2", "v2j", "v3"):
        assert fa._parse_pool_bwd_env(m) == m
    assert fa._parse_pool_bwd_env("") is None
    assert fa._parse_pool_bwd_env("bogus") is None

    monkeypatch.setattr(fa, "_POOL_BWD_ENV", "v3")
    g3 = grads()
    for a, t in zip(jax.tree.leaves(g3), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=2e-3, atol=2e-4)
    n8, c8, j8, d8 = 8192, 768, 1024, 96
    assert fa._tile_fits(
        n8, fa._pool_ext_bwd_row_bytes(c8, j8),
        fa._pool_ext_bwd_fixed_bytes(c8, j8, d8, v2j=True), cap=512,
    )
    assert not fa._tile_fits(
        n8, fa._pool_ext_bwd_row_bytes(c8, j8),
        fa._pool_ext_bwd_fixed_bytes(c8, j8, d8), cap=512,
    )


def test_fused_8k_path_uses_tiled_pool(monkeypatch):
    """The big-N fallback in BroadcastingLayer._fused_call routes through
    folded_pool_ext (forced via the fwd gate) and matches the plain path."""
    from gecco_tpu.models.set_transformer import SetTransformer
    from gecco_tpu.ops.pallas import folded_attention as fa

    st_x = SetTransformer.init(
        jax.random.PRNGKey(0), n_layers=2, feature_dim=64, num_inducers=8,
        embed_dim=32, num_heads=4, compute_dtype=jnp.float32, attn_impl="xla",
    )
    st_p = st_x.replace(attn_impl="folded_pallas")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 64))
    embed = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    ref = st_x(x, embed)
    # _fused_call re-imports pool_vmem_ok at call time, so patching the
    # module attribute forces the tiled branch at this small shape
    monkeypatch.setattr(fa, "pool_vmem_ok", lambda *a, **k: False)
    out = st_p(x, embed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    # gradients through the forced-tiled path stay finite and close to xla
    g = jax.grad(lambda m, xx: (m(xx, embed).astype(jnp.float32) ** 2).sum())(st_p, x)
    gx = jax.grad(lambda m, xx: (m(xx, embed).astype(jnp.float32) ** 2).sum())(st_x, x)
    for a, t in zip(jax.tree.leaves(g), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=5e-3, atol=5e-4)


def test_tile_chooser_vmem_budget():
    """The VMEM-budget-aware tile chooser: flagship shapes keep their
    round-2 tiles; the 8k config's widths shrink them; the 8k MLP backward
    (fixed fp32 weight-grad blocks alone exceed VMEM) reports unfit and
    gates to the XLA twin."""
    from gecco_tpu.ops.pallas import folded_attention as fa

    # flagship: C=384, J=512, W=1536 at N=2048 — unchanged from round 2
    assert fa._pick_tile_n(2048, fa._unpool_row_bytes(384, 512),
                           fa._unpool_fixed_bytes(384, 512, 64)) == 1024
    assert fa._pick_tile_n(2048, fa._mlp_row_bytes(384, 1536),
                           fa._mlp_fixed_bytes(384, 1536)) == 1024
    assert fa._pick_tile_n(2048, fa._mlp_bwd_row_bytes(384, 1536),
                           fa._mlp_bwd_fixed_bytes(384, 1536), cap=512) == 512
    # 8k config: C=768, J=1024, W=3072 at N=8192 — tiles shrink (the unpool
    # prenorm fold cut its row bytes from 12c+12j to 8c+12j, so its 8k tile
    # grew back to 1024)
    assert fa._pick_tile_n(8192, fa._unpool_row_bytes(768, 1024),
                           fa._unpool_fixed_bytes(768, 1024, 64)) == 1024
    assert fa._pick_tile_n(8192, fa._mlp_row_bytes(768, 3072),
                           fa._mlp_fixed_bytes(768, 3072)) == 512
    assert not fa._tile_fits(8192, fa._mlp_bwd_row_bytes(768, 3072),
                             fa._mlp_bwd_fixed_bytes(768, 3072), cap=512)
    # no dividing candidate: falls back to n itself
    assert fa._pick_tile_n(96) == 96


def test_forced_small_tiles_match_ref(monkeypatch):
    """Shrinking the VMEM budget forces non-default point tiles (256/128)
    through the unpool and MLP kernels, forward AND backward — outputs and
    gradients must match the XLA twins (exercises the tile sizes the 8k
    config picks, at CPU-interpret-friendly widths)."""
    from gecco_tpu.ops.pallas import folded_attention as fa

    monkeypatch.setattr(fa, "_VMEM_NAIVE_BUDGET", 2 * 1024 * 1024)
    c, heads, i, b, n, w = 96, 4, 64, 2, 1024, 384
    key = iter(jax.random.split(jax.random.PRNGKey(3), 12))
    x = jax.random.normal(next(key), (b, n, c))
    se = 1.0 + 0.1 * jax.random.normal(next(key), (b, c))
    be = 0.1 * jax.random.normal(next(key), (b, c))
    k = jax.random.normal(next(key), (b, i, c))
    v = jax.random.normal(next(key), (b, i, c))
    wq = jax.random.normal(next(key), (c, c)) / c**0.5
    wo = jax.random.normal(next(key), (c, c)) / c**0.5
    j = heads * i

    # the shrunken budget must force small tiles yet stay kernel-eligible
    assert fa._pick_tile_n(n, fa._unpool_row_bytes(c, j),
                           fa._unpool_fixed_bytes(c, j, i)) == 256
    assert fa._tile_fits(n, fa._unpool_bwd_row_bytes(c, j),
                         fa._unpool_bwd_fixed_bytes(c, j, i), cap=512)
    assert fa._tile_fits(n, fa._mlp_bwd_row_bytes(c, w),
                         fa._mlp_bwd_fixed_bytes(c, w), cap=512)

    args = (x, se, be, k, v, wq, wo)
    out, sums = fa.folded_unpool(*args, heads)
    ref, ref_sums = fa._unpool_ref(*args, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ref_sums), rtol=1e-3, atol=1e-3)

    def uloss(fn):
        def f(*a):
            o, s = fn(*a, heads)
            return (o.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 1e-3
        return f

    ga = jax.grad(uloss(fa.folded_unpool), argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    gb = jax.grad(uloss(fa._unpool_ref), argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for a, t in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=5e-3, atol=5e-4)

    w1t = jax.random.normal(next(key), (c, w)) / c**0.5
    b1 = 0.1 * jax.random.normal(next(key), (1, w))
    w2t = jax.random.normal(next(key), (w, c)) / w**0.5
    b2 = 0.1 * jax.random.normal(next(key), (1, c))
    margs = (x, se, be, w1t, b1, w2t, b2)
    mo, ms = fa.fused_mlp_residual(*margs)
    ro, rs = fa._mlp_ref(*margs)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(ro), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(rs), rtol=1e-3, atol=1e-3)

    def mloss(fn):
        def f(*a):
            o, s = fn(*a)
            return (o.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 1e-3
        return f

    ga = jax.grad(mloss(fa.fused_mlp_residual), argnums=(0, 1, 2, 3, 4, 5, 6))(*margs)
    gb = jax.grad(mloss(fa._mlp_ref), argnums=(0, 1, 2, 3, 4, 5, 6))(*margs)
    for a, t in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=5e-3, atol=5e-4)


def test_unpool_softmax_per_head_scale_drift():
    """Regression for the round-3 divergence: per-head logit scales drift
    apart during training; each head-block's softmax must be computed with
    ITS OWN maximum. Here one head's logits sit ~hundreds below another's —
    a shared global row max would clamp the weak head's block to uniform
    probabilities and zero/garbage gradients. Outputs AND gradients must
    match the XLA twin."""
    from gecco_tpu.ops.pallas import folded_attention as fa

    c, heads, i, b, n = 128, 4, 16, 2, 256
    key = iter(jax.random.split(jax.random.PRNGKey(5), 10))
    x = jax.random.normal(next(key), (b, n, c))
    se = jnp.ones((b, c))
    be = jnp.zeros((b, c))
    # scale k per head: head 0 huge logits, head 3 tiny — spread >> 80
    head_scale = jnp.repeat(jnp.array([60.0, 1.0, 0.1, 0.01]), c // heads)
    k = jax.random.normal(next(key), (b, i, c)) * head_scale[None, None, :]
    v = jax.random.normal(next(key), (b, i, c))
    wq = jax.random.normal(next(key), (c, c)) / c**0.5
    wo = jax.random.normal(next(key), (c, c)) / c**0.5

    args = (x, se, be, k, v, wq, wo)
    out, sums = fa.folded_unpool(*args, heads)
    ref, ref_sums = fa._unpool_ref(*args, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def loss(fn):
        def f(*a):
            o, s = fn(*a, heads)
            return (o.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 1e-3
        return f

    ga = jax.grad(loss(fa.folded_unpool), argnums=(0, 3, 4, 5, 6))(*args)
    gb = jax.grad(loss(fa._unpool_ref), argnums=(0, 3, 4, 5, 6))(*args)
    for a, t in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        a, t = np.asarray(a, np.float32), np.asarray(t, np.float32)
        np.testing.assert_allclose(a, t, rtol=5e-3, atol=5e-3 * np.abs(t).max())
