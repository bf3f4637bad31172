"""Model-layer tests: shapes, init semantics, cache consistency
(ref: gecco-jax/src/gecco_jax/models/set_transformer.py,
gecco-torch/src/gecco_torch/models/set_transformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gecco_tpu.models import (
    AdaGN,
    GaussianActivation,
    MLP,
    SetTransformer,
    UnconditionalPointNetwork,
)
from gecco_tpu.ops import group_norm, layer_norm, rect_attention
from gecco_tpu.utils import count_parameters


def _small_backbone(key, compute_dtype=jnp.float32, **kw):
    defaults = dict(
        n_layers=2,
        feature_dim=64,
        num_inducers=8,
        embed_dim=1,
        num_heads=4,
        compute_dtype=compute_dtype,
    )
    defaults.update(kw)
    return SetTransformer.init(key, **defaults)


def test_gaussian_activation():
    act = GaussianActivation.init(alpha=1.0)
    x = jnp.array([0.0, 1.0, -1.0])
    np.testing.assert_allclose(
        np.asarray(act(x)), np.exp(-np.array([0.0, 1.0, 1.0]) / 2), rtol=1e-6
    )
    act_n = GaussianActivation.init(alpha=1.0, normalized=True)
    np.testing.assert_allclose(float(act_n(jnp.array(0.0))), (1.0 - 0.7) / 0.28, rtol=1e-5)


def test_group_norm_set_level_stats():
    """GroupNorm reduces over tokens AND group channels (the reference's
    MoveChannels+eqx.GroupNorm semantics)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
    y = group_norm(x, num_groups=2)
    yg = np.asarray(y).reshape(2, 16, 2, 4)
    for b in range(2):
        for g in range(2):
            block = yg[b, :, g, :]
            assert abs(block.mean()) < 1e-5
            np.testing.assert_allclose(block.std(), 1.0, atol=1e-3)


def test_layer_norm_per_token():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    y = np.asarray(layer_norm(x))
    np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-2)


def test_adagn_identity_at_init():
    """At init AdaGN must reduce to the plain norm regardless of embed
    (normalization.py:33-49 identity init)."""
    gn = AdaGN.init(jax.random.PRNGKey(2), num_features=32, embed_dim=4, num_groups=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 32))
    embed = 100.0 * jax.random.normal(jax.random.PRNGKey(4), (2, 4))
    np.testing.assert_allclose(
        np.asarray(gn(x, embed)), np.asarray(group_norm(x, 4)), rtol=1e-5, atol=1e-5
    )


def test_rect_attention_vs_naive():
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (2, 4, 8, 16))
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 32, 16))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 4, 32, 16))
    out = rect_attention(q, k, v)
    logits = np.einsum("bhmd,bhnd->bhmn", q, k) / np.sqrt(16)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    expected = np.einsum("bhmn,bhnd->bhmd", w, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_mlp_shapes():
    mlp = MLP.init(jax.random.PRNGKey(6), 16, 16, width_size=32, depth=1)
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 5, 16))
    assert mlp(x).shape == (3, 5, 16)


def test_set_transformer_forward_shape():
    st = _small_backbone(jax.random.PRNGKey(8))
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 24, 64))
    embed = jnp.ones((2, 1))
    y = st(x, embed)
    assert y.shape == (2, 24, 64)
    assert np.isfinite(np.asarray(y)).all()


def test_set_transformer_cache_consistency():
    """Running with cached inducer states must reproduce the uncached output
    exactly for the same inputs (torch set_transformer.py:92-117)."""
    st = _small_backbone(jax.random.PRNGKey(10))
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 24, 64))
    embed = jnp.ones((2, 1)) * 0.3

    y_ref, hs = st(x, embed, return_h=True)
    assert hs.shape == (2, 2, 8, 64)  # [L, B, I, C]

    y_cached = st(x, embed, hs=hs)
    np.testing.assert_allclose(np.asarray(y_cached), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_set_transformer_cache_decouples_queries():
    """With a cache the pool side is frozen, so query tokens only interact
    through the (permutation-invariant) set-level norms — permuting the
    query set must permute the output exactly. (Note: *subsetting* queries
    legitimately shifts the AdaGN statistics, in the reference too.)"""
    st = _small_backbone(jax.random.PRNGKey(12))
    x = jax.random.normal(jax.random.PRNGKey(13), (1, 24, 64))
    embed = jnp.ones((1, 1))
    _, hs = st(x, embed, return_h=True)

    y_all = st(x, embed, hs=hs)
    perm = jax.random.permutation(jax.random.PRNGKey(14), 24)
    y_perm = st(x[:, perm], embed, hs=hs)
    np.testing.assert_allclose(
        np.asarray(y_all[:, perm]), np.asarray(y_perm), rtol=1e-4, atol=1e-4
    )


def test_network_permutation_equivariance():
    """No positional encoding: permuting the point set permutes the output
    (SURVEY.md §5.7)."""
    key = jax.random.PRNGKey(14)
    st = _small_backbone(key)
    net = UnconditionalPointNetwork.init(jax.random.fold_in(key, 1), st, feature_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(15), (1, 24, 3))
    t = jnp.array([1.5])
    y = net(t, x)
    perm = jax.random.permutation(jax.random.PRNGKey(16), 24)
    y_perm = net(t, x[:, perm])
    np.testing.assert_allclose(
        np.asarray(y[:, perm]), np.asarray(y_perm), rtol=1e-4, atol=1e-4
    )


def test_flagship_parameter_count():
    """The paper config (6 layers, C=384, I=64, H=8) must land at the ~20M
    scale of the reference (SURVEY.md §2c)."""
    key = jax.random.PRNGKey(17)
    st = SetTransformer.init(
        key, n_layers=6, feature_dim=384, num_inducers=64, embed_dim=1, num_heads=8
    )
    net = UnconditionalPointNetwork.init(jax.random.fold_in(key, 1), st, feature_dim=384)
    n = count_parameters(net)
    assert 10_000_000 < n < 30_000_000, n


def test_bf16_compute_dtype():
    st = _small_backbone(jax.random.PRNGKey(18), compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(19), (2, 24, 64))
    y = st(x, jnp.ones((2, 1)))
    assert y.dtype == x.dtype  # cast back at the boundary
    assert np.isfinite(np.asarray(y, dtype=np.float32)).all()


def test_folded_head_matches_groupnorm_head():
    """The stats-free output head (wrappers._folded_head consuming the
    kernel-emitted channel sums) must equal GroupNorm -> Linear, and the
    analytic layer-0 sums (wrappers._embed_channel_sums) must equal the
    in-stream stats pass — the exact-algebra contract of the fold."""
    from gecco_tpu.models.wrappers import _embed_channel_sums, _folded_head
    from gecco_tpu.ops.norms import group_norm

    key = jax.random.PRNGKey(40)
    bk, nk, xk = jax.random.split(key, 3)
    backbone = SetTransformer.init(
        bk, n_layers=2, feature_dim=64, num_inducers=8, embed_dim=1,
        num_heads=4, compute_dtype=jnp.float32, attn_impl="folded_pallas",
    )
    net = UnconditionalPointNetwork.init(nk, backbone, feature_dim=64)
    x = jax.random.normal(xk, (3, 128, 3), jnp.float32)
    t = jnp.full((3,), 0.7)

    # forward: new path vs manual old head on the same backbone output
    y_new = net(t, x)
    feats = net.xyz_embed(x)
    out_old = backbone(feats, t[..., None])
    y_old = net.output_proj(group_norm(out_old, 32)).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old), atol=3e-5)

    # analytic in_sums == in-stream sums of the embedded features
    s_analytic = np.asarray(_embed_channel_sums(net.xyz_embed, x))
    ff = np.asarray(feats, np.float64)
    s_stream = np.stack([ff.sum(1), (ff * ff).sum(1)], 1)
    np.testing.assert_allclose(
        s_analytic, s_stream, rtol=1e-5, atol=1e-4 * np.abs(s_stream).max()
    )

    # _folded_head is exactly GroupNorm -> Linear given exact sums
    of = np.asarray(out_old, np.float64)
    sums = jnp.asarray(np.stack([of.sum(1), (of * of).sum(1)], 1), jnp.float32)
    y_fold = _folded_head(net.output_proj, 32, out_old, sums)
    y_ref = net.output_proj(group_norm(out_old, 32))
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref), atol=3e-5)

    # gradients through the sums-consuming head match the XLA-impl graph
    backbone_x = SetTransformer.init(
        bk, n_layers=2, feature_dim=64, num_inducers=8, embed_dim=1,
        num_heads=4, compute_dtype=jnp.float32, attn_impl="xla",
    )
    net_x = UnconditionalPointNetwork.init(nk, backbone_x, feature_dim=64)

    def loss(n_):
        return (n_(t, x) ** 2).sum()

    gp, gx = jax.grad(loss)(net), jax.grad(loss)(net_x)
    for lp, lx in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        scale = float(jnp.abs(lx).max()) + 1e-8
        assert float(jnp.abs(lp - lx).max()) / scale < 2e-4

    # cached-upsampling path (hs=...) falls back to the stats head and works
    y_h, stored = net(t, x, return_h=True)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_new), atol=1e-6)
    y_cached = net(t, x, hs=stored)
    assert np.isfinite(np.asarray(y_cached)).all()
