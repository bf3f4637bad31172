"""Reference (gecco-jax / equinox) checkpoint conversion.

The reference saves EMA weights with ``eqx.tree_serialise_leaves`` —
consecutive ``np.save`` blobs in pytree-flatten order of its Diffusion module
(gecco-jax/src/gecco_jax/training.py:224-241,
infer_unconditional/__main__.py:18-22). equinox 0.10.3 (the pinned version,
gecco-jax/pyproject.toml) serialises array leaves AND python-scalar fields
(floats/ints/bools such as ``Dropout.p``, ``AdaNorm.num_features``,
``Schedule.sigma_max``); actual parameters are float32 jax arrays. We read
every blob and keep only parameter blobs — anything that is not a 0-d
float64/int64/bool (the numpy dtypes python scalars serialise to) — which
makes the converter robust to the exact ordering of equinox's scalar fields.

The PARAMETER order is fixed by the reference's own field declarations
(all cited from /root/reference/gecco-jax/src/gecco_jax/models/):

Diffusion(network, cond, reparam, schedule, divergence_fn)  diffusion.py:195-218
  network = UnconditionalPointNetwork: backbone, xyz_embed, reparam,
      output_norm (GroupNorm, affine-free -> no params), output_proj
      ray.py:41-95
    backbone = BroadcastingSetTransformer.layers[i]   set_transformer.py:220-249
      BroadcastingLayer: broadcast_norm, broadcast, mlp_norm, mlp   :160-217
        AdaGN: scale_linear(w, b), bias_linear(w, b)   normalization.py:17-52
        Broadcast: pool, norm_1, mlp, norm_2, unpool   :105-157
          AttentionPool: inducers [I,H,D], key_proj.w, value_proj.w,
              output_proj.w (biases off)               :17-73
          MLP: layers[(w, b), (w, b)], activation.alpha   mlp.py:16-75,
              activation.py:7-9 (alpha is a 0-d float32 array)
          unpool = eqx.nn.MultiheadAttention: query/key/value/output_proj.w
              (biases off)                             :144-148
    xyz_embed = LinearSpaceEmbedding(eqx.nn.Linear): w [C,3], b [C]
    reparam = GaussianReparam: mean [D], std [D]       reparam.py:121-123
    output_proj: w [3,C], b [3]
  cond = NoCond (no params)
  reparam = GaussianReparam: mean, std

Mapping to gecco_tpu (layout deltas, all shape-checked):
- inducers [I,H,D] -> ours [H,I,D];
- separate key/value projections -> our fused kv_proj (rows [k; v]);
- the resulting SetTransformer must run with ``ref_jax_compat=True`` (the
  second-MLP-on-unnormed-stream quirk, set_transformer.py:216-217).
"""

from __future__ import annotations

import io
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "read_eqx_arrays",
    "write_eqx_arrays",
    "export_flagship_to_eqx_order",
    "load_flagship_from_eqx",
]

_SCALAR_FIELD_DTYPES = (np.dtype(np.float64), np.dtype(np.int64), np.dtype(np.bool_))


def read_eqx_arrays(path: str) -> List[np.ndarray]:
    """Read consecutive ``np.save`` blobs from an .eqx file and return only
    the parameter arrays (python-scalar field blobs are dropped, see module
    docstring)."""
    blobs = []
    with open(path, "rb") as f:
        while True:
            try:
                blobs.append(np.lib.format.read_array(f, allow_pickle=False))
            except Exception:
                break
    return [
        b
        for b in blobs
        if not (b.ndim == 0 and b.dtype in _SCALAR_FIELD_DTYPES)
    ]


def write_eqx_arrays(path: str, arrays) -> None:
    """Write arrays as consecutive npy blobs (the .eqx on-disk format)."""
    with open(path, "wb") as f:
        for a in arrays:
            np.save(f, np.asarray(a))


class _Cursor:
    def __init__(self, arrays: List[np.ndarray]):
        self.arrays = arrays
        self.i = 0

    def take(self, shape, what: str) -> jnp.ndarray:
        if self.i >= len(self.arrays):
            raise ValueError(f"checkpoint exhausted at {what} (expected {shape})")
        a = self.arrays[self.i]
        if tuple(a.shape) != tuple(shape):
            raise ValueError(
                f"{what}: expected shape {tuple(shape)}, got {tuple(a.shape)} "
                f"at parameter index {self.i} — architecture mismatch?"
            )
        self.i += 1
        return jnp.asarray(a, jnp.float32)

    def done(self):
        if self.i != len(self.arrays):
            raise ValueError(
                f"{len(self.arrays) - self.i} unconsumed parameters "
                f"(consumed {self.i}) — architecture mismatch?"
            )


def _linear(cur: _Cursor, lin, what: str, bias: bool = True):
    w = cur.take(lin.weight.shape, f"{what}.weight")
    b = cur.take(lin.bias.shape, f"{what}.bias") if bias else None
    return lin.replace(weight=w, bias=b if bias else lin.bias)


def _adagn(cur: _Cursor, norm, what: str):
    return norm.replace(
        scale_linear=_linear(cur, norm.scale_linear, f"{what}.scale"),
        bias_linear=_linear(cur, norm.bias_linear, f"{what}.bias"),
    )


def _mlp(cur: _Cursor, mlp, what: str):
    layers = tuple(
        _linear(cur, lin, f"{what}.layers[{i}]") for i, lin in enumerate(mlp.layers)
    )
    alpha = cur.take((), f"{what}.activation.alpha")
    return mlp.replace(layers=layers, activation=mlp.activation.replace(alpha=alpha))


def _broadcasting_layer(cur: _Cursor, layer, what: str):
    broadcast_norm = _adagn(cur, layer.broadcast_norm, f"{what}.broadcast_norm")

    pool = layer.broadcast.pool
    h, i, d = pool.inducers.shape
    inducers = cur.take((i, h, d), f"{what}.pool.inducers").transpose(1, 0, 2)
    c = h * d
    k_w = cur.take((c, c), f"{what}.pool.key_proj.weight")
    v_w = cur.take((c, c), f"{what}.pool.value_proj.weight")
    out_w = cur.take((c, c), f"{what}.pool.output_proj.weight")
    pool = pool.replace(
        inducers=inducers,
        kv_proj=pool.kv_proj.replace(weight=jnp.concatenate([k_w, v_w], axis=0)),
        out_proj=pool.out_proj.replace(weight=out_w),
    )

    norm_1 = _adagn(cur, layer.broadcast.norm_1, f"{what}.norm_1")
    b_mlp = _mlp(cur, layer.broadcast.mlp, f"{what}.broadcast.mlp")
    norm_2 = _adagn(cur, layer.broadcast.norm_2, f"{what}.norm_2")

    unpool = layer.broadcast.unpool
    unpool = unpool.replace(
        q_proj=unpool.q_proj.replace(
            weight=cur.take((c, c), f"{what}.unpool.query_proj")
        ),
        k_proj=unpool.k_proj.replace(
            weight=cur.take((c, c), f"{what}.unpool.key_proj")
        ),
        v_proj=unpool.v_proj.replace(
            weight=cur.take((c, c), f"{what}.unpool.value_proj")
        ),
        out_proj=unpool.out_proj.replace(
            weight=cur.take((c, c), f"{what}.unpool.output_proj")
        ),
    )

    broadcast = layer.broadcast.replace(
        pool=pool, norm_1=norm_1, mlp=b_mlp, norm_2=norm_2, unpool=unpool
    )
    mlp_norm = _adagn(cur, layer.mlp_norm, f"{what}.mlp_norm")
    mlp = _mlp(cur, layer.mlp, f"{what}.mlp")
    return layer.replace(
        broadcast_norm=broadcast_norm, broadcast=broadcast, mlp_norm=mlp_norm, mlp=mlp
    )


def load_flagship_from_eqx(model, path: str):
    """Populate an unconditional gecco_tpu ``Diffusion`` model from a
    reference .eqx checkpoint (EMA weights). The model must be built with the
    same architecture (layers/feature_dim/inducers/heads) and with
    ``ref_jax_compat=True`` for bit-exact forward parity."""
    from gecco_tpu.utils.modules import stack_modules, unstack_modules

    cur = _Cursor(read_eqx_arrays(path))

    net = model.network
    backbone = net.backbone
    if not backbone.ref_jax_compat:
        raise ValueError(
            "build the SetTransformer with ref_jax_compat=True to load "
            "reference-jax checkpoints (second-MLP stream quirk)"
        )

    layers = unstack_modules(backbone.layers, backbone.n_layers)
    layers = [
        _broadcasting_layer(cur, layer, f"layers[{i}]")
        for i, layer in enumerate(layers)
    ]
    backbone = backbone.replace(layers=stack_modules(layers))

    xyz_embed = _linear(cur, net.xyz_embed, "xyz_embed")

    # the reference PointNetwork embeds its own reparam copy (ray.py:44-60)
    net_reparam_mean = cur.take(model.reparam.mean.shape, "network.reparam.mean")
    net_reparam_std = cur.take(model.reparam.std.shape, "network.reparam.std")

    output_proj = _linear(cur, net.output_proj, "output_proj")

    # Diffusion-level reparam (identical to the network's copy in practice)
    reparam = model.reparam.replace(
        mean=cur.take(model.reparam.mean.shape, "reparam.mean"),
        std=cur.take(model.reparam.std.shape, "reparam.std"),
    )
    cur.done()

    del net_reparam_mean, net_reparam_std  # shape-validated, value == reparam
    net = net.replace(
        backbone=backbone, xyz_embed=xyz_embed, output_proj=output_proj
    )
    return model.replace(network=net, reparam=reparam)


def export_flagship_to_eqx_order(model) -> List[np.ndarray]:
    """Inverse of ``load_flagship_from_eqx``: emit this model's parameters in
    the reference's serialisation order (used by the roundtrip self-test and
    for handing checkpoints BACK to the reference implementation)."""
    from gecco_tpu.utils.modules import unstack_modules

    out: List[np.ndarray] = []

    def put(a):
        out.append(np.asarray(a, np.float32))

    def put_linear(lin, bias=True):
        put(lin.weight)
        if bias:
            put(lin.bias)

    def put_adagn(norm):
        put_linear(norm.scale_linear)
        put_linear(norm.bias_linear)

    def put_mlp(mlp):
        for lin in mlp.layers:
            put_linear(lin)
        put(mlp.activation.alpha)

    net = model.network
    backbone = net.backbone
    for layer in unstack_modules(backbone.layers, backbone.n_layers):
        put_adagn(layer.broadcast_norm)
        pool = layer.broadcast.pool
        put(np.asarray(pool.inducers).transpose(1, 0, 2))  # [H,I,D] -> [I,H,D]
        c = pool.kv_proj.weight.shape[1]
        put(pool.kv_proj.weight[:c])  # key_proj
        put(pool.kv_proj.weight[c:])  # value_proj
        put(pool.out_proj.weight)
        put_adagn(layer.broadcast.norm_1)
        put_mlp(layer.broadcast.mlp)
        put_adagn(layer.broadcast.norm_2)
        unpool = layer.broadcast.unpool
        for lin in (unpool.q_proj, unpool.k_proj, unpool.v_proj, unpool.out_proj):
            put(lin.weight)
        put_adagn(layer.mlp_norm)
        put_mlp(layer.mlp)

    put_linear(net.xyz_embed)
    put(model.reparam.mean)  # network-embedded reparam copy
    put(model.reparam.std)
    put_linear(net.output_proj)
    put(model.reparam.mean)  # Diffusion-level reparam
    put(model.reparam.std)
    return out
