"""Device mesh and sharding helpers.

Replaces the reference's entire pmap bookkeeping layer — ``Stepper``,
``shard_key``, ``unshard``, ``replicate_pytree``, ``torch_to('pmap')``,
``MetricPmapWrapper`` (gecco-jax/src/gecco_jax/training.py:52-138,
types.py:53-60, metrics.py:206-221) — with jit + ``jax.sharding``
annotations. XLA inserts the gradient all-reduce over ICI; multi-host scaling
is the same code with ``jax.distributed.initialize``.

Mesh axes:
- ``data``: batch-parallel (the reference's only strategy, §2c);
- ``seq``: optional point/sequence parallelism for very large point sets —
  inducers are replicated, points sharded; XLA's SPMD partitioner handles the
  rectangular attentions (one all-gather of the I=64 inducer tokens).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "init_distributed",
]


def init_distributed(**kwargs) -> int:
    """Initialise multi-host JAX (one call per process, before any device
    use) and return the process index.

    The reference is single-host only (SURVEY.md §2c: no
    ``jax.distributed.initialize`` anywhere); this is the multi-slice entry
    point — after it, the same ``make_mesh``/``shard_batch`` code scales
    across hosts, with XLA routing collectives over ICI within a slice and
    DCN across slices. No-ops when not in a distributed environment.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # already initialised, or single-process environment
        if "already" not in str(e) and jax.process_count() == 1:
            pass
    return jax.process_index()


def make_mesh(
    data: Optional[int] = None,
    seq: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, seq)`` mesh. Defaults to all local devices on the
    data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // seq
    if data * seq != n:
        raise ValueError(f"mesh {data}x{seq} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, seq)
    return Mesh(dev_array, axis_names=("data", "seq"))


def batch_sharding(mesh: Mesh, shard_points: bool = False) -> NamedSharding:
    """Sharding for a ``[B, N, ...]`` batch: B over 'data', optionally N over
    'seq'."""
    if shard_points:
        return NamedSharding(mesh, P("data", "seq"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, shard_points: bool = False):
    """Place a pytree of host arrays with the batch axis split over 'data'.

    On a degenerate single-device mesh this is a plain ``device_put``:
    NamedSharding adds nothing there, and the axon single-chip TPU runtime
    hangs on host fetches of NamedSharding-derived arrays.
    """
    if mesh.size == 1:
        return jax.tree.map(
            lambda x: jax.device_put(np.asarray(x))
            if x is not None and not (isinstance(x, tuple) and len(x) == 0)
            else x,
            batch,
        )

    sharding = batch_sharding(mesh, shard_points=shard_points)
    rep = replicated_sharding(mesh)

    def _put(x):
        if x is None or (isinstance(x, tuple) and len(x) == 0):
            return x
        arr = np.asarray(x)
        if arr.ndim == 0:
            return jax.device_put(arr, rep)
        return jax.device_put(arr, sharding)

    return jax.tree.map(_put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (model/opt state) across the mesh. No-op on a
    single-device mesh (see shard_batch)."""
    if mesh.size == 1:
        return tree
    rep = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, tree
    )
