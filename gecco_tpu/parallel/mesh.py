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
    DCN across slices. Mesh layout rule of thumb: put the cross-host axis
    OUTERMOST (the 'data' axis — gradient all-reduces tolerate DCN latency)
    and keep the 'seq' axis within a host/slice so point-sharded batches
    stay host-local.

    Explicitly-misconfigured calls raise; calling again after a successful
    initialisation is a no-op; a no-argument call outside any recognisable
    cluster environment stays single-process (returns 0).
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
    except ValueError:
        if kwargs:
            # explicit arguments that fail to parse are a real error
            raise
        # no args + no cluster auto-detection: single-process environment
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

    Multi-host (``jax.process_count() > 1``): each process passes its LOCAL
    slice of the global batch (see ``DataLoader(shard_by_process=True)``) and
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the 'data' axis must span
    processes, and with ``shard_points`` the 'seq' axis must stay
    process-local (see ``init_distributed``).
    """
    if mesh.size == 1:
        return jax.tree.map(
            lambda x: jax.device_put(np.asarray(x))
            if x is not None and not (isinstance(x, tuple) and len(x) == 0)
            else x,
            batch,
        )

    pts_sharding = batch_sharding(mesh, shard_points=shard_points)
    data_sharding = batch_sharding(mesh, shard_points=False)
    rep = replicated_sharding(mesh)
    multiprocess = jax.process_count() > 1

    def _put(x, sharding):
        if x is None or (isinstance(x, tuple) and len(x) == 0):
            return x
        arr = np.asarray(x)
        sh = rep if arr.ndim == 0 else sharding
        if multiprocess:
            return jax.make_array_from_process_local_data(sh, arr)
        return jax.device_put(arr, sh)

    # only the POINT tensor carries the sequence axis in dim 1; context
    # leaves (images [B, H, W, 3], intrinsics [B, 3, 3]) are batch-sharded
    # only — splitting an image's height over 'seq' would be nonsense
    from gecco_tpu.types import Example

    if isinstance(batch, Example):
        return Example(
            points=_put(batch.points, pts_sharding),
            ctx=jax.tree.map(lambda x: _put(x, data_sharding), batch.ctx),
            extras=jax.tree.map(lambda x: _put(x, data_sharding), batch.extras),
        )
    return jax.tree.map(lambda x: _put(x, pts_sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (model/opt state) across the mesh. No-op on a
    single-device mesh (see shard_batch). Multi-host: every process holds the
    same values (same PRNG seed / restored checkpoint) and the global
    replicated array is assembled from the per-process copies."""
    if mesh.size == 1:
        return tree
    rep = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x))
            if hasattr(x, "shape")
            else x,
            tree,
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, tree
    )
