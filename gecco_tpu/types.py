"""Core data structures.

Parity with the reference's L0 layer (gecco-jax/src/gecco_jax/types.py:38-130,
gecco-torch/src/gecco_torch/structs.py:37-91), redesigned TPU-first:

- ``Example`` / ``Context3d`` are NamedTuples (automatically JAX pytrees) that
  hold *batched* arrays ``[B, ...]``.
- Host-to-device transfer uses ``jax.sharding.NamedSharding`` over a device
  mesh instead of the reference's ``device_put_sharded`` pmap plumbing
  (types.py:53-60). One call covers the "np"/"jnp"/"pmap" trichotomy.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import numpy as np

__all__ = [
    "Example",
    "Context3d",
    "SampleDetails",
    "LogpDetails",
    "DataError",
    "NaNError",
    "to_device",
    "batch_index",
]


class DataError(RuntimeError):
    """Raised on malformed dataset contents (types.py:11-12)."""


class NaNError(RuntimeError):
    """Raised on non-finite training loss (types.py:15-16)."""


def _shape_repr(self) -> str:
    fields = []
    for name in self._fields:
        value = getattr(self, name)
        shown = tuple(value.shape) if hasattr(value, "shape") else value
        fields.append(f"{name}={shown}")
    return f"{type(self).__name__}({', '.join(fields)})"


class Context3d(NamedTuple):
    """Conditioning context: image + camera intrinsics (types.py:98-108)."""

    image: Optional[Any]  # [B, H, W, 3] float, channels-last (TPU layout)
    K: Any  # [B, 3, 3] camera intrinsics
    wmat: Any = ()  # optional [B, 3, 4] world-to-camera

    __repr__ = _shape_repr


class Example(NamedTuple):
    """One (batched) training example (types.py:81-95)."""

    points: Any  # [B, N, 3]
    ctx: Optional[Context3d] = None
    extras: Any = ()  # () instead of None for collation friendliness

    __repr__ = _shape_repr

    def discard_extras(self) -> "Example":
        return self._replace(extras=())


class SampleDetails(NamedTuple):
    """Full sampler output (types.py:123-130)."""

    latent: Any
    sample_diff: Any
    sample_data: Any
    trajectory_diff: Any
    trajectory_data: Any

    __repr__ = _shape_repr


class LogpDetails(NamedTuple):
    """Decomposed exact-likelihood output (types.py:111-120)."""

    logp: Any
    prior_logp: Any
    delta_reparam: Any
    delta_jacobian: Any
    trajectory_diff: Any
    trajectory_data: Any
    latent: Any

    __repr__ = _shape_repr


def to_device(data: Any, sharding: Optional[jax.sharding.Sharding] = None) -> Any:
    """Move a pytree of host arrays onto device(s).

    With ``sharding`` (typically ``NamedSharding(mesh, P('data'))``) the batch
    axis is split across the mesh; without it, arrays land on the default
    device. Replaces the reference's ``torch_to(..., 'np'|'jnp'|'pmap')``
    (types.py:38-62).
    """

    def _put(x):
        if x is None or (isinstance(x, tuple) and len(x) == 0):
            return x
        arr = np.asarray(x)
        if sharding is None:
            return jax.device_put(arr)
        return jax.device_put(arr, sharding)

    return jax.tree.map(_put, data)


def batch_index(data: Any, index: Any) -> Any:
    """Index every array leaf of a pytree along its batch axis.

    Replaces ``BatchIndexHelper`` (types.py:65-78).
    """

    def _index_one(item):
        if not hasattr(item, "__array__"):
            return item
        return item[index]

    return jax.tree.map(_index_one, data)
