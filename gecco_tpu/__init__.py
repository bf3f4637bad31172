"""gecco_tpu — a TPU-native point-cloud diffusion framework.

A from-scratch rebuild of the capabilities of cvlab-epfl/gecco
("GECCO: Geometrically-Conditioned Point Diffusion Models", arXiv 2303.05916)
designed for TPU hardware: batched modules, jit + Mesh data/sequence
parallelism, lax.scan samplers, Pallas kernels for the hot ops, orbax
checkpoints.
"""

from gecco_tpu.diffusion import (
    Diffusion,
    LogNormalSchedule,
    LogUniformSchedule,
    NoCond,
    Schedule,
)
from gecco_tpu.reparam import GaussianReparam, NoReparam, Reparam, UVLReparam
from gecco_tpu.types import (
    Context3d,
    DataError,
    Example,
    LogpDetails,
    NaNError,
    SampleDetails,
    to_device,
)

__version__ = "0.1.0"

__all__ = [
    "Diffusion",
    "LogNormalSchedule",
    "LogUniformSchedule",
    "NoCond",
    "Schedule",
    "GaussianReparam",
    "NoReparam",
    "Reparam",
    "UVLReparam",
    "Context3d",
    "DataError",
    "Example",
    "LogpDetails",
    "NaNError",
    "SampleDetails",
    "to_device",
    "__version__",
]
