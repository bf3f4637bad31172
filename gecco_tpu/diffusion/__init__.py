from gecco_tpu.diffusion.diffusion import Diffusion, NoCond
from gecco_tpu.diffusion.samplers import heun_sampler, inpaint_sampler
from gecco_tpu.diffusion.schedule import (
    LogNormalSchedule,
    LogUniformSchedule,
    Schedule,
    low_discrepancy_uniform,
)

__all__ = [
    "Diffusion",
    "NoCond",
    "heun_sampler",
    "inpaint_sampler",
    "LogNormalSchedule",
    "LogUniformSchedule",
    "Schedule",
    "low_discrepancy_uniform",
]
