"""Reference-style implementations used as honest benchmark baselines."""

from gecco_tpu.baselines.reference_jax import (
    ref_denoise,
    ref_denoise_single,
    ref_sample,
)

__all__ = ["ref_denoise", "ref_denoise_single", "ref_sample"]
