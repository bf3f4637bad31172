from gecco_tpu.vis.vis2d import (
    make_denoise_callback,
    make_sample_figures_callback,
    plot_trajectories_2d,
)
from gecco_tpu.vis.vis3d import (
    PCVisCallback,
    make_unconditional_sample_callback,
    plot_3d,
)

__all__ = [
    "make_denoise_callback",
    "make_sample_figures_callback",
    "plot_trajectories_2d",
    "PCVisCallback",
    "make_unconditional_sample_callback",
    "plot_3d",
]
