from gecco_tpu.utils.modules import (
    Frozen,
    Linear,
    count_parameters,
    module,
    stack_modules,
    static,
    unstack_module,
    unstack_modules,
)
from gecco_tpu.utils.prng import splitter

__all__ = [
    "Frozen",
    "Linear",
    "count_parameters",
    "module",
    "stack_modules",
    "static",
    "unstack_module",
    "unstack_modules",
    "splitter",
]
