from gecco_tpu.data.loader import (
    ConcatenatedSampler,
    DataLoader,
    FixedSampler,
    dataloader,
)

__all__ = ["ConcatenatedSampler", "DataLoader", "FixedSampler", "dataloader"]
