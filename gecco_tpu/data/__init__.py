from gecco_tpu.data.loader import (
    ConcatDataset,
    ConcatenatedSampler,
    DataLoader,
    FixedSampler,
    dataloader,
)

__all__ = [
    "ConcatDataset",
    "ConcatenatedSampler",
    "DataLoader",
    "FixedSampler",
    "dataloader",
]
