"""Data pipeline tests (ref: gecco-jax/src/gecco_jax/data/util.py)."""

import numpy as np

from gecco_tpu.data import ConcatenatedSampler, DataLoader, FixedSampler, dataloader
from gecco_tpu.types import Example


class ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return Example(np.full((4, 3), float(i), dtype=np.float32), None)


def test_concatenated_sampler_length_and_epochs():
    ds = ToyDataset(5)
    sampler = ConcatenatedSampler(ds, length=12, seed=0)
    idxs = list(sampler)
    assert len(idxs) == 12
    # first epoch is a permutation of range(5)
    assert sorted(idxs[:5]) == list(range(5))


def test_concatenated_sampler_deterministic():
    ds = ToyDataset(7)
    a = list(ConcatenatedSampler(ds, 20, seed=3))
    b = list(ConcatenatedSampler(ds, 20, seed=3))
    assert a == b


def test_fixed_sampler():
    ds = ToyDataset(10)
    s1 = FixedSampler(ds, length=6, seed=42)
    s2 = FixedSampler(ds, length=6, seed=42)
    assert list(s1) == list(s2)
    assert len(set(s1)) == 6


def test_loader_collation():
    ds = ToyDataset(8)
    loader = dataloader(ds, batch_size=4, num_steps=3)
    batches = list(loader)
    assert len(batches) == 3
    for batch in batches:
        assert isinstance(batch, Example)
        assert batch.points.shape == (4, 4, 3)


def test_loader_fixed_deterministic_batches():
    ds = ToyDataset(8)
    l1 = list(dataloader(ds, batch_size=4, fixed_sampler=True))
    l2 = list(dataloader(ds, batch_size=4, fixed_sampler=True))
    for b1, b2 in zip(l1, l2):
        np.testing.assert_array_equal(b1.points, b2.points)


def test_loader_error_propagation():
    class BadDataset(ToyDataset):
        def __getitem__(self, i):
            raise ValueError("boom")

    loader = dataloader(BadDataset(4), batch_size=2, num_steps=1)
    try:
        list(loader)
        raised = False
    except ValueError:
        raised = True
    assert raised
