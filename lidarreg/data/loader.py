"""Data-loader conveniences: infinite sampler + phase loaders.

Parity: Experiments/dataloader/inf_sampler.py:11-38 (InfSampler — infinite
shuffled index stream for epoch-less training loops),
Experiments/dataloader/data_loaders.py:28-128 (make_data_loader name LUT +
DistributedSampler sharding — here the shard is an explicit (rank, world)
stride, the same mechanism the eval harness uses).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np

from .adapters import make_dataset


class InfSampler:
    """Infinite (re)shuffled index iterator (inf_sampler.py:11-38)."""

    def __init__(self, n: int, shuffle: bool = True, seed: int = 0,
                 rank: int = 0, world_size: int = 1):
        self.n = n
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.rank = rank
        self.world_size = world_size
        self._queue: list[int] = []

    def __iter__(self) -> Iterator[int]:
        return self

    def __next__(self) -> int:
        if not self._queue:
            order = (self.rng.permutation(self.n) if self.shuffle
                     else np.arange(self.n))
            self._queue = list(order[self.rank::self.world_size])
        return int(self._queue.pop(0))


def make_data_loader(
    dataset_name: str,
    phase: str = "train",
    batch_size: int = 1,
    rank: int = 0,
    world_size: int = 1,
    seed: int = 0,
    shuffle: bool | None = None,
    synthetic: bool = True,
):
    """(dataset, batch-index iterator) — make_data_loader equivalent.

    Sharding parity: DistributedSampler(shuffle=False) at eval
    (data_loaders.py:65-128) == the (rank, world) stride here.
    """
    ds = make_dataset(dataset_name, phase=phase, synthetic=synthetic)
    if shuffle is None:
        shuffle = phase == "train"
    sampler = InfSampler(len(ds), shuffle, seed, rank, world_size)

    def batches():
        while True:
            yield [next(sampler) for _ in range(batch_size)]

    return ds, batches()
