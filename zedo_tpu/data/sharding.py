"""Eval-batch sharding utilities.

TPU-native replacement for `DistributedEvalSampler` (lib/dataset/
EvaSampler.py:7-126): the reference splits a dataset into pad-free contiguous
per-rank chunks so no sample is evaluated twice. Under GSPMD the equivalent
is pad-and-mask: pad N to a multiple of the mesh's data-axis size, shard
evenly, and mask the padded tail out of every reduction — plus
`contiguous_chunks` for API parity with the original semantics.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def contiguous_chunks(n: int, num_shards: int) -> list[np.ndarray]:
    """Pad-free contiguous index chunks, sizes differing by at most 1
    (EvaSampler.py semantics: rank r gets indices [start_r, end_r))."""
    base = n // num_shards
    rem = n % num_shards
    chunks = []
    start = 0
    for r in range(num_shards):
        size = base + (1 if r < rem else 0)
        chunks.append(np.arange(start, start + size))
        start += size
    return chunks


def pad_batch(arrays: dict | list | tuple, multiple: int, axis: int = 0):
    """Pad leading axis of every array to a multiple of `multiple` by edge
    replication; returns (padded, mask) where mask [padded_n] is 1 for real
    rows. Edge replication (not zeros) keeps padded rows numerically benign
    inside solvers (no singular K, no 0/0 rays)."""

    def pad_one(a):
        a = np.asarray(a)
        n = a.shape[axis]
        if n == 0:
            raise ValueError(
                "pad_batch got an empty batch (0 rows) — nothing to "
                "edge-replicate; filter produced no samples?")
        target = ((n + multiple - 1) // multiple) * multiple
        if target == n:
            return a
        pad_rows = np.repeat(np.take(a, [-1], axis=axis), target - n, axis=axis)
        return np.concatenate([a, pad_rows], axis=axis)

    values = list(arrays.values()) if isinstance(arrays, dict) else list(arrays)
    if all(v is None for v in values):
        raise ValueError("pad_batch got only None arrays")
    if isinstance(arrays, dict):
        padded = {k: pad_one(v) if v is not None else None for k, v in arrays.items()}
    else:
        padded = type(arrays)(pad_one(v) if v is not None else None for v in arrays)
    n = next(np.asarray(v).shape[axis] for v in values if v is not None)

    target = ((n + multiple - 1) // multiple) * multiple
    mask = np.zeros((target,), dtype=np.float32)
    mask[:n] = 1.0
    return padded, mask


def unpad(array: np.ndarray, mask: np.ndarray, axis: int = 0) -> np.ndarray:
    """Strip the padded tail given the mask from `pad_batch`."""
    n = int(mask.sum())
    return np.take(array, np.arange(n), axis=axis)


class DistributedEvalSampler:
    """API-parity facade for the reference's pad-free eval sampler
    (lib/dataset/EvaSampler.py:7-126): contiguous per-rank index chunks, no
    duplicated samples, optional (pointless-for-eval but supported) shuffle.
    Under GSPMD you usually want `pad_batch` instead; this exists for users
    porting DataLoader-style eval loops."""

    def __init__(self, dataset, num_replicas: int = 1, rank: int = 0,
                 shuffle: bool = False, seed: int = 0):
        if rank >= num_replicas or rank < 0:
            raise ValueError(
                f"Invalid rank {rank}, rank should be in [0, {num_replicas - 1}]"
            )
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self._chunks = contiguous_chunks(len(dataset), num_replicas)

    def __iter__(self):
        indices = self._chunks[self.rank]
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            indices = rng.permutation(indices)
        return iter(indices.tolist())

    def __len__(self):
        return len(self._chunks[self.rank])

    def set_epoch(self, epoch: int):
        self.epoch = epoch
