"""Epoch-level image ordering and division-aware local shuffling.

Capability parity (behavior, not code):
  - DataLoader(shuffle=True) epoch ordering (train.py:110): every epoch visits
    each training image exactly once in a fresh random order.
  - LocalShuffleSampler (/root/reference/nerf/local_shuffler.py:19-94): under
    model averaging, each replica only ever samples from its own division of
    the dataset; per-epoch seeded shuffles; truncation to the smallest
    division unless imbalance is allowed.

Host-side and numpy-only: these produce small int32 index arrays that are
staged to device once per epoch (or pre-generated for a whole run) — the
per-pixel sampling happens on device inside the jitted step.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np


def epoch_image_order(n_images: int, epoch: int, seed: int = 0) -> np.ndarray:
    """Deterministic per-epoch permutation of image indices."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    return rng.permutation(n_images).astype(np.int32)


class LocalShuffleSampler:
    """Per-replica division sampler for model-averaged training.

    ``indices`` is either the per-image division id list (len == dataset size)
    or an int number of replicas (equal contiguous split, matching
    local_shuffler.py:40-48).  Iterating yields this replica's image indices
    for the current epoch, shuffled with seed+epoch and truncated to the
    smallest division unless ``allow_imbalance``.
    """

    def __init__(self, n_images: int, indices: Union[Sequence[int], int],
                 rank: int, shuffle: bool = True, seed: int = 0,
                 allow_imbalance: bool = False):
        if isinstance(indices, (int, np.integer)):
            num_replicas = int(indices)
            division_len = n_images // num_replicas
            div = np.zeros(n_images, np.int32)
            for i in range(num_replicas - 1):
                div[i * division_len:(i + 1) * division_len] = i
            div[(num_replicas - 1) * division_len:] = num_replicas - 1
            indices = div
        else:
            indices = np.asarray(indices, np.int32)
            num_replicas = int(indices.max()) + 1
        if not (0 <= rank < num_replicas):
            raise ValueError(f"invalid rank {rank} for {num_replicas} replicas")

        self.num_replicas = num_replicas
        self.rank = rank
        self.samples: List[np.ndarray] = [
            np.nonzero(indices == i)[0].astype(np.int32) for i in range(num_replicas)
        ]
        self.min_sample: Optional[int] = (
            None if allow_imbalance else min(len(s) for s in self.samples)
        )
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        own = len(self.samples[self.rank])
        return own if self.min_sample is None else self.min_sample

    def __iter__(self):
        idx = self.samples[self.rank].copy()
        if self.shuffle:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch]))
            rng.shuffle(idx)
        if self.min_sample is not None:
            # truncate regardless of shuffle so __len__ == iteration length
            idx = idx[: self.min_sample]
        return iter(idx.tolist())

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """Vectorized form: this replica's (possibly truncated) epoch order."""
        self.set_epoch(epoch)
        return np.fromiter(iter(self), dtype=np.int32)

    @staticmethod
    def stacked_epoch_indices(samplers: Sequence["LocalShuffleSampler"],
                              epoch: int) -> np.ndarray:
        """(n_replicas, steps) int32 — one row per replica, ready to shard
        over the 'replica' mesh axis."""
        rows = [s.epoch_indices(epoch) for s in samplers]
        steps = min(len(r) for r in rows)
        return np.stack([r[:steps] for r in rows]).astype(np.int32)
