"""Grain-backed production input pipeline.

The thread-prefetch `cobevt_tpu.data.loader.DataLoader` is sufficient for
single-host runs; this adapter plugs the same datasets into Google Grain
for production loading: deterministic global shuffling, per-host
sharding, *multiprocess* workers (the reference leaned on torch
DataLoader's 8 worker processes for its known input-bound training,
SURVEY.md §3.1), and checkpointable iterators.

Any dataset with `__len__`/`__getitem__` returning a dict of numpy
arrays works (OPV2VCameraDataset, OPV2VLidarDataset,
NuScenesGeneratedDataset, ConcatDataset...).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def make_grain_loader(dataset, batch_size: int, *, shuffle: bool = True,
                      seed: int = 0, num_epochs: Optional[int] = None,
                      num_workers: int = 0,
                      shard_index: int = 0, num_shards: int = 1,
                      drop_remainder: bool = True):
    """Returns an iterable of collated numpy batches backed by grain.

    num_workers > 0 enables multiprocess prefetching (each worker runs
    dataset.__getitem__ in its own process).
    """
    import grain

    ds = grain.MapDataset.source(_SourceAdapter(dataset))
    if num_shards > 1:
        ds = ds[shard_index::num_shards]
    if shuffle:
        ds = ds.seed(seed).shuffle()
    if num_epochs is not None:
        ds = ds.repeat(num_epochs)
    ds = ds.batch(batch_size, drop_remainder=drop_remainder,
                  batch_fn=_collate)
    it = ds.to_iter_dataset()
    if num_workers > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=num_workers))
    return it


def _collate(samples):
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class _SourceAdapter:
    """grain RandomAccessDataSource over our dataset protocol."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[int(idx)]
