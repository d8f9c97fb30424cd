"""Minimal batched data loader with background prefetch.

TPU-native replacement for the reference's torch DataLoader +
DistributedSampler stack (opv2v/opencood/tools/train_camera.py:52-83):
each host iterates its own shard of the index space (contiguous split by
host id), batches with the dataset's collate, and a thread pool prefetches
ahead so host CPU time overlaps device steps.  No process boundary:
dataset __getitem__ is plain numpy.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 collate: Optional[Callable] = None,
                 num_shards: int = 1, shard_index: int = 0,
                 prefetch: int = 2, num_threads: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.collate = collate or dataset.collate
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # contiguous shard per host
        per = n // self.num_shards
        lo = per * self.shard_index
        hi = per * (self.shard_index + 1) if \
            self.shard_index < self.num_shards - 1 else n
        return idx[lo:hi]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        idx = self._indices()
        batches = []
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)

        out_q: "queue.Queue" = queue.Queue(maxsize=max(self.prefetch, 1))
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that notices consumer abandonment (early break
            # from the iterator) instead of blocking forever
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for chunk in batches:
                    if stop.is_set():
                        return
                    samples = [self.dataset[int(j)] for j in chunk]
                    if not _put(self.collate(samples)):
                        return
            finally:
                _put(None)

        worker = threading.Thread(target=produce, daemon=True)
        worker.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
