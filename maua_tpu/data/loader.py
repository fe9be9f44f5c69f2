"""Threaded prefetching device loader.

Replaces torch DataLoader(num_workers=8, DistributedSampler) (reference:
train.py:581-598): worker threads decode JPEG records on host CPU into a
bounded queue; the main thread assembles [num_accumulate, batch, C, H, W]
super-batches, pads/flips per config, and lands them pre-sharded on the data
mesh so the jitted train step never blocks on host work.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        num_accumulate: int = 1,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        mesh=None,
        flip: bool = True,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_accumulate = num_accumulate
        self.mesh = mesh
        self.flip = flip
        self._rng = np.random.RandomState(seed)

        self._idx_lock = threading.Lock()
        self._indices = dataset.iter_indices(shuffle=shuffle, seed=seed)
        self._item_q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=prefetch * batch_size * num_accumulate)
        self._stop = threading.Event()
        self._workers = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(max(1, num_workers))
        ]
        for w in self._workers:
            w.start()

    def _worker(self):
        while not self._stop.is_set():
            with self._idx_lock:
                idx = next(self._indices)
            try:
                item = self.dataset[int(idx)]
            except Exception:
                continue
            while not self._stop.is_set():
                try:
                    self._item_q.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        n = self.batch_size * self.num_accumulate
        items = [self._item_q.get() for _ in range(n)]
        batch = np.stack(items).astype(np.float32)
        if self.flip:
            flips = self._rng.rand(n) < 0.5
            batch[flips] = batch[flips][:, :, :, ::-1]
        batch = batch.reshape(self.num_accumulate, self.batch_size, *batch.shape[1:])
        if self.mesh is not None:
            from ..parallel import shard_batch

            return shard_batch(batch, self.mesh)
        return jax.numpy.asarray(batch)

    def close(self):
        self._stop.set()
