"""Threaded prefetching device loader.

Replaces torch DataLoader(num_workers=8, DistributedSampler) (reference:
train.py:581-598): worker threads decode JPEG records on host CPU into a
bounded queue; the main thread assembles [num_accumulate, batch, C, H, W]
super-batches, pads/flips per config, and lands them pre-sharded on the data
mesh so the jitted train step never blocks on host work.

When the dataset yields uint8 HWC (MultiResolutionRecordDataset(...,
uint8_hwc=True) — the train-CLI default), batches stay uint8 as
[num_accumulate, batch, H, W, 3] and the jitted step normalizes on device:
4x less host->device traffic and no host-side float conversion.
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
        self.batch_size = batch_size  # GLOBAL batch per microbatch
        self.num_accumulate = num_accumulate
        self.mesh = mesh
        self.flip = flip
        self._rng = np.random.RandomState(seed)

        # per-process share: rank-strided disjoint indices (DistributedSampler
        # semantics, reference train.py:31-37,592) + per-host slice of the
        # global batch assembled below
        self.process_count = jax.process_count()
        self.process_index = jax.process_index()
        if batch_size % self.process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by process_count {self.process_count}"
            )
        self.local_batch = batch_size // self.process_count

        self._idx_lock = threading.Lock()
        self._indices = dataset.iter_indices(
            shuffle=shuffle, seed=seed,
            process_index=self.process_index, process_count=self.process_count,
        )
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
        n = self.local_batch * self.num_accumulate
        items = [self._item_q.get() for _ in range(n)]
        batch = np.stack(items)
        # layout comes from the dataset's declared mode, not dtype sniffing —
        # a uint8-CHW or float-HWC dataset must fail loudly, not flip the
        # wrong axis (datasets without the attribute are float-CHW)
        uint8_hwc = bool(getattr(self.dataset, "uint8_hwc", False))
        if uint8_hwc:
            if batch.dtype != np.uint8 or batch.shape[-1] != 3:
                raise ValueError(
                    f"dataset declares uint8_hwc but yielded {batch.dtype} {batch.shape[1:]}"
                )
        else:
            if batch.shape[1] != 3:
                raise ValueError(
                    f"dataset yields CHW float but batch item shape is {batch.shape[1:]}"
                )
            batch = batch.astype(np.float32)
        if self.flip:
            flips = self._rng.rand(n) < 0.5
            # width is axis 2 in [N, H, W, 3] uint8, axis 3 in [N, 3, H, W] f32
            w_axis = 2 if uint8_hwc else 3
            flipped = np.flip(batch[flips], axis=w_axis)
            batch[flips] = flipped
        batch = batch.reshape(self.num_accumulate, self.local_batch, *batch.shape[1:])
        if self.mesh is not None:
            if self.process_count > 1:
                # multi-host: each process holds only its batch slice; build
                # the global [accum, global_batch, ...] array from local data
                from ..parallel import train_batch_sharding

                return jax.make_array_from_process_local_data(
                    train_batch_sharding(self.mesh),
                    batch,
                    (self.num_accumulate, self.batch_size, *batch.shape[2:]),
                )
            from ..parallel import shard_batch

            # [num_accumulate, batch, ...]: split the *batch* axis over the
            # data mesh (dim-0 is the sequential lax.scan accumulation axis)
            return shard_batch(batch, self.mesh, batch_dim=1)
        return jax.numpy.asarray(batch)

    def close(self):
        """Stop and JOIN the worker threads. Setting the event alone is not
        enough: daemon threads still blocked in queue.put (or mid decode)
        get killed at arbitrary native-code points during interpreter
        finalization, which segfaults (observed as SIGSEGV at train-CLI
        exit with empty stderr)."""
        self._stop.set()
        try:  # unblock workers stuck in put()
            while True:
                self._item_q.get_nowait()
        except queue.Empty:
            pass
        for w in self._workers:
            w.join(timeout=5.0)
