"""Sharded record files: the storage layer behind the dataset.

Format (per shard file `<name>-<res>-<shard>.mrec`):
  header:  magic b"MREC" | uint32 version | uint64 n_records
  index:   n_records × (uint64 offset, uint64 length)   [absolute offsets]
  payload: concatenated JPEG blobs

Equivalent of the reference's LMDB env with keys f"{res}-{idx:05}" holding
JPEG bytes and a "length" key (reference: dataset.py:10-42, prepare_data.py:
54-88), but append-only flat files: trivially shardable across data-parallel
hosts, mmap-friendly, no LMDB dependency.
"""

from __future__ import annotations

import glob
import os
import struct
from typing import Iterator, Optional

import numpy as np

_MAGIC = b"MREC"
_VERSION = 1
_HEADER = struct.Struct("<4sIQ")
_ENTRY = struct.Struct("<QQ")


class RecordShardWriter:
    def __init__(self, path: str):
        self.path = path
        self._blobs: list[bytes] = []

    def append(self, blob: bytes) -> None:
        self._blobs.append(bytes(blob))

    def close(self) -> None:
        n = len(self._blobs)
        index_size = _HEADER.size + n * _ENTRY.size
        offsets = []
        pos = index_size
        for b in self._blobs:
            offsets.append((pos, len(b)))
            pos += len(b)
        with open(self.path, "wb") as f:
            f.write(_HEADER.pack(_MAGIC, _VERSION, n))
            for off, ln in offsets:
                f.write(_ENTRY.pack(off, ln))
            for b in self._blobs:
                f.write(b)
        self._blobs = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordShardReader:
    """mmap-backed random access to one shard."""

    def __init__(self, path: str):
        self.path = path
        self._data = np.memmap(path, dtype=np.uint8, mode="r")
        magic, version, n = _HEADER.unpack(self._data[: _HEADER.size].tobytes())
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a MREC file")
        if version != _VERSION:
            raise ValueError(f"{path}: unsupported version {version}")
        self.n_records = n
        idx_bytes = self._data[_HEADER.size : _HEADER.size + n * _ENTRY.size].tobytes()
        self._index = np.frombuffer(idx_bytes, dtype=np.uint64).reshape(n, 2)

    def __len__(self) -> int:
        return self.n_records

    def get(self, i: int) -> bytes:
        off, ln = self._index[i]
        return self._data[int(off) : int(off + ln)].tobytes()


class MultiResolutionRecordDataset:
    """All shards of one resolution under a directory
    (LMDB MultiResolutionDataset equivalent, reference: dataset.py:10-42).
    Decodes JPEG via OpenCV, normalizes to [-1,1] NCHW float32; corrupt
    records retry with a random index like the reference (dataset.py:27-39)."""

    def __init__(self, root: str, resolution: int = 256, seed: int = 0,
                 uint8_hwc: bool = False):
        pattern = os.path.join(root, f"*-{resolution}-*.mrec")
        paths = sorted(glob.glob(pattern))
        if not paths:
            raise FileNotFoundError(f"no shards matching {pattern}")
        self.readers = [RecordShardReader(p) for p in paths]
        self.sizes = np.array([len(r) for r in self.readers])
        self.cum = np.concatenate([[0], np.cumsum(self.sizes)])
        self.resolution = resolution
        self.uint8_hwc = uint8_hwc
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return int(self.cum[-1])

    def _raw(self, index: int) -> bytes:
        shard = int(np.searchsorted(self.cum, index, side="right") - 1)
        return self.readers[shard].get(index - int(self.cum[shard]))

    def __getitem__(self, index: int) -> np.ndarray:
        import cv2

        for _ in range(10):  # corrupt-image retry (dataset.py:27-39)
            try:
                buf = np.frombuffer(self._raw(index), dtype=np.uint8)
                img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
                if img is None:
                    raise ValueError("decode failed")
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                if self.uint8_hwc:
                    # uint8 input pipeline: ship [H, W, 3] uint8 to the
                    # accelerator and normalize on device (train/step.py) —
                    # 4x less host->device traffic than fp32 CHW.
                    return img
                from ..native import hwc_u8_to_chw_f32

                return hwc_u8_to_chw_f32(img[None])[0]
            except Exception:
                index = int(self._rng.randint(len(self)))
        raise RuntimeError("too many corrupt records")

    def iter_indices(
        self,
        shuffle: bool = True,
        seed: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ) -> Iterator[int]:
        """Endless epoch iterator. In a multi-host run, each process yields a
        disjoint strided slice of every (identically-shuffled) epoch — the
        DistributedSampler semantics (reference: train.py:31-37,592): same
        seed on all hosts, rank-strided subset, so the global batch is the
        union of per-host batches with no overlap."""
        if process_index is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        process_count = max(int(process_count or 1), 1)
        process_index = int(process_index) % process_count
        while True:
            order = np.arange(len(self))
            if shuffle:
                np.random.RandomState(seed).shuffle(order)
                seed += 1
            yield from order[process_index::process_count]
