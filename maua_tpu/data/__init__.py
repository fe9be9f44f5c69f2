"""Dataset + input pipeline.

Replaces the reference's LMDB MultiResolutionDataset + torch DataLoader
(reference: dataset.py, prepare_data.py) with a TPU-native input pipeline:
a simple sharded record format (JPEG bytes + offset index per shard file),
a threaded prefetching loader that decodes/augments on host CPU and lands
batches directly on the device mesh, and a prepare_data converter.
"""

from .records import RecordShardWriter, RecordShardReader, MultiResolutionRecordDataset
from .prepare import prepare_data
from .loader import DataLoader

__all__ = [
    "RecordShardWriter",
    "RecordShardReader",
    "MultiResolutionRecordDataset",
    "prepare_data",
    "DataLoader",
]
