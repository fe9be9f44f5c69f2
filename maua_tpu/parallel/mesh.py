"""Device-mesh and sharding utilities.

The framework's parallelism model (SURVEY.md §2.7): the reference implements
exactly two strategies — data-parallel training (DDP over NCCL,
reference: train.py:555-579) and data-parallel inference
(torch.nn.DataParallel over frame batches, reference:
generate_audiovisual.py:54-55). Here both collapse into one concept: a 1-D
`data` mesh; train batches and render frame-batches are sharded over it and
XLA inserts psum/all-gather collectives over ICI.

All helpers are safe on a single device (mesh of size 1) so the same code
path runs on 1 TPU chip, a v4-8 slice, or the CPU test mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over all (or given) devices.

    Replaces torch.distributed.init_process_group("nccl", init_method="env://")
    + WORLD_SIZE plumbing (reference: train.py:432-447, distributed.py:17-29).
    """
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim-0 (batch / frame axis) across the mesh — the analogue of
    DistributedSampler data sharding (reference: train.py:31-37,592)."""
    return NamedSharding(mesh, P(axis))


def train_batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the *batch* axis of a [num_accumulate, batch, ...] train
    super-batch: P(None, "data"). The accumulation axis is a sequential
    lax.scan, never a parallel axis — sharding dim-0 would degrade to full
    replication (each device would redo the whole step)."""
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (model params under pure DP)."""
    return NamedSharding(mesh, P())


def local_device_count() -> int:
    return jax.local_device_count()


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Rank-0 gating for logging/checkpointing (reference: distributed.py:7-14,
    get_rank()==0 checks through train.py)."""
    return jax.process_index() == 0


def pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 0) -> tuple[jnp.ndarray, int]:
    """Pad dim `axis` up to a multiple of the mesh size so batches always
    shard evenly; returns (padded, original_length). The final render batch
    is padded rather than shrunk to keep jit cache keys fixed (SURVEY.md §7
    "many-shape compilation" risk)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths), n


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS, batch_dim: int = 0) -> Any:
    """Place a host pytree onto the mesh with `batch_dim` sharded over the data
    axis. Train super-batches are [num_accumulate, batch, ...] — pass
    batch_dim=1 so the *batch* axis is split (the accumulation axis is a
    sequential lax.scan, not a parallel axis). Arrays whose batch_dim is
    missing or not divisible by the mesh size are replicated instead (e.g.
    scalars, shared conditioning)."""
    n_dev = mesh.devices.size
    spec = P(*([None] * batch_dim), axis)
    sharded = NamedSharding(mesh, spec)
    repl = NamedSharding(mesh, P())

    def place(x):
        x = jnp.asarray(x)
        if x.ndim > batch_dim and x.shape[batch_dim] % n_dev == 0 and x.shape[batch_dim] > 0:
            return jax.device_put(x, sharded)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, batch)


def all_reduce_mean_tree(tree: Any, axis: str = DATA_AXIS) -> Any:
    """Cross-device mean of a pytree of per-device scalars — the analogue of
    reduce_loss_dict (reference: distributed.py:102-124). Must be called
    inside shard_map/pjit with the named axis in scope."""
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), tree)


_distributed_initialized = False


def maybe_initialize_distributed(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> bool:
    """Multi-host bring-up: jax.distributed.initialize with env auto-detection
    — the replacement for torch.distributed.launch + init_process_group
    (reference: train.py:432-447). Safe no-op when no coordinator is given;
    idempotent; returns whether a multi-process runtime is active.

    MUST be called before any computation touches a backend (same contract as
    jax.distributed.initialize itself) — train.cli calls it first thing.
    """
    global _distributed_initialized
    import os

    coord = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coord and not _distributed_initialized:
        # XLA:CPU's Gloo collectives (jaxlib 0.9) tear down a timed-out
        # collective while its async TCP completion is still in flight and
        # SIGSEGV. On oversubscribed hosts rank skew (compile + time-slicing)
        # easily exceeds the ~30 s default, so raise the op timeout well past
        # any realistic skew BEFORE the backend parses XLA_FLAGS. Root-caused
        # on a 1-core host: the full train step crashed 3/3 at default and ran
        # 3/3 green with the raised timeout; micro-programs never crashed
        # (skew below threshold). Harmless on TPU (flag is CPU-only).
        if "--xla_cpu_collective_timeout_seconds" not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " --xla_cpu_collective_timeout_seconds=1200"
            )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=num_processes if num_processes is not None else int(os.environ.get("NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None else int(os.environ.get("PROCESS_ID", "0")),
        )
        _distributed_initialized = True
    return jax.process_count() > 1
