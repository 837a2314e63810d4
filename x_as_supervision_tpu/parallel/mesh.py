"""Device mesh construction + sharding helpers.

The reference's distributed story is torchrun + DDP + NCCL with
SyncBatchNorm (reference: train.py:43-45,87-88, SURVEY.md §2.8). The
TPU-native equivalent: one process per host, a global
``Mesh`` whose leading ``data`` axis spans every chip (ICI within a slice,
DCN across slices), the train step jitted with the batch sharded over
``data`` and parameters replicated. Gradient all-reduce and cross-replica
BatchNorm statistics fall out of GSPMD: any reduction over the sharded batch
axis becomes a global collective, so no hand-written comm layer exists.

A ``model`` axis is reserved in the API so tensor parallelism can be added
without changing call sites (unused by the shipped models, which are small
CNNs; see SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Iterable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Iterable | None = None, model_parallelism: int = 1
) -> Mesh:
    """Global (data, model) mesh over all visible devices (default: pure DP)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if devs.size % model_parallelism:
        raise ValueError(
            f"{devs.size} devices not divisible by model={model_parallelism}"
        )
    grid = devs.reshape(devs.size // model_parallelism, model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_with_sharding(x, sh: NamedSharding):
    """Place one array under `sh`. Single-process: plain device_put.
    Multi-process: `jax.device_put` cannot address remote devices, so the
    global array is assembled from this process's local data
    (jax.make_array_from_process_local_data) — for shardings whose
    process-crossing axes carry the batch, the local data IS this host's
    input-pipeline slice (process_local_batch_slice), and replicated /
    process-locally-sharded leaves pass their full value."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every array in the batch dict with its batch axis sharded
    over `data` (the DistributedSampler equivalent: each chip sees its
    shard; reference: train.py:278)."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: put_with_sharding(x, sh), batch)


def replicate_state(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: put_with_sharding(x, rep), tree)


def initialize_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (jax.distributed). No-op on a single host.

    Mirrors the torchrun rendezvous role (reference: train.py:43-45) but via
    JAX's coordination service; call before any other JAX API in multi-host
    deployments. On TPU pods pass ``coordinator='auto'`` (everything —
    coordinator, identity, peers — comes from the TPU metadata); on CPU/GPU
    clusters pass an explicit address plus `num_processes` and `process_id`
    (like torchrun's RANK/WORLD_SIZE).
    """
    if coordinator == "auto":
        jax.distributed.initialize()
    elif coordinator:
        kwargs = {}
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(coordinator_address=coordinator, **kwargs)


def process_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(local batch size, offset) for this process — the input pipeline
    shards per host like DistributedSampler (reference: train.py:274-278)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n}")
    local = global_batch // n
    return local, jax.process_index() * local
