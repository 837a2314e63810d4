"""First-class collective helpers over the framework mesh.

The shipped models need only data parallelism, where GSPMD inserts every
collective implicitly (SURVEY.md §2.8/§5.8). These helpers exist for code
that drops to explicit SPMD — custom shard_map regions, metric reductions,
future tensor-parallel layers — so call sites never hand-roll axis names.

All functions are usable inside `shard_map`/`pmap`-style named-axis
contexts; the module also provides `cross_host_mean` for host-side metric
reduction (the reference's eval tables are per-rank, SURVEY §7.5 — this is
the documented opt-in deviation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def psum_data(x):
    """Sum over the data axis (gradient all-reduce in explicit SPMD)."""
    return jax.lax.psum(x, DATA_AXIS)


def pmean_data(x):
    """Mean over the data axis (SyncBN statistics in explicit SPMD)."""
    return jax.lax.pmean(x, DATA_AXIS)


def all_gather_data(x, axis: int = 0, tiled: bool = True):
    return jax.lax.all_gather(x, DATA_AXIS, axis=axis, tiled=tiled)


def ppermute_ring(x, shift: int = 1):
    """Ring shift along the data axis (building block for hand-rolled
    pipelined collectives)."""
    n = jax.lax.axis_size(DATA_AXIS)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, DATA_AXIS, perm)


def psum_model(x):
    """Sum over the (reserved) model axis — tensor-parallel reductions."""
    return jax.lax.psum(x, MODEL_AXIS)


def data_parallel_shard_map(fn, mesh, in_specs=None, out_specs=None):
    """shard_map over the data axis with replicated-by-default specs, for
    step functions that need explicit collectives instead of GSPMD."""
    from jax import shard_map

    return shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs if in_specs is not None else P(DATA_AXIS),
        out_specs=out_specs if out_specs is not None else P(DATA_AXIS),
    )


def cross_host_mean(tree, mesh=None):
    """Mean a pytree of host-local scalars across processes (multi-host
    eval-metric reduction; the reference leaves tables per-rank,
    SURVEY §7.5 — this is the documented opt-in deviation)."""
    del mesh
    if jax.process_count() == 1:
        return tree

    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree.flatten(tree)
    vec = jnp.asarray(leaves, jnp.float32)
    gathered = multihost_utils.process_allgather(vec)  # (procs, n)
    return jax.tree.unflatten(
        treedef, [float(x) for x in gathered.mean(axis=0)]
    )
