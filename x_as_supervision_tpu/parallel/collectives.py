"""First-class collective helpers over the framework mesh.

The shipped models need only data parallelism, where GSPMD inserts every
collective implicitly (SURVEY.md §2.8/§5.8). These helpers exist for code
that drops to explicit SPMD — custom shard_map regions, metric reductions,
future tensor-parallel layers — so call sites never hand-roll axis names.

Production consumers: `cross_host_mean` reduces multi-host eval metrics
(train/evaluator.py); the explicit-SPMD helpers (psum/pmean/all_gather/
ppermute/shard_map) are exercised against the live mesh by the scaling
probe (tools/scaling_projection.py), which also sizes the DP collective
traffic of the compiled train step via `hlo_collective_bytes`.

All named-axis functions are usable inside `shard_map`/`pmap`-style
contexts; `cross_host_mean` reduces host-side metrics across processes
(the reference's eval tables are per-rank, SURVEY §7.5 — this is the
documented opt-in deviation).
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


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def hlo_collective_bytes(hlo_text: str) -> dict[str, int]:
    """Per-op-kind output bytes of every collective in a compiled program.

    Sizes the cross-device traffic the compiler actually emitted (result
    shapes of all-reduce / all-gather / reduce-scatter / collective-permute
    / all-to-all instructions), so scaling projections rest on the real
    program, not on hand-counted parameter trees. Fusion-internal `*-start`
    /`*-done` pairs are counted once (the `-start` carries the shape).
    """
    import re

    shape_re = re.compile(r"\b(\w+)\[([0-9,]*)\]")
    totals: dict[str, int] = {}
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(.*?)\s+(" + "|".join(_COLLECTIVE_OPS)
                      + r")(-start)?\(", line)
        if not m:
            continue
        result, op = m.group(1), m.group(2)
        nbytes = 0
        for dtype, dims in shape_re.findall(result):
            if dtype not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dtype]
        totals[op] = totals.get(op, 0) + nbytes
    return totals


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
