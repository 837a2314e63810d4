"""Pytree inspection utilities (param counts, byte sizes, dtype census)."""

from __future__ import annotations

import jax
import numpy as np


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def byte_size(tree) -> int:
    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(tree)
    )


def dtype_census(tree) -> dict:
    out: dict = {}
    for leaf in jax.tree.leaves(tree):
        key = str(leaf.dtype)
        out[key] = out.get(key, 0) + int(np.prod(leaf.shape))
    return out


def summarize(name: str, tree) -> str:
    return (
        f"{name}: {param_count(tree) / 1e6:.2f}M params, "
        f"{byte_size(tree) / 1e6:.1f} MB, dtypes {dtype_census(tree)}"
    )
