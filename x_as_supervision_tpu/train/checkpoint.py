"""Orbax checkpointing with the reference's three restore modes:

  * resume   — full state (params, BN stats, both optimizers, step, epoch);
               reference: train.py:101-118.
  * finetune — model weights + BN stats only, epoch/optimizers reset
               ("do not load optimizer during finetune",
               reference: train.py:115-121); a checkpoint whose
               discriminator shape mismatches keeps the fresh
               discriminator ("Load new discriminator for ablation",
               reference: train.py:107-113).
  * detector — detector params + stats only, for eval
               (reference: eval.py:310-313 strips the 'regressor.' prefix).

Checkpoints are directories named {epoch:05d}_ckpt in the run dir, matching
the reference's {epoch:05d}_ckpt.pth.tar naming.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^(\d{5})_ckpt$")


def ckpt_path(save_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(save_dir), f"{epoch:05d}_ckpt")


def latest_checkpoint(save_dir: str) -> str | None:
    if not os.path.isdir(save_dir):
        return None
    found = []
    for name in os.listdir(save_dir):
        m = _CKPT_RE.match(name)
        if m:
            found.append((int(m.group(1)), name))
    if not found:
        return None
    found.sort()
    return os.path.join(os.path.abspath(save_dir), found[-1][1])


def save_checkpoint(save_dir: str, epoch: int, state) -> str:
    """Sharded save of the (possibly mesh-placed) state.

    The state's jax.Arrays are handed to orbax as-is: each process writes
    only its addressable shards, so TP-sharded parameters on a multi-host
    mesh save without ever being gathered (a `device_get` here would raise
    on non-fully-addressable arrays). Under `jax.process_count() > 1` this
    is a COLLECTIVE — every process must call it (the trainer does; the
    reference's rank-0-only torch.save at train.py:125-134 maps to orbax's
    primary-host directory commit)."""
    path = ckpt_path(save_dir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def _abstract_leaf(x):
    """Template leaf for a sharding-preserving restore: jax.Arrays become
    ShapeDtypeStructs carrying their sharding, so each process reads only
    the shards it addresses; host arrays restore concretely."""
    if isinstance(x, jax.Array):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    return x


def _restore_like(path: str, template):
    with ocp.StandardCheckpointer() as ckptr:
        # orbax requires absolute paths
        return ckptr.restore(
            os.path.abspath(path), jax.tree.map(_abstract_leaf, template)
        )


def restore_resume(path: str, state_template):
    """Full-state restore (train resume)."""
    return _restore_like(path, state_template)


def _restore_raw(path: str) -> dict:
    """Template-free restore: nested dict of arrays keyed by TrainState
    field names (survives shape mismatches in fields we do not graft)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))  # orbax needs absolute


def restore_finetune(path: str, state_template):
    """Weights + stats only; keep fresh optimizers / counters; tolerate a
    mismatched discriminator."""
    raw = _restore_raw(path)
    out = state_template.replace(
        det_params=raw["det_params"],
        det_stats=raw["det_stats"],
        phys_params=raw["phys_params"],
        phys_stats=raw["phys_stats"],
    )
    try:
        _assert_same_tree(raw["disc_params"], state_template.disc_params)
        out = out.replace(disc_params=raw["disc_params"])
    except (ValueError, KeyError):
        print("Load new discriminator for ablation")
    return out


def restore_detector(path: str):
    """(det_params, det_stats) for eval."""
    raw = _restore_raw(path)
    return raw["det_params"], raw["det_stats"]


def _assert_same_tree(a: Any, b: Any) -> None:
    sa = jax.tree.structure(a)
    sb = jax.tree.structure(b)
    if sa != sb:
        raise ValueError("tree mismatch")
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        if la.shape != lb.shape:
            raise ValueError("shape mismatch")
