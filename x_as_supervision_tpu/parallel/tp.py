"""GSPMD tensor parallelism over the mesh's reserved `model` axis.

The TPU-native recipe (jax-ml.github.io/scaling-book): pick a mesh,
annotate parameter shardings, and let XLA insert the collectives. This
module provides the annotation side — a channel-partition rule in the
Megatron style, adapted to CNNs:

  * 4-D conv kernels (kh, kw, Cin, Cout): shard Cout over `model`.
  * 2-D dense kernels (in, out): shard out over `model`.
  * 1-D per-channel vectors (BN scale/bias/mean/var, biases) of at least
    MIN_VECTOR channels: shard over `model`.

Every rule is guarded by divisibility — anything that does not divide by
the `model` axis size stays replicated, so the same rules apply to any
mesh shape. Because the partition is per-channel and BatchNorm reduces
over (B, H, W) only, BN statistics stay shard-local; the cross-channel
contractions (each conv's Cin against the previous layer's sharded Cout)
become XLA-inserted all-reduces, exactly like Megatron's paired
column/row-parallel matmuls but chosen by the compiler.

The rules are applied by PATH to any pytree, so the optimizer moments
(optax Adam mu/nu mirror the param tree) receive the same shardings as
the parameters they track — without that, GSPMD would reshard the full
state every step.

The reference has no tensor parallelism (SURVEY.md §2.8: DP only); this
is a capability extension of the mesh API that the reference's scale
never needed. Sequence/pipeline/expert parallelism remain n/a for this
workload — there is no sequence axis, the models are ~25M params, and
there are no experts (SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS, put_with_sharding

MIN_VECTOR = 64  # don't bother sharding tiny per-channel vectors


def _divisible(n: int, by: int) -> bool:
    return by > 0 and n % by == 0


def tp_spec(leaf, model_size: int) -> P:
    """Channel-partition PartitionSpec for one array (replicated if the
    channel dim does not divide the model axis)."""
    if model_size <= 1:
        return P()
    shape = getattr(leaf, "shape", ())
    if len(shape) == 4 and _divisible(shape[3], model_size):
        return P(None, None, None, MODEL_AXIS)  # conv (kh, kw, cin, cout)
    if len(shape) == 2 and _divisible(shape[1], model_size):
        return P(None, MODEL_AXIS)  # dense (in, out)
    if (
        len(shape) == 1
        and shape[0] >= MIN_VECTOR
        and _divisible(shape[0], model_size)
    ):
        return P(MODEL_AXIS)  # BN stats / biases
    return P()


def state_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for a TrainState (or any pytree) under the
    channel-TP rules. With model axis size 1 this is all-replicated."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, tp_spec(leaf, model_size)), tree
    )


def shard_state(tree, mesh: Mesh):
    """Place the state with channel-TP shardings (== replicate_state when
    the mesh has no model parallelism). Multi-process: with make_mesh's
    (data, model) device grid the model axis lies WITHIN each process
    (data crosses processes), so every process passes its full local
    value (mesh.put_with_sharding)."""
    return jax.tree.map(
        put_with_sharding, tree, state_shardings(tree, mesh)
    )
