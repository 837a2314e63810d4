"""Tensor parallelism over the `model` mesh axis (parallel/tp.py):
channel-TP sharded training steps must equal pure-DP steps numerically —
GSPMD inserts the collectives, the math is unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_as_supervision_tpu.parallel import mesh as M
from x_as_supervision_tpu.parallel.tp import shard_state, state_shardings, tp_spec
from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
from x_as_supervision_tpu.train.factory import build_gan_spec
from x_as_supervision_tpu.train.state import (
    init_train_state,
    make_optimizers,
    make_train_step,
)

from test_train_step import TINY_CONFIG


def _setup(mesh):
    cfg = {k: v for k, v in TINY_CONFIG.items()}
    cams = cfg["model_params"]["cam_id_list"]
    spec = build_gan_spec(cfg)
    ds = SyntheticPoseDataset(num_samples=8, cam_id_list=cams, patch_size=64)
    batch = ds.device_batch(0, 8)
    opt_det, opt_disc = make_optimizers(cfg["train_params"], 10)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
    )
    step = make_train_step(spec, opt_det, opt_disc)
    batch = M.shard_batch(batch, mesh)
    return state, batch, step


def _run_steps(state, batch, step, n=2):
    rng = jax.random.PRNGKey(7)
    metrics = None
    for i in range(n):
        state, metrics, _ = step(
            state, batch, jax.random.fold_in(rng, i), with_outputs=False
        )
    checksum = sum(
        float(jnp.asarray(x, jnp.float32).sum())
        for x in jax.tree.leaves(state.det_params)
    )
    return float(metrics["loss_total"]), checksum


def test_tp_spec_rules():
    class A:
        def __init__(self, shape):
            self.shape = shape

    assert tp_spec(A((3, 3, 8, 64)), 2) == jax.sharding.PartitionSpec(
        None, None, None, "model"
    )
    assert tp_spec(A((3, 3, 8, 63)), 2) == jax.sharding.PartitionSpec()
    assert tp_spec(A((128, 128)), 4) == jax.sharding.PartitionSpec(
        None, "model"
    )
    assert tp_spec(A((128,)), 2) == jax.sharding.PartitionSpec("model")
    assert tp_spec(A((8,)), 2) == jax.sharding.PartitionSpec()  # tiny
    assert tp_spec(A((3, 3, 8, 64)), 1) == jax.sharding.PartitionSpec()


@pytest.mark.slow  # ~4 min: two full fused-step compiles on the CPU mesh.
# The DP+TP combination is also exercised (1 step, same mesh shape) by
# __graft_entry__.dryrun_multichip, which the driver runs every round.
@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-virtual-device CPU mesh"
)
def test_tp_matches_dp():
    mesh_dp = M.make_mesh()
    state, batch_dp, step = _setup(mesh_dp)
    loss_dp, sum_dp = _run_steps(
        M.replicate_state(state, mesh_dp), batch_dp, step
    )

    mesh_tp = M.make_mesh(model_parallelism=2)
    state2, batch_tp, step2 = _setup(mesh_tp)
    state_tp = shard_state(state2, mesh_tp)

    # at least one parameter must actually be model-sharded
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, state_shardings(state2, mesh_tp))
    )
    assert any("model" in str(s) for s in specs)

    loss_tp, sum_tp = _run_steps(state_tp, batch_tp, step2)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-4)
    np.testing.assert_allclose(sum_tp, sum_dp, rtol=2e-4)
