"""Worker for the multi-process jax.distributed CPU tests.

Usage: python _dist_worker.py <coordinator> <num_procs> <proc_id> <out_json>
           [scope]

scope 'full' (default) runs everything; scope 'step' runs only the mesh
bring-up + loader sharding + the fused DP x TP train step (used by the
4-process test, where the full battery would be needlessly slow);
scopes 'ckpt_save' / 'ckpt_restore' (extra argv[6] = shared ckpt dir)
exercise the collective sharded checkpoint on the (data=2, model=2) mesh:
save at an epoch boundary mid-trajectory, then a FRESH 2-process run
restores and must match the uninterrupted trajectory bitwise.

Exercises, under a REAL 2-process jax.distributed runtime (not the
8-virtual-device single-process mesh):
  * parallel.mesh.initialize_multihost with explicit process identity
  * BatchLoader per-shard batch slicing (DistributedSampler semantics)
  * parallel.collectives.cross_host_mean
  * the process-sharded Evaluator (each process walks its own batches)
"""

import json
import sys

import numpy as np


def main():
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    scope = sys.argv[5] if len(sys.argv) > 5 else "full"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # two local CPU devices per process -> a 4-device global mesh, so the
    # (data, model) = (2, 2) train step below exercises BOTH cross-process
    # data parallelism and tensor parallelism.
    jax.config.update("jax_num_cpu_devices", 2)

    sys.path.insert(0, "/root/repo")
    from x_as_supervision_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator, num_processes=num_procs,
                         process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == proc_id

    result = {"process_index": proc_id}

    # --- BatchLoader sharding ---
    from x_as_supervision_tpu.data.loader import BatchLoader
    from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(num_samples=8, cam_id_list=(0, 1),
                              patch_size=32, seed=3)
    loader = BatchLoader(
        ds, batch_size=4, shuffle=False, num_workers=2, prefetch=1,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    fingerprints = []
    for batch in loader.epoch(0):
        for pelvis in batch["cam_0_pelvis"]:
            fingerprints.append(float(np.asarray(pelvis).sum()))
    result["loader_fingerprints"] = fingerprints

    # --- cross_host_mean ---
    from x_as_supervision_tpu.parallel.collectives import cross_host_mean

    if scope == "ckpt_save":
        _run_ckpt_save(result, out_path, sys.argv[6])
        return
    if scope == "ckpt_restore":
        _run_ckpt_restore(result, out_path, sys.argv[6])
        return
    if scope != "full":
        _run_step_scope(result, out_path)
        return

    reduced = cross_host_mean(
        {"a": float(proc_id), "b": 2.0 * proc_id + 1.0}
    )
    result["cross_host_mean"] = reduced

    # --- process-sharded Evaluator ---
    import jax.numpy as jnp

    from x_as_supervision_tpu.ops.integral import IntegralDecode
    from x_as_supervision_tpu.train.evaluator import Evaluator

    batch_size, num_hypo = 2, 2
    rng = np.random.default_rng(77)
    preds = rng.uniform(-0.9, 0.9,
                        size=(batch_size, num_hypo, 18, 3)).astype(np.float32)
    dpm = rng.uniform(0, 1, size=(18, 16)).astype(np.float32)

    class StubDetector:
        def apply(self, det_vars, img, train=False):
            return IntegralDecode(jnp.asarray(preds), jnp.asarray(dpm))

    config = {
        "model_params": {
            "cam_id_list": [0, 1],
            "flip_pairs": [[1, 4], [2, 5], [3, 6], [14, 11], [15, 12],
                           [16, 13]],
            "parent_ids": [0, 0, 1, 2, 0, 4, 5, 0, 17, 8, 9, 17, 11, 12, 17,
                           14, 15, 7],
        },
        "dataset_params": {"dataset": {"name": "hm36"}},
        "train_params": {"batch_size": batch_size},
    }
    ev = Evaluator(
        config, StubDetector(), {}, ds, out_path + ".evaldir",
        img_size=32.0, batch_size=batch_size,
    )
    result["my_batches"] = ev.my_batches
    tables = ev.eval(mode="confident")
    reduced_tables = cross_host_mean(tables)
    result["reduced_2d"] = reduced_tables[0]
    result["reduced_3d_mpjpe"] = reduced_tables[2]["mpjpe"]
    result["reduced_ambiguity"] = reduced_tables[6]

    # --- reduce_hosts ambiguity ratio with UNEQUAL shards (5 batches over
    # 2 processes): record() must normalize by the cross-host batch count,
    # giving every process the same global ratio ---
    ds_odd = SyntheticPoseDataset(num_samples=10, cam_id_list=(0, 1),
                                  patch_size=32, seed=3)
    ev_odd = Evaluator(
        config, StubDetector(), {}, ds_odd, out_path + ".evaldir_odd",
        img_size=32.0, batch_size=batch_size,
    )
    result["odd_my_batches"] = ev_odd.my_batches
    odd_tables = ev_odd.eval(mode="confident")
    result["odd_local_ambiguity"] = float(odd_tables[6])
    ev_odd.record(*odd_tables, reduce_hosts=True)
    result["odd_ambiguity_ratio"] = ev_odd.last_ambiguity_ratio

    # --- cross-process mixed MPI+HM36 dataset (reference dataloader.py:
    # 265-342): with BatchLoader(num_shards=2) each process must draw from
    # the SAME epoch-keyed reshuffle so the global epoch composition is
    # well-defined; fingerprints are compared positionally in the test ---
    sys.path.insert(0, "/root/repo/tests")
    from fixture_helpers import make_mixed_fingerprint_loader

    mixed_loader = make_mixed_fingerprint_loader(
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    for ep in (0, 1):
        result[f"mixed_fp_e{ep}"] = [
            float(v) for b in mixed_loader.epoch(ep) for v in b["fp"]
        ]

    # --- one fused GAN train step over the global (data=2, model=2) mesh:
    # params/moments channel-TP-sharded, batch data-sharded across the two
    # processes (the full multi-host GSPMD path, incl. global-array
    # construction via mesh.put_with_sharding) ---
    sys.path.insert(0, "/root/repo/tests")
    from test_train_step import TINY_CONFIG

    from x_as_supervision_tpu.parallel import mesh as M
    from x_as_supervision_tpu.parallel.tp import shard_state
    from x_as_supervision_tpu.train.factory import build_gan_spec
    from x_as_supervision_tpu.train.state import (
        init_train_state, make_optimizers, make_train_step,
    )

    assert jax.device_count() == 2 * num_procs
    cfg = {k: v for k, v in TINY_CONFIG.items()}
    spec = build_gan_spec(cfg)
    ds_step = SyntheticPoseDataset(
        num_samples=4, cam_id_list=cfg["model_params"]["cam_id_list"],
        patch_size=64, seed=5,
    )
    local, offset = M.process_local_batch_slice(4)
    full = ds_step.device_batch(0, 4)
    local_batch = {
        k: np.asarray(v)[offset:offset + local] for k, v in full.items()
    }

    opt_det, opt_disc = make_optimizers(cfg["train_params"], 10)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), local_batch, opt_det, opt_disc
    )
    mesh = M.make_mesh(model_parallelism=2)
    state = shard_state(state, mesh)
    sharded = M.shard_batch(local_batch, mesh)
    step = make_train_step(spec, opt_det, opt_disc)
    state, metrics, _ = step(
        state, sharded, jax.random.PRNGKey(9), do_disc=True, do_gen=True,
        with_outputs=False,
    )
    result["tp_step_loss"] = float(metrics["loss_total"])
    result["tp_step_disc"] = float(metrics["loss_disc"])

    with open(out_path, "w") as f:
        json.dump(result, f)


def _ckpt_harness(init_seed):
    """Shared machinery for the ckpt_save / ckpt_restore scopes: the fused
    GAN step on the global (data=2, model=2) mesh with TP-sharded state,
    deterministic batches, and a whole-state checksum."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/tests")
    from test_train_step import TINY_CONFIG

    from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
    from x_as_supervision_tpu.parallel import mesh as M
    from x_as_supervision_tpu.parallel.tp import shard_state
    from x_as_supervision_tpu.train.factory import build_gan_spec
    from x_as_supervision_tpu.train.state import (
        init_train_state, make_optimizers, make_train_step,
    )

    cfg = {k: v for k, v in TINY_CONFIG.items()}
    spec = build_gan_spec(cfg)
    ds = SyntheticPoseDataset(
        num_samples=16, cam_id_list=cfg["model_params"]["cam_id_list"],
        patch_size=64, seed=5,
    )
    local, offset = M.process_local_batch_slice(4)

    mesh = M.make_mesh(model_parallelism=2)

    def batch_for(step_idx):
        full = ds.device_batch((step_idx * 4) % 16, 4)
        local_batch = {
            k: np.asarray(v)[offset:offset + local] for k, v in full.items()
        }
        return M.shard_batch(local_batch, mesh)

    opt_det, opt_disc = make_optimizers(cfg["train_params"], 10)
    init_batch = {
        k: np.asarray(v)[offset:offset + local]
        for k, v in ds.device_batch(0, 4).items()
    }
    state = init_train_state(
        spec, jax.random.PRNGKey(init_seed), init_batch, opt_det, opt_disc,
    )
    state = shard_state(state, mesh)
    step = make_train_step(spec, opt_det, opt_disc)

    def run_step(state, step_idx):
        key = jax.random.fold_in(jax.random.PRNGKey(7), step_idx)
        state, metrics, _ = step(
            state, batch_for(step_idx), key, do_disc=True, do_gen=True,
            with_outputs=False,
        )
        return state, float(metrics["loss_total"])

    checksum = jax.jit(
        lambda s: sum(
            jnp.sum(jnp.abs(leaf).astype(jnp.float32))
            for leaf in jax.tree.leaves(s)
        )
    )
    return state, run_step, checksum


def _run_ckpt_save(result, out_path, ckpt_dir):
    """Two steps -> collective sharded save at the 'epoch boundary' ->
    two more steps = the uninterrupted trajectory."""
    from x_as_supervision_tpu.train import checkpoint as ckpt

    state, run_step, checksum = _ckpt_harness(init_seed=0)
    for i in (0, 1):
        state, _ = run_step(state, i)
    path = ckpt.save_checkpoint(ckpt_dir, 0, state)
    result["ckpt_path"] = path
    losses = []
    for i in (2, 3):
        state, loss = run_step(state, i)
        losses.append(loss)
    result["post_losses"] = losses
    result["final_checksum"] = float(checksum(state))
    with open(out_path, "w") as f:
        json.dump(result, f)


def _run_ckpt_restore(result, out_path, ckpt_dir):
    """A FRESH 2-process run (different init seed) restores the sharded
    checkpoint and must reproduce the uninterrupted trajectory bit-for-bit."""
    from x_as_supervision_tpu.train import checkpoint as ckpt

    state, run_step, checksum = _ckpt_harness(init_seed=999)
    path = ckpt.ckpt_path(ckpt_dir, 0)
    state = ckpt.restore_resume(path, state)
    losses = []
    for i in (2, 3):
        state, loss = run_step(state, i)
        losses.append(loss)
    result["post_losses"] = losses
    result["final_checksum"] = float(checksum(state))
    with open(out_path, "w") as f:
        json.dump(result, f)


def _run_step_scope(result, out_path):
    """scope='step': the fused GAN step over the global (data, model=2)
    mesh only (plus the loader fingerprints already collected)."""
    import json

    import jax
    import numpy as np

    sys.path.insert(0, "/root/repo/tests")
    from test_train_step import TINY_CONFIG

    from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
    from x_as_supervision_tpu.parallel import mesh as M
    from x_as_supervision_tpu.parallel.tp import shard_state
    from x_as_supervision_tpu.train.factory import build_gan_spec
    from x_as_supervision_tpu.train.state import (
        init_train_state, make_optimizers, make_train_step,
    )

    cfg = {k: v for k, v in TINY_CONFIG.items()}
    spec = build_gan_spec(cfg)
    ds_step = SyntheticPoseDataset(
        num_samples=4, cam_id_list=cfg["model_params"]["cam_id_list"],
        patch_size=64, seed=5,
    )
    local, offset = M.process_local_batch_slice(4)
    full = ds_step.device_batch(0, 4)
    local_batch = {
        k: np.asarray(v)[offset:offset + local] for k, v in full.items()
    }
    opt_det, opt_disc = make_optimizers(cfg["train_params"], 10)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), local_batch, opt_det, opt_disc
    )
    mesh = M.make_mesh(model_parallelism=2)
    state = shard_state(state, mesh)
    sharded = M.shard_batch(local_batch, mesh)
    step = make_train_step(spec, opt_det, opt_disc)
    state, metrics, _ = step(
        state, sharded, jax.random.PRNGKey(9), do_disc=True, do_gen=True,
        with_outputs=False,
    )
    result["tp_step_loss"] = float(metrics["loss_total"])
    result["tp_step_disc"] = float(metrics["loss_disc"])
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
