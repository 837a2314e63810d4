import os

import jax
import jax.numpy as jnp
import numpy as np

from test_train_step import TINY_CONFIG
from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
from x_as_supervision_tpu.train import checkpoint as ckpt
from x_as_supervision_tpu.train.trainer import Trainer


def _dataset():
    return SyntheticPoseDataset(num_samples=16, cam_id_list=(0, 1), patch_size=64)


def test_trainer_epoch_checkpoint_resume_finetune(tmp_path):
    cfg = {**TINY_CONFIG}
    cfg["train_params"] = dict(TINY_CONFIG["train_params"], num_epochs=1,
                               checkpoint_freq=1)
    save_dir = str(tmp_path / "run")
    os.makedirs(save_dir)

    trainer = Trainer(cfg, _dataset(), save_dir, seed=0, dtype=jnp.float32)
    trainer.train(tb_logger=None)

    latest = ckpt.latest_checkpoint(save_dir)
    assert latest is not None and latest.endswith("00000_ckpt")

    # resume: epochs_run picked up, params identical to the saved state
    resumed = Trainer(
        cfg, _dataset(), save_dir, checkpoint_path=latest, mode="train",
        seed=0, dtype=jnp.float32,
    )
    assert resumed.epochs_run == 1
    same = jax.tree.all(
        jax.tree.map(
            lambda a, b: bool(jnp.allclose(a, b)),
            jax.device_get(trainer.state.det_params),
            jax.device_get(resumed.state.det_params),
        )
    )
    assert same
    # optimizer state restored too (non-zero adam step count)
    opt_steps = jax.tree.leaves(resumed.state.opt_det)
    assert any(int(np.asarray(x).max()) > 0 for x in opt_steps if np.asarray(x).ndim == 0)

    # finetune: weights restored, optimizers/counters reset
    ft = Trainer(
        cfg, _dataset(), save_dir, checkpoint_path=latest, mode="finetune",
        seed=0, dtype=jnp.float32,
    )
    assert int(ft.state.step) == 0
    same_w = jax.tree.all(
        jax.tree.map(
            lambda a, b: bool(jnp.allclose(a, b)),
            jax.device_get(trainer.state.det_params),
            jax.device_get(ft.state.det_params),
        )
    )
    assert same_w
