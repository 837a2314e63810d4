"""End-to-end learning check: a few fused GAN steps on the synthetic
fixture must reduce the pseudo-supervision loss (the S1 training signal,
reference config/HM36_Multi_SurS1.yaml loss weights)."""

import copy

import jax
import numpy as np
import pytest

from test_train_step import TINY_CONFIG
from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
from x_as_supervision_tpu.train.factory import build_gan_spec
from x_as_supervision_tpu.train.state import (
    init_train_state,
    make_optimizers,
    make_train_step,
)


@pytest.mark.slow
def test_pseudo_loss_decreases():
    cfg = copy.deepcopy(TINY_CONFIG)
    # S1 shape: pseudo supervision dominates, higher LR for fast movement
    cfg["model_params"]["loss_config"] = {
        "smpl_pseudo_img_loss": {"weight": 1.0},
        "smpl_disc_loss": {"weight": 0.0, "update_interval": 1},
        "smpl_gen_loss": {"weight": 0.0},
    }
    cfg["train_params"]["lr_kp_detector"] = 1e-3

    spec = build_gan_spec(cfg)
    ds = SyntheticPoseDataset(num_samples=8, cam_id_list=(0, 1), patch_size=64)
    batch = ds.device_batch(0, 8)
    opt_det, opt_disc = make_optimizers(cfg["train_params"], 1000)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
    )
    step = make_train_step(spec, opt_det, opt_disc)

    losses = []
    for i in range(12):
        state, metrics, _ = step(
            state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i),
            do_disc=True, do_gen=True, with_outputs=False,
        )
        losses.append(float(metrics["loss/smpl_pseudo_img"]))

    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert np.isfinite(losses).all()
    assert last < first * 0.9, (first, last, losses)
