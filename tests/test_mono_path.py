"""The composed model's mono branch (TikTok/2D path): single cam_mono view,
identity camera, no symmetry loss, mono world lift."""

import copy

import jax
import numpy as np

from test_train_step import TINY_CONFIG
from x_as_supervision_tpu.data.synthetic import SyntheticMonoDataset
from x_as_supervision_tpu.train.factory import build_gan_spec
from x_as_supervision_tpu.train.state import (
    init_train_state,
    make_optimizers,
    make_train_step,
)


def test_mono_train_step():
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["model_params"]["cam_id_list"] = ["mono"]
    # mono skips symmetry entirely (reference modules/model.py:100-102);
    # keep it configured to verify the branch is inert
    ds = SyntheticMonoDataset(num_samples=4, patch_size=64)
    batch = ds.device_batch(0, 4)
    assert "cam_mono_img" in batch

    spec = build_gan_spec(cfg)
    opt_det, opt_disc = make_optimizers(cfg["train_params"], 10)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
    )
    step = make_train_step(spec, opt_det, opt_disc)
    state2, metrics, outputs = step(
        state, batch, jax.random.PRNGKey(1), do_disc=True, do_gen=True
    )

    assert np.isfinite(float(metrics["loss_total"]))
    assert np.isfinite(float(metrics["loss_disc"]))
    # symmetry contributes 0 for mono (sum over zero cameras)
    assert float(metrics["loss/symmetry"]) == 0.0
    assert "loss/smpl_pseudo_img" in metrics
    assert "pose_2d_pred_cam_mono_ori" in outputs
    # no GT world probe in mono mode (reference modules/model.py:83-84)
    assert "kp_gt_world" not in outputs
