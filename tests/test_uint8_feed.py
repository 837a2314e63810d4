"""uint8 host->device feed (dataset_params.uint8_feed).

The pipeline ships raw uint8 image/mask/pseudo tensors (4x less transfer)
and the jitted step normalizes on device (models/composed.preprocess_batch).
With color augmentation off this is EXACT: cv2.warpAffine on uint8 returns
uint8, so the float cast the host path performs is lossless either way.
Pinned here:

  * bit-exact equivalence of the device-preprocessed uint8 batch vs the
    host-normalized float batch (incl. rm_bg ordering);
  * identical train-step losses from both feeds;
  * geodesic-map gating: the FMM maps are built only when a configured
    loss can observe them (use_dis_map AND weight != 0), never for eval.

Reference semantics being preserved: dataloader.py:70-75,184-191 (the
normalize + rm_bg + geodesic ordering).
"""

import os
import sys

import numpy as np
import pytest
import yaml  # noqa: F401

cv2 = pytest.importorskip("cv2")
pytest.importorskip("scipy.io")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fixture_helpers as FH  # noqa: E402
from test_train_step import TINY_CONFIG  # noqa: E402


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    data = tmp_path_factory.mktemp("data")
    hm_root = FH.make_mini_h36m(str(data), n_frames=8)
    shard = FH.synthesize_surreal_segment(
        str(data / "surreal"), str(data / "smpl")
    )
    pseudo_out = str(data / "surreal_h36m_pose")
    written = FH.run_surreal_constructor(shard, pseudo_out, target=64)
    assert written
    return dict(hm_root=hm_root, pseudo=pseudo_out)


def _config(assets, uint8_feed: bool, loss_overrides=None) -> dict:
    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in TINY_CONFIG.items()}
    cfg["model_params"] = dict(
        cfg["model_params"],
        loss_config={
            **{k: dict(v) for k, v in
               cfg["model_params"]["loss_config"].items()},
            **(loss_overrides or {}),
        },
    )
    cfg["dataset_params"] = {
        "cam_id_list": [0, 1],
        "rm_bg": True,
        "uint8_feed": uint8_feed,
        "geodesic_pt_list": [0],
        "geodesic_param_list": [2, 1, 3, 20, 0.0],
        "dataset": {"name": "hm36", "path": assets["hm_root"],
                    "train_image_set": "mini", "test_image_set": "mini"},
        "dataiter": {"mean": [0.0, 0.0, 0.0], "std": [255.0, 255.0, 255.0]},
        "smpl_pseudo_img": {"data_path": assets["pseudo"],
                            "use_flag": True, "use_mask": True},
    }
    cfg["model_params"]["cam_id_list"] = [0, 1]
    cfg["train_params"] = dict(
        cfg["train_params"], batch_size=2, patch_width=64, patch_height=64,
        aug={"scale_factor": 0, "rot_factor": 0, "color_factor": 0,
             "rot_aug_rate": 0, "flip_aug_rate": 0, "do_flip_aug": False},
    )
    return cfg


def test_uint8_feed_bit_exact_after_device_preprocess(assets):
    import jax.numpy as jnp

    from x_as_supervision_tpu.data.factory import basic_data
    from x_as_supervision_tpu.models.composed import preprocess_batch
    from x_as_supervision_tpu.train.factory import build_gan_spec

    # dis-map-weighted recons so geodesic maps exist in BOTH variants
    over = {"recons_loss": {"use_dis_map": True, "weight": 0.02}}
    cfg_f = _config(assets, uint8_feed=False, loss_overrides=over)
    cfg_u = _config(assets, uint8_feed=True, loss_overrides=over)
    ds_f = basic_data(cfg_f, seed=3)
    ds_u = basic_data(cfg_u, seed=3)

    bf = ds_f.device_batch(0, 2)
    bu = ds_u.device_batch(0, 2)
    for ck in ("cam_0", "cam_1"):
        assert bu[f"{ck}_img"].dtype == np.uint8
        assert bu[f"{ck}_mask"].dtype == np.uint8
        assert bu[f"{ck}_pseudo_img"].dtype == np.uint8
        # geodesic identical on both paths (computed host-side either way)
        np.testing.assert_array_equal(
            bf[f"{ck}_geodesic_dis"], bu[f"{ck}_geodesic_dis"]
        )

    spec = build_gan_spec(cfg_u)
    assert spec.feed_rm_bg and spec.feed_std == (255.0, 255.0, 255.0)
    pre = preprocess_batch({k: jnp.asarray(v) for k, v in bu.items()}, spec)
    for ck in ("cam_0", "cam_1"):
        for suffix in ("img", "mask", "pseudo_img", "joints"):
            a = np.asarray(pre[f"{ck}_{suffix}"])
            b = np.asarray(bf[f"{ck}_{suffix}"])
            np.testing.assert_array_equal(a, b, err_msg=f"{ck}_{suffix}")


def test_uint8_feed_train_step_losses_identical(assets):
    import jax

    from x_as_supervision_tpu.data.factory import basic_data
    from x_as_supervision_tpu.train.factory import build_gan_spec
    from x_as_supervision_tpu.train.state import (
        init_train_state,
        make_optimizers,
        make_train_step,
    )

    metrics_by_variant = {}
    for uint8 in (False, True):
        cfg = _config(assets, uint8_feed=uint8)
        ds = basic_data(cfg, seed=3)
        batch = ds.device_batch(0, 2)
        spec = build_gan_spec(cfg)
        opt_det, opt_disc = make_optimizers(cfg["train_params"], 10)
        state = init_train_state(
            spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
        )
        step = make_train_step(spec, opt_det, opt_disc)
        _, metrics, _ = step(
            state, batch, jax.random.PRNGKey(1), do_disc=True, do_gen=True,
            with_outputs=False,
        )
        metrics_by_variant[uint8] = {
            k: float(v) for k, v in metrics.items()
        }

    # The fed VALUES are bit-identical (test above); inside the jitted
    # step, XLA fuses the on-device normalize into its consumers with
    # different rounding/reassociation, so step-level losses agree to
    # fp32 fusion noise, not bitwise (observed ~1e-6 relative on CPU).
    assert metrics_by_variant[False].keys() == metrics_by_variant[True].keys()
    for k in metrics_by_variant[False]:
        np.testing.assert_allclose(
            metrics_by_variant[False][k], metrics_by_variant[True][k],
            rtol=1e-4, atol=1e-7, err_msg=k,
        )


def test_geodesic_gating(assets):
    from x_as_supervision_tpu.data.factory import basic_data

    # weight-0 dis-map losses (the S1 shape): no geodesic key, no FMM work
    over0 = {
        "recons_loss": {"use_dis_map": True, "weight": 0.0},
        "physique_recons_loss": {"use_dis_map": True, "weight": 0.0},
    }
    ds = basic_data(_config(assets, False, over0), seed=0)
    item = ds.sample(0)
    assert "cam_0_geodesic_dis" not in item

    # dis-map-weighted loss: maps present
    over1 = {"recons_loss": {"use_dis_map": True, "weight": 0.02}}
    ds = basic_data(_config(assets, False, over1), seed=0)
    item = ds.sample(0)
    assert item["cam_0_geodesic_dis"].shape == (64, 64, 1)

    # eval datasets never need the maps
    ds = basic_data(_config(assets, False, over1), eval_only=True, seed=0)
    item = ds.sample(0)
    assert "cam_0_geodesic_dis" not in item

    # explicit config override wins
    cfg = _config(assets, False, over0)
    cfg["dataset_params"]["compute_geodesic"] = True
    ds = basic_data(cfg, seed=0)
    assert ds.sample(0)["cam_0_geodesic_dis"].shape == (64, 64, 1)
