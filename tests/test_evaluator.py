import os

import jax
import jax.numpy as jnp
import numpy as np

from test_train_step import TINY_CONFIG
from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
from x_as_supervision_tpu.train.evaluator import Evaluator
from x_as_supervision_tpu.train.factory import build_gan_spec


def test_evaluator_end_to_end_plumbing(tmp_path):
    cfg = {**TINY_CONFIG}
    cfg["dataset_params"] = {
        "cam_id_list": [0, 1],
        "dataset": {"name": "hm36"},  # per-action tables path
    }
    cfg["train_params"] = dict(TINY_CONFIG["train_params"], batch_size=4)

    spec = build_gan_spec(cfg)
    ds = SyntheticPoseDataset(num_samples=8, cam_id_list=(0, 1), patch_size=64)
    img = jnp.asarray(ds.batch(0, 4)["cam_0_img"])
    det_vars = spec.detector.init(jax.random.PRNGKey(0), img, train=False)

    ev = Evaluator(cfg, spec.detector, det_vars, ds, str(tmp_path),
                   img_size=64.0)
    tables = ev.eval(mode="best")
    rec2d, cnt2d, rec3d, cnt3d, rec3dt, cnt3dt, amb = tables

    # tables populated and finite
    assert sum(cnt2d.values()) > 0
    assert all(np.isfinite(v) for v in rec3d["mpjpe"].values())
    assert np.isfinite(amb)

    path = ev.record(*tables)
    assert os.path.exists(path)
    text = open(path).read()
    assert "MPJPE" in text and "TRI MPJPE" in text and "select" in text


def test_evaluator_confident_mode(tmp_path):
    cfg = {**TINY_CONFIG}
    cfg["dataset_params"] = {
        "cam_id_list": [0, 1],
        "dataset": {"name": "mpi_inf_3dhp"},  # scalar-table + pck/auc path
    }
    cfg["train_params"] = dict(TINY_CONFIG["train_params"], batch_size=4)
    spec = build_gan_spec(cfg)
    ds = SyntheticPoseDataset(num_samples=4, cam_id_list=(0, 1), patch_size=64)
    img = jnp.asarray(ds.batch(0, 4)["cam_0_img"])
    det_vars = spec.detector.init(jax.random.PRNGKey(1), img, train=False)

    ev = Evaluator(cfg, spec.detector, det_vars, ds, str(tmp_path),
                   img_size=64.0)
    tables = ev.eval(mode="confident")
    rec2d, cnt2d, rec3d, cnt3d, rec3dt, cnt3dt, amb = tables
    assert cnt3d["pck"] > 0 and np.isfinite(rec3d["pck"])
    path = ev.record(*tables)
    assert "pck" in open(path).read()
