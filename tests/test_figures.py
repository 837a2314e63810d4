"""Figure writers: the draw* composites save non-trivial files and the
skeleton plotters accept 18-joint poses. Reference: eval_utils.py:68-261."""

import os

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from x_as_supervision_tpu.train import figures as F

FLIP = np.array([[1, 4], [2, 5], [3, 6], [14, 11], [15, 12], [16, 13]])
PARENTS = np.array([0, 0, 1, 2, 0, 4, 5, 0, 17, 8, 9, 17, 11, 12, 17, 14,
                    15, 7])
RNG = np.random.default_rng(0)


def _pose3d():
    return RNG.normal(scale=200.0, size=(18, 3))


def _img():
    return RNG.uniform(0, 1, size=(256, 256, 3)).astype(np.float32)


def _p2d():
    return RNG.uniform(-0.8, 0.8, size=(18, 2)).astype(np.float32)


def test_draw_composites_write_files(tmp_path):
    out = str(tmp_path / "fig.png")
    F.draw(_p2d(), _img(), _p2d(), _img(), _pose3d(), _pose3d(), out,
           FLIP, PARENTS)
    assert os.path.getsize(out) > 10_000

    out2 = str(tmp_path / "fig2d.png")
    F.draw_2d(_p2d(), _img(), _p2d(), _img(), out2, FLIP, PARENTS)
    assert os.path.getsize(out2) > 10_000

    outm = str(tmp_path / "mono.png")
    F.draw_mono(_img(), _p2d(), _pose3d(), outm, FLIP, PARENTS)
    assert os.path.getsize(outm) > 10_000

    outm2 = str(tmp_path / "mono2d.png")
    F.draw_mono_2d(_img(), _p2d(), outm2, FLIP, PARENTS)
    assert os.path.getsize(outm2) > 10_000


def test_save_qualitative_figure_from_eval_out(tmp_path):
    batch = {
        "cam_0_img": np.stack([_img()]),
        "cam_1_img": np.stack([_img()]),
    }
    eval_out = {
        "kp_pred_2d": {"cam_0": np.stack([_p2d()]),
                       "cam_1": np.stack([_p2d()])},
        "tri": np.stack([_pose3d()]),
        "kps_world_gt": np.stack([_pose3d()]),
    }
    out = str(tmp_path / "qual.png")
    F.save_qualitative_figure(batch, eval_out, 0, 1, out, FLIP, PARENTS)
    assert os.path.getsize(out) > 10_000
