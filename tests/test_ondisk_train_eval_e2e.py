"""Full on-disk train -> eval e2e on NON-synthetic-loader data.

Unlike test_cli_smoke (which uses --synthetic, bypassing the data layer),
this drives the real path end to end:

  mini-H36M on disk (meta files + stick-figure jpgs + SAM masks)
    -> hm36 index builder ('mini' subset policy)
    -> PatchDataset (affine crop, MPI/SAM mask warp, geodesic FMM)
    -> pseudo stream from the SURREAL constructor's own output
    -> train.py subprocess (fused GAN step, checkpointing)
    -> eval.py subprocess -> eval/eval_result.txt with finite metrics.

The images are rendered FROM the ground-truth joints, so the recons loss
has real signal; the run is far too short to converge — the assertion is
that every stage of the production pipeline executes and the metric scale
is sane (mm, not garbage), not accuracy.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")
pytest.importorskip("scipy.io")

import fixture_helpers as FH  # noqa: E402


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    data = tmp_path_factory.mktemp("data")
    hm_root = FH.make_mini_h36m(str(data), n_frames=8)
    shard = FH.synthesize_surreal_segment(
        str(data / "surreal"), str(data / "smpl")
    )
    pseudo_out = str(data / "surreal_h36m_pose")
    written = FH.run_surreal_constructor(shard, pseudo_out, target=64)
    assert written, "constructor produced no pseudo samples"
    return dict(hm_root=hm_root, pseudo=pseudo_out)


@pytest.fixture(scope="module")
def cfg_path(assets, tmp_path_factory):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train_step import TINY_CONFIG

    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in TINY_CONFIG.items()}
    cfg["model_params"] = dict(cfg["model_params"],
                               cam_id_list=[0, 1, 2, 3])
    cfg["dataset_params"] = {
        "cam_id_list": [0, 1, 2, 3],
        "rm_bg": True,
        "geodesic_pt_list": [0],
        "geodesic_param_list": [2, 1, 3, 20, 0.0],
        "dataset": {"name": "hm36", "path": assets["hm_root"],
                    "train_image_set": "mini", "test_image_set": "mini"},
        "dataiter": {"mean": [0.0, 0.0, 0.0], "std": [255.0, 255.0, 255.0]},
        "smpl_pseudo_img": {"data_path": assets["pseudo"],
                            "use_flag": True, "use_mask": True},
    }
    cfg["train_params"] = dict(
        cfg["train_params"], num_epochs=2, batch_size=4, checkpoint_freq=1,
        patch_width=64, patch_height=64,
        aug={"scale_factor": 0, "rot_factor": 0, "color_factor": 0,
             "rot_aug_rate": 0, "flip_aug_rate": 0, "do_flip_aug": False},
    )
    path = tmp_path_factory.mktemp("cfg") / "Mini_OnDisk.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


@pytest.mark.slow
def test_ondisk_train_then_eval(cfg_path, tmp_path):
    log_dir = str(tmp_path / "log")
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    out = subprocess.run(
        [sys.executable, "train.py", "--config", cfg_path, "--seed", "0",
         "--log_dir", log_dir, "--platform", "cpu", "--worker", "4"],
        capture_output=True, text=True, env=env, cwd=os.getcwd(),
        timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-4000:]

    run_dir = os.path.join(log_dir, os.listdir(log_dir)[0])
    ckpts = sorted(n for n in os.listdir(run_dir) if n.endswith("_ckpt"))
    assert ckpts, os.listdir(run_dir)

    out = subprocess.run(
        [sys.executable, "eval.py", "--config", cfg_path,
         "--checkpoint", os.path.join(run_dir, ckpts[-1]),
         "--multi_hypo", "best", "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=os.getcwd(),
        timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-4000:]

    result = os.path.join(run_dir, "eval", "eval_result.txt")
    assert os.path.exists(result)
    lines = open(result).read().strip().splitlines()
    metrics = {}
    for line in lines:
        if ":" in line:
            key, val = line.split(":", 1)
            try:
                metrics[key.strip()] = float(val.replace("%", "").strip())
            except ValueError:
                pass
    for key in ("MPJPE", "N-MPJPE", "P-MPJPE", "TRI MPJPE"):
        assert key in metrics, (key, lines)
        assert np.isfinite(metrics[key]), (key, metrics[key])
        # mm scale sanity: a 2m-wide crop bounds the error far below 5000
        assert 0.0 < metrics[key] < 5000.0, (key, metrics[key])
