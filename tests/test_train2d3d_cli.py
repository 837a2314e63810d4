"""train2d3d.py CLI smoke on an on-disk TikTok fixture (mono path end to
end through the real entry point)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")

from x_as_supervision_tpu.data.dataloader_2d import TIKTOK_TRAIN_VIDEOS


@pytest.fixture(scope="module")
def tiktok_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiktok_cli")
    data = root / "TikTok_dataset"
    rng = np.random.default_rng(0)
    vid = TIKTOK_TRAIN_VIDEOS[0]
    (data / f"{vid:05d}" / "images").mkdir(parents=True)
    (data / f"{vid:05d}" / "masks").mkdir(parents=True)
    for i in range(48):  # 8 usable frames after the 20/20 trim
        frame = rng.uniform(0, 255, (120, 80, 3)).astype(np.uint8)
        mask = np.zeros((120, 80), np.uint8)
        cv2.circle(mask, (40, 60), 25, 255, -1)
        cv2.imwrite(str(data / f"{vid:05d}" / "images" / f"{i:05d}.png"), frame)
        cv2.imwrite(str(data / f"{vid:05d}" / "masks" / f"{i:05d}.png"), mask)

    from test_train_step import TINY_CONFIG

    cfg = {k: dict(v) for k, v in TINY_CONFIG.items()}
    cfg["dataset_params"] = {
        "cam_id_list": ["mono"],
        "dataset": {"name": "tiktok", "path": str(data)},
        "geodesic_param_list": [2, 1, 3, 20, 0.0],
    }
    # the fixture has no pseudo stream -> drop the pseudo/GAN losses and
    # the discriminator entirely (they require cam_*_pseudo_joints)
    mp = dict(cfg["model_params"])
    mp["cam_id_list"] = ["mono"]
    mp.pop("smpl_disc_params", None)
    mp["loss_config"] = {
        "recons_loss": {"use_dis_map": True, "weight": 0.02},
        "physique_recons_loss": {"use_dis_map": True, "weight": 0.02},
    }
    cfg["model_params"] = mp
    cfg["train_params"] = dict(
        cfg["train_params"], num_epochs=1, batch_size=4, checkpoint_freq=1,
        patch_width=64, patch_height=64, rect_3d_width=256,
        rect_3d_height=256,
    )
    path = root / "TikTok_Tiny.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path), str(root / "log")


@pytest.mark.slow
def test_train2d3d_cli(tiktok_env):
    cfg_path, log_dir = tiktok_env
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    out = subprocess.run(
        [sys.executable, "train2d3d.py", "--config", cfg_path,
         "--seed", "0", "--log_dir", log_dir, "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=os.getcwd(),
        timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    runs = os.listdir(log_dir)
    assert len(runs) == 1
    names = os.listdir(os.path.join(log_dir, runs[0]))
    assert any(n.endswith("_ckpt") for n in names)
