"""CLI smoke: train.py --synthetic end-to-end in a subprocess (run dirs,
TB writer, checkpointing, resume wiring), then eval.py on the produced
checkpoint."""

import os
import subprocess
import sys

import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    from test_train_step import TINY_CONFIG

    cfg = {k: dict(v) for k, v in TINY_CONFIG.items()}
    cfg["dataset_params"] = {
        "cam_id_list": [0, 1],
        "dataset": {"name": "hm36"},
        "dataiter": {"mean": [0.0, 0.0, 0.0], "std": [1.0, 1.0, 1.0]},
    }
    cfg["train_params"] = dict(
        cfg["train_params"], num_epochs=1, batch_size=4, checkpoint_freq=1,
        patch_width=64, patch_height=64,
    )
    d = tmp_path_factory.mktemp("cfg")
    path = d / "Tiny_Smoke.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


@pytest.mark.slow
def test_train_and_eval_cli(tiny_cfg, tmp_path):
    log_dir = str(tmp_path / "log")
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    out = subprocess.run(
        [sys.executable, "train.py", "--config", tiny_cfg, "--synthetic",
         "--seed", "0", "--log_dir", log_dir, "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=os.getcwd(),
        timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-3000:]

    runs = os.listdir(log_dir)
    assert len(runs) == 1
    run_dir = os.path.join(log_dir, runs[0])
    names = os.listdir(run_dir)
    assert "tensorboard" in names
    assert any(n.endswith("_ckpt") for n in names)
    assert any(n.endswith(".yaml") for n in names)

    ckpt = os.path.join(
        run_dir, sorted(n for n in names if n.endswith("_ckpt"))[-1]
    )
    out = subprocess.run(
        [sys.executable, "eval.py", "--config", tiny_cfg, "--synthetic",
         "--checkpoint", ckpt, "--multi_hypo", "best", "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=os.getcwd(),
        timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = os.path.join(run_dir, "eval", "eval_result.txt")
    assert os.path.exists(result)
    assert "MPJPE" in open(result).read()
