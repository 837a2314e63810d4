"""Localhost "2-host" launcher integration.

`scripts/launch_train.sh local 2 <cfg>` must actually DISPATCH the
multi-host job (the reference's launcher submits SLURM -> torchrun,
reference scripts/launch_train.sh:19-20 + scripts/train.sh:24-27): two
train.py processes with explicit ranks join one jax.distributed job over
the script-plumbed coordinator, train an epoch together, and write one
collective sharded checkpoint into one agreed run dir.
"""

import os
import socket
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


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
    path = d / "Tiny_Launch.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


@pytest.mark.slow
def test_local_two_host_dispatch(tiny_cfg, tmp_path):
    log_dir = str(tmp_path / "log")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("XLA_FLAGS", "JAX_"))}
    env.update(
        XAS_COORD_PORT=str(_free_port()),
        XAS_EXTRA_ARGS=(
            f"--synthetic --seed 0 --platform cpu --worker 2 "
            f"--log_dir {log_dir}"
        ),
    )
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "launch_train.sh"),
         "local", "2", tiny_cfg],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=3000,
    )
    logs = {}
    log_root = tmp_path / "launch_output"
    if log_root.is_dir():
        for f in sorted(log_root.iterdir()):
            logs[f.name] = f.read_text()
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:],
                                 {k: v[-2000:] for k, v in logs.items()})

    host0 = next(v for k, v in logs.items() if k.startswith("log.host0"))
    host1 = next(v for k, v in logs.items() if k.startswith("log.host1"))
    # both ranks were plumbed through the script
    assert "--num_processes 2 --process_id 0" in host0
    assert "--num_processes 2 --process_id 1" in host1
    # rank gating held: only process 0 announces the (collective) save
    assert "checkpoint saved" in host0
    assert "checkpoint saved" not in host1

    # ONE agreed run dir, containing the one sharded checkpoint
    runs = os.listdir(log_dir)
    assert len(runs) == 1, runs
    names = os.listdir(os.path.join(log_dir, runs[0]))
    assert any(n.endswith("_ckpt") for n in names), names
    assert "tensorboard" in names
