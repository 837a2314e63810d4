"""Smoke test for the serving benchmark tool (tools/bench_serve.py).

Runs the real CLI on CPU with a tiny detector config and asserts it
produces one well-formed result row per requested batch size with
positive timings — the tool itself is now test-covered instead of only
hand-run (PERF.md serving table provenance).
"""

import json
import os
import subprocess
import sys

import pytest
import yaml


@pytest.mark.parametrize("batches", ["1,2"])
def test_bench_serve_cli_smoke(tmp_path, batches):
    cfg = {
        "model_params": {
            "detector_params": {
                "name": "resnet_multi", "num_kp": 18, "depth_dim": 16,
                "num_hypo": 2, "neighbor_size": 3, "num_layers": 18,
            },
        },
        "train_params": {"patch_width": 64, "patch_height": 64},
    }
    cfg_path = tmp_path / "serve.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    out = subprocess.run(
        [sys.executable, "-m", "x_as_supervision_tpu.tools.bench_serve",
         "--config", str(cfg_path), "--batches", batches, "--iters", "2",
         "--platform", "cpu"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    rows = [json.loads(line) for line in out.stdout.splitlines()
            if line.strip().startswith("{")]
    wanted = [int(b) for b in batches.split(",")]
    assert [r["batch"] for r in rows] == wanted, out.stdout
    for r in rows:
        assert r["device_ms"] > 0
        assert r["end_to_end_ms"] >= r["device_ms"] * 0.5
        assert r["img_s_device"] > 0
