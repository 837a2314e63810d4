"""End-to-end test of the accuracy-campaign driver
(`scripts/run_campaign_xl.sh`): every stage — S1 train, S2 finetune (the
XAS_INIT_CKPT bootstrap through scripts/train_resumable.sh), both eval
protocols (H36M MPJPE family + MPI PCK/AUC twin), the S1ext
matched-compute control stage, and the confident-mode rows — driven over
a tiny CPU render of the self-rendered campaign data.

The s1ext stage in particular shipped in round 4 without ever completing
a run (its XL-scale launch was cut off by the round's wall clock —
PERF.md round 4); this pins its plumbing: init from the S1 checkpoint,
finetune under the control config, and all three eval artifacts.
"""

import os
import subprocess
import sys

import pytest
import yaml

TIMEOUT = 2700


def _run(cmd, env, timeout=TIMEOUT):
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=os.getcwd(),
        timeout=timeout,
    )
    assert out.returncode == 0, (
        f"{' '.join(cmd)} failed rc={out.returncode}\n"
        f"stdout: {out.stdout[-2000:]}\nstderr: {out.stderr[-3000:]}"
    )
    return out


@pytest.fixture(scope="module")
def campaign_fixture(tmp_path_factory):
    """Tiny rendered campaign + matching tiny config triplet."""
    root = tmp_path_factory.mktemp("campaign")
    data = str(root / "data")
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    _run(
        [sys.executable, "-m",
         "x_as_supervision_tpu.tools.render_campaign", "--out", data,
         "--train_frames", "2", "--valid_frames", "2",
         "--pseudo_segments", "2", "--pseudo_frames", "8",
         "--img_size", "64", "--seed", "0", "--platform", "cpu",
         "--train_set", "campaign_train", "--valid_set", "campaign_valid"],
        env,
    )

    cfg_dir = root / "cfg"
    cfg_dir.mkdir()
    for stage in ("S1", "S2", "S1ext", "S2h0"):
        with open(f"config/Campaign_XL_Sur{stage}.yaml") as f:
            cfg = yaml.safe_load(f)
        dp = cfg["dataset_params"]
        dp["dataset"]["path"] = os.path.join(data, "hm36")
        dp["dataset"]["train_image_set"] = "campaign_train"
        dp["dataset"]["test_image_set"] = "campaign_valid"
        dp["smpl_pseudo_img"]["data_path"] = os.path.join(
            data, "surreal_h36m_pose"
        )
        mp = cfg["model_params"]
        mp["detector_params"].update(
            depth_dim=8, num_layers=18, neighbor_size=3
        )
        mp["smpl_disc_params"].update(
            input_dim=16, hidden_dim=16, output_dim=16
        )
        mp["smpl_layer_params"]["model_path"] = os.path.join(
            data, "smpl_models"
        )
        mp["physique_mask_generator_params"]["layers"] = [4, 8]
        cfg["train_params"].update(
            num_epochs=1, batch_size=4, checkpoint_freq=1,
            patch_width=64, patch_height=64, epoch_milestones=[1],
        )
        with open(cfg_dir / f"Campaign_T_Sur{stage}.yaml", "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)

    env.update(
        XAS_CAMPAIGN_CFG_DIR=str(cfg_dir),
        XAS_CAMPAIGN_PREFIX="Campaign_T_Sur",
        XAS_CAMPAIGN_LOG_ROOT=str(root / "log"),
        XAS_CAMPAIGN_OUT=str(root / "out"),
        XAS_CAMPAIGN_TRAIN_ARGS="--seed 0 --worker 2 --platform cpu",
        XAS_CAMPAIGN_EVAL_ARGS="--platform cpu",
    )
    return root, env


def _assert_eval_artifact(path, mpi=False):
    assert os.path.isfile(path), f"missing {path}"
    text = open(path).read()
    needle = "pck" if mpi else "mpjpe"
    assert needle in text.lower(), f"{path} has no {needle} rows:\n{text}"


@pytest.mark.slow
def test_campaign_driver_all_then_s1ext_then_confident(campaign_fixture):
    root, env = campaign_fixture
    out = str(root / "out")
    log = str(root / "log")

    # stage by stage (each stage is one fused-step compile on CPU — a
    # single `all` invocation would need one huge timeout): S1 train,
    # then S2 finetune; per the driver's contract each stage also
    # refreshes the eval artifacts for every checkpoint that exists
    _run(["bash", "scripts/run_campaign_xl.sh", "s1"], env)
    _run(["bash", "scripts/run_campaign_xl.sh", "s2"], env)
    for s in (1, 2):
        run_root = os.path.join(log, f"campaign_xl_s{s}")
        # >= 1: train_resumable.sh's designed retry behavior creates a
        # second run dir if a crash precedes the first checkpoint save;
        # check the newest run (mirroring the driver's `ls -dt | head -1`)
        runs = sorted(
            os.listdir(run_root),
            key=lambda n: os.path.getmtime(os.path.join(run_root, n)),
        )
        assert len(runs) >= 1, runs
        names = os.listdir(os.path.join(run_root, runs[-1]))
        assert any(n.endswith("_ckpt") for n in names), names
        _assert_eval_artifact(os.path.join(out, f"xl_eval_s{s}.txt"))
        _assert_eval_artifact(
            os.path.join(out, f"xl_eval_s{s}_mpi.txt"), mpi=True
        )

    # the matched-compute control stage: must init from the S1 checkpoint
    # and produce all three of its eval artifacts
    res = _run(["bash", "scripts/run_campaign_xl.sh", "s1ext"], env)
    assert "finetune from" in res.stdout, res.stdout[-2000:]
    assert "campaign_xl_s1/" in res.stdout, res.stdout[-2000:]
    _assert_eval_artifact(os.path.join(out, "xl_eval_s1ext.txt"))
    _assert_eval_artifact(
        os.path.join(out, "xl_eval_s1ext_mpi.txt"), mpi=True
    )
    _assert_eval_artifact(os.path.join(out, "xl_eval_s1ext_confident.txt"))

    # the confident-mode experiment stage (S2 finetune + hypothesis-0
    # pull) shares finetune_variant with s1ext; pin its artifacts too
    res = _run(["bash", "scripts/run_campaign_xl.sh", "s2h0"], env)
    assert "campaign_xl_s1/" in res.stdout, res.stdout[-2000:]
    _assert_eval_artifact(os.path.join(out, "xl_eval_s2h0.txt"))
    _assert_eval_artifact(
        os.path.join(out, "xl_eval_s2h0_mpi.txt"), mpi=True
    )
    _assert_eval_artifact(os.path.join(out, "xl_eval_s2h0_confident.txt"))

    # confident-mode rows for S1/S2
    _run(["bash", "scripts/run_campaign_xl.sh", "confident"], env)
    _assert_eval_artifact(os.path.join(out, "xl_eval_s1_confident.txt"))
    _assert_eval_artifact(os.path.join(out, "xl_eval_s2_confident.txt"))
