#!/usr/bin/env python
"""Cross-framework convergence parity (VERDICT r4 next-round #3).

Trains the ACTUAL torch reference — its own train.py __main__, its own
data pipeline (human_utils hm36 + SURREAL pseudo), its own Trainer and
eval.py — AND this framework, on the SAME mini self-rendered campaign
dataset with the SAME config yaml, then evaluates each with its own
harness on the held-out campaign_valid subject. Per-op/per-model/
per-trajectory parity is pinned elsewhere (tests/test_reference_parity*);
this is the end-to-end OUTCOME comparison: two independent training
systems converging to matching eval numbers on identical data.

Reference entrypoints are executed unmodified via runpy with CPU shims
installed process-globally first (tests/refshim.py stubs + identity DDP,
no-op process groups, CPU `.to`, single-rank DistributedSampler) and two
documented runtime injections:
  * campaign_{train,valid} subset policies added to the reference's
    hm36._sample_dataset (the same policies this repo added to its own
    data/hm36.py — the reference enumerates 150 fixed H36M folders and
    would otherwise require rendering all of them);
  * the humanoid SMPL assets written as the chumpy-pickle format the
    reference's smplpytorch deserializes (serialization.py:1-39).

Both frameworks read the same on-disk dataset and — by pickle-cache
interop — the same cached sample db, so the data is identical by
construction; seeds, LR schedule, batch size, and loss menu match; data
ORDER and parameter init are framework-native (that is the point of a
convergence comparison, unlike the step-matched trajectory test).

Usage:
  python scripts/convergence_parity.py --stage all [--smoke]
Stages: render | torch | jax | report (idempotent; artifacts under
data/convergence_mini, log/convergence, benchmarks/convergence_parity.md)
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data", "convergence_mini")
LOG = os.path.join(ROOT, "log", "convergence")
REPORT = os.path.join(ROOT, "benchmarks", "convergence_parity.md")
CFG = os.path.join(LOG, "parity_s1.yaml")

sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def build_config(smoke: bool) -> str:
    """One yaml consumed verbatim by BOTH frameworks (reference-schema)."""
    import yaml

    cfg = {
        "dataset_params": {
            "dataset": {
                "name": "hm36",
                "path": os.path.join(DATA, "hm36"),
                "train_image_set": "campaign_train",
                "test_image_set": "campaign_valid",
                "sample_interval": 60,
                "extra_param": "",
            },
            "dataiter": {"mean": [0.0, 0.0, 0.0],
                         "std": [255.0, 255.0, 255.0]},
            "smpl_pseudo_img": {
                "use_flag": True,
                "use_mask": True,
                "data_path": os.path.join(DATA, "surreal_h36m_pose"),
            },
            "use_full_kp": False,
            "rm_bg": True,
            "cam_id_list": [0, 1, 2, 3],
            "geodesic_pt_list": [],
            "geodesic_param_list": [2, 1, 3, 20, 0.0],
        },
        "model_params": {
            "detector_params": {
                "name": "resnet_multi", "num_kp": 18, "depth_dim": 16,
                "num_hypo": 3, "neighbor_size": 7, "num_layers": 18,
            },
            "smpl_disc_params": {
                "name": "res_sage_gcn_decouple", "input_dim": 32,
                "hidden_dim": 32, "output_dim": 32, "num_node": 18,
                "disc_sup_dim": 3, "num_layers": 2,
                "use_self_loop": True, "use_pe": True,
            },
            "smpl_layer_params": {
                "model_path": os.path.join(DATA, "smpl_models"),
            },
            "physique_mask_generator_params": {"layers": [8, 16]},
            "parent_ids": [0, 0, 1, 2, 0, 4, 5, 0, 17, 8, 9, 17, 11, 12,
                           17, 14, 15, 7],
            "child_ids": list(range(18)),
            "flip_pairs": [[1, 4], [2, 5], [3, 6], [14, 11], [15, 12],
                           [16, 13]],
            "line_select_ids": list(range(17)),
            "body_width": 3.0,
            # S1 recipe: pseudo-supervision only (campaign S1 menu);
            # disc present-but-zero exactly like Campaign_XL_SurS1
            "loss_config": {
                "recons_loss": {"use_dis_map": True, "weight": 0.0},
                "physique_recons_loss": {"use_dis_map": True,
                                         "weight": 0.0},
                "smpl_pseudo_img_loss": {"weight": 3.0},
                "smpl_disc_loss": {"weight": 0.0, "update_interval": 1},
            },
        },
        "train_params": {
            "num_epochs": 1 if smoke else 10,
            "batch_size": 8,
            "epoch_milestones": [8],
            "lr_kp_detector": 2.0e-4,
            "lr_discriminator": 2.0e-4,
            "checkpoint_freq": 1000,  # ref saves last epoch regardless
            "patch_width": 64,
            "patch_height": 64,
            "rect_3d_width": 2000,
            "rect_3d_height": 2000,
            "aug": {"scale_factor": 0.0, "rot_factor": 0,
                    "color_factor": 0.0, "rot_aug_rate": 0.0,
                    "flip_aug_rate": 0.0, "do_flip_aug": False},
            "log_interval": 10,
        },
    }
    os.makedirs(LOG, exist_ok=True)
    with open(CFG, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return CFG


def write_reference_smpl_pkl(smpl_root: str) -> None:
    """The humanoid SMPL assets in the chumpy-pickle format the
    reference's smplpytorch loads (reference serialization.py:1-39):
    plain numpy arrays + a scipy-sparse J_regressor; the refshim chumpy
    stub wraps them at load time."""
    import numpy as np
    import scipy.sparse as sp

    src = np.load(os.path.join(smpl_root, "smpl_female.npz"))
    parents = np.asarray(src["kintree_parents"], np.int64)
    dd = {
        "v_template": np.asarray(src["v_template"], np.float64),
        "shapedirs": np.asarray(src["shapedirs"], np.float64),
        "posedirs": np.asarray(src["posedirs"], np.float64),
        "J_regressor": sp.csc_matrix(
            np.asarray(src["j_regressor"], np.float64)
        ),
        "weights": np.asarray(src["weights"], np.float64),
        "kintree_table": np.stack(
            [parents, np.arange(len(parents), dtype=np.int64)]
        ),
        "f": np.asarray(src["faces"], np.int64),
        "bs_type": "lrotmin",
        "bs_style": "lbs",
    }
    path = os.path.join(
        smpl_root, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"
    )
    with open(path, "wb") as f:
        pickle.dump(dd, f, protocol=2)
    print(f"wrote reference-format SMPL pkl: {path}")


def _render_complete_at_scale(frames: int) -> bool:
    """True iff the existing render matches the requested per-folder
    frame count. A smoke run leaves a 2-frame manifest behind; without
    this check a later full run would silently train on it (the exact
    failure round 5 hit)."""
    path = os.path.join(DATA, "manifest.json")
    if not os.path.isfile(path):
        return False
    import json

    folders = json.load(open(path)).get("data", {}).get("hm36", {})
    return bool(folders) and all(
        f.get("frames") == frames for f in folders.values()
    )


def stage_render(smoke: bool) -> None:
    frames = 2 if smoke else 24
    if _render_complete_at_scale(frames):
        print(f"render: already complete at {frames} frames/folder")
    else:
        if os.path.isfile(os.path.join(DATA, "manifest.json")):
            print(f"render: exists at the WRONG scale; re-rendering "
                  f"{DATA} at {frames} frames/folder")
            import shutil

            shutil.rmtree(DATA)
        scale = (
            ["--train_frames", "2", "--valid_frames", "2",
             "--pseudo_segments", "2", "--pseudo_frames", "8",
             "--sample_times", "2"]
            if smoke else
            ["--train_frames", "24", "--valid_frames", "24",
             "--pseudo_segments", "24", "--pseudo_frames", "24",
             "--sample_times", "6"]
        )
        subprocess.run(
            [sys.executable, "-m",
             "x_as_supervision_tpu.tools.render_campaign",
             "--out", DATA, "--img_size", "192", "--seed", "123",
             "--platform", "cpu", "--train_set", "campaign_train",
             "--valid_set", "campaign_valid"] + scale,
            check=True, cwd=ROOT,
        )
    write_reference_smpl_pkl(os.path.join(DATA, "smpl_models"))


def _install_reference_shims():
    """Process-global CPU shims, then load the reference via refshim."""
    os.environ["LOCAL_RANK"] = "0"
    os.environ["WORLD_SIZE"] = "1"

    import refshim

    refshim.load_reference()

    import torch
    import torch.distributed as dist
    from torch.utils.data.distributed import (
        DistributedSampler as TorchDistributedSampler,
    )

    class FakeDDP(torch.nn.Module):
        def __init__(self, module, device_ids=None):
            super().__init__()
            self.module = module

        def forward(self, *a, **k):
            return self.module(*a, **k)

    class SingleRankSampler(TorchDistributedSampler):
        def __init__(self, dataset, shuffle=True, **kw):
            super().__init__(dataset, num_replicas=1, rank=0,
                             shuffle=shuffle)

    dist.init_process_group = lambda *a, **k: None
    dist.destroy_process_group = lambda *a, **k: None
    torch.cuda.set_device = lambda *a, **k: None
    torch.nn.parallel.DistributedDataParallel = FakeDDP
    import torch.utils.data.distributed as tdd

    tdd.DistributedSampler = SingleRankSampler

    # `.to(0)` must stay on CPU (reference Trainer/Eval use integer
    # gpu ids unconditionally)
    mod_to, ten_to = torch.nn.Module.to, torch.Tensor.to
    torch.nn.Module.to = lambda self, *a, **k: (
        self if (a and isinstance(a[0], int)) else mod_to(self, *a, **k)
    )
    torch.Tensor.to = lambda self, *a, **k: (
        self if (a and isinstance(a[0], int) and not k)
        else ten_to(self, *a, **k)
    )

    # campaign subset policies, injected exactly as this repo added them
    # to its own data/hm36.py (12 train folders of subject 0, 6 valid
    # folders of subject 5, every frame)
    import human_utils.dataset.hm36 as ref_hm36

    orig = ref_hm36._sample_dataset

    def _sample_dataset(name):
        if name == "campaign_train":
            return ref_hm36._AllHuman36Folders([0]), -1, 1, 0, 12
        if name == "campaign_valid":
            return ref_hm36._AllHuman36Folders([5]), -1, 1, 0, 6
        return orig(name)

    ref_hm36._sample_dataset = _sample_dataset


def stage_torch(workers: int) -> None:
    result = os.path.join(LOG, "ref", "eval", "eval_result.txt")
    if os.path.isfile(result):
        print("torch: already complete")
        return
    _install_reference_shims()

    import runpy

    ref_log = os.path.join(LOG, "ref_runs")
    os.chdir("/root/reference")
    sys.argv = [
        "train.py", "--config", CFG, "--log_dir", ref_log,
        "--seed", "0", "--worker", str(workers),
    ]
    print("running reference train.py ...", flush=True)
    runpy.run_path("/root/reference/train.py", run_name="__main__")

    runs = sorted(glob.glob(os.path.join(ref_log, "*/")),
                  key=os.path.getmtime)
    ckpts = sorted(glob.glob(os.path.join(runs[-1], "*_ckpt.pth.tar")))
    print(f"reference checkpoint: {ckpts[-1]}", flush=True)

    sys.argv = [
        "eval.py", "--config", CFG, "--checkpoint", ckpts[-1],
        "--worker", str(workers), "--multi_hypo", "best",
    ]
    print("running reference eval.py ...", flush=True)
    runpy.run_path("/root/reference/eval.py", run_name="__main__")
    os.chdir(ROOT)

    src = os.path.join(runs[-1], "eval", "eval_result.txt")
    os.makedirs(os.path.dirname(result), exist_ok=True)
    with open(src) as f, open(result, "w") as g:
        g.write(f.read())
    print(f"torch eval result -> {result}")


def stage_jax(workers: int) -> None:
    result = os.path.join(LOG, "jax", "eval_result.txt")
    if os.path.isfile(result):
        print("jax: already complete")
        return
    jax_log = os.path.join(LOG, "jax_runs")
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    subprocess.run(
        [sys.executable, "train.py", "--config", CFG, "--seed", "0",
         "--worker", str(workers), "--log_dir", jax_log,
         "--platform", "cpu"],
        check=True, cwd=ROOT, env=env,
    )
    runs = sorted(glob.glob(os.path.join(jax_log, "*/")),
                  key=os.path.getmtime)
    ckpts = sorted(glob.glob(os.path.join(runs[-1], "*_ckpt")))
    subprocess.run(
        [sys.executable, "eval.py", "--config", CFG,
         "--checkpoint", ckpts[-1], "--multi_hypo", "best",
         "--platform", "cpu"],
        check=True, cwd=ROOT, env=env,
    )
    os.makedirs(os.path.dirname(result), exist_ok=True)
    with open(os.path.join(runs[-1], "eval", "eval_result.txt")) as f, \
            open(result, "w") as g:
        g.write(f.read())
    print(f"jax eval result -> {result}")


def _parse_eval(path: str) -> dict[str, float]:
    out, select = {}, False
    for line in open(path):
        if "select" in line:
            select = True
            continue
        m = re.match(r"([A-Za-z0-9 -]+):\s*([0-9.eE+-]+)", line.strip())
        if m and not select:
            out[m.group(1).strip()] = float(m.group(2))
    return out


def stage_report() -> None:
    ref = _parse_eval(os.path.join(LOG, "ref", "eval", "eval_result.txt"))
    ours = _parse_eval(os.path.join(LOG, "jax", "eval_result.txt"))
    rows = []
    for k in ref:
        if k in ours and ref[k]:
            rel = (ours[k] - ref[k]) / abs(ref[k]) * 100.0
            rows.append((k, ref[k], ours[k], rel))
    lines = [
        "# Cross-framework convergence parity (mini, self-rendered)",
        "",
        "The actual torch reference (train.py + eval.py via runpy, CPU"
        " shims) and this framework trained on the SAME mini campaign"
        " render with the SAME config (S1 pseudo-supervision recipe,"
        " ResNet-18, 64px patches, 10 epochs, seed 0), each evaluated"
        " with its own harness on held-out campaign_valid. Init and data"
        " order are framework-native; data, losses, schedule identical."
        " Driver: scripts/convergence_parity.py.",
        "",
        "| metric | torch reference | this framework | rel. diff |",
        "|---|---|---|---|",
    ]
    for k, r, o, d in rows:
        lines.append(f"| {k} | {r:.3f} | {o:.3f} | {d:+.1f}% |")
    with open(REPORT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="all",
                   choices=["all", "render", "torch", "jax", "report"])
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--worker", type=int, default=2)
    args = p.parse_args()

    build_config(args.smoke)
    if args.stage in ("all", "render"):
        stage_render(args.smoke)
    if args.stage in ("all", "jax"):
        stage_jax(args.worker)
    if args.stage in ("all", "torch"):
        stage_torch(args.worker)
    if args.stage in ("all", "report"):
        stage_report()


if __name__ == "__main__":
    main()
