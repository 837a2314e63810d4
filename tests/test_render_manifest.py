"""Reproducibility pin for the campaign renderer + manifest (VERDICT r4
weak #1): a rendered campaign dataset must be (a) recorded by a manifest
(render args + per-folder counts and content digests) and (b)
regenerate-or-reuse idempotent — deleting ANY subset of the dataset and
re-running the same render command converges to a bit-identical dataset,
because hm36 folders and pseudo segments are independently seeded and
skipped when already complete on disk.

This is the property the XL campaign (scripts/render_campaign_xl.sh)
relies on to make its committed eval numbers repeatable after the
round-4 artifacts were lost.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

RENDER = [
    sys.executable, "-m", "x_as_supervision_tpu.tools.render_campaign",
    "--train_frames", "2", "--valid_frames", "2",
    "--pseudo_segments", "3", "--pseudo_frames", "6",
    "--sample_times", "2", "--img_size", "64", "--seed", "7",
    "--platform", "cpu",
    "--train_set", "campaign_train", "--valid_set", "campaign_valid",
]


def _run(cmd):
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=os.getcwd(), timeout=1200,
        env={**os.environ, "XLA_FLAGS": ""},
    )
    assert out.returncode == 0, (
        f"{' '.join(cmd)} rc={out.returncode}\n"
        f"stdout: {out.stdout[-2000:]}\nstderr: {out.stderr[-3000:]}"
    )
    return out


def _check(root, ref):
    return subprocess.run(
        [sys.executable, "-m",
         "x_as_supervision_tpu.tools.campaign_manifest", root,
         "--check", "--manifest", ref],
        capture_output=True, text=True, cwd=os.getcwd(), timeout=600,
        env={**os.environ, "XLA_FLAGS": ""},
    )


@pytest.mark.slow
def test_render_is_regenerate_or_reuse_idempotent(tmp_path):
    root = str(tmp_path / "data")
    _run(RENDER + ["--out", root])

    manifest = os.path.join(root, "manifest.json")
    with open(manifest) as f:
        recorded = json.load(f)
    assert recorded["render_args"]["seed"] == 7
    hm36 = recorded["data"]["hm36"]
    assert len(hm36) == (12 + 6) * 4  # train+valid folders x 4 cams
    assert all(e["frames"] == 2 and e["masks"] == 2 for e in hm36.values())
    pseudo = recorded["data"]["pseudo"]
    assert pseudo["frames"] == pseudo["masks"] == pseudo["joint_files"]
    assert pseudo["frames"] > 0

    ref = str(tmp_path / "manifest_ref.json")
    shutil.copy(manifest, ref)

    # damage the dataset the three distinct ways a real interruption can:
    # a partially-rendered hm36 folder (one cam's last mask missing), a
    # half-written pseudo segment (sentinel info.mat absent), and a lost
    # constructor sweep (the all-or-nothing pseudo output dir)
    victim = sorted(hm36)[5]
    os.remove(os.path.join(
        root, "sam_masks", "hm36", victim, f"{victim}_000002.png"
    ))
    seg = os.path.join(root, "surreal", "train", "run1", "seq1")
    os.remove(os.path.join(seg, "seg1_info.mat"))
    shutil.rmtree(os.path.join(root, "surreal_h36m_pose"))

    out = _run(RENDER + ["--out", root]).stdout
    assert "skipping" in out  # reuse path exercised, not a full re-render

    res = _check(root, ref)
    assert res.returncode == 0, (
        f"regenerated dataset diverged:\n{res.stdout}\n{res.stderr}"
    )


@pytest.mark.slow
def test_manifest_check_catches_divergence(tmp_path):
    root = str(tmp_path / "data")
    _run(RENDER + ["--out", root])
    ref = str(tmp_path / "manifest_ref.json")
    shutil.copy(os.path.join(root, "manifest.json"), ref)

    # silently corrupt one annotation file: counts stay right, bytes don't
    meta = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(root, "hm36", "annot"))
        for f in fs
    )[0]
    with open(meta, "a") as f:
        f.write("\n")
    res = _check(root, ref)
    assert res.returncode != 0
    assert "mismatch" in res.stdout
