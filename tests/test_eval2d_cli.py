"""eval2d.py (MPII PCKh) — protocol validation + CLI e2e.

The reference dispatches MPII configs to an off-repo eval2d.py
(reference scripts/eval.sh:25-28), so the protocol here is a documented
reconstruction; these tests pin it two ways:

  * evaluate_pckh protocol unit tests with a stub detector whose outputs
    are derived from the GT: exact-GT predictions score PCKh 100% through
    the full chain (normalized->patch->MPII reorder->L/R switch->inverse
    crop affine->head-size threshold); fully L/R-swapped predictions are
    rescued by the switch; shifts beyond 0.5*head_size score 0; the
    'best' gather recovers GT from a noise hypothesis.
  * the real CLI on an on-disk mini MPII (images + annot json + gt .mat
    headboxes, reference human_utils/dataset/mpii.py:64-76 format) with a
    randomly initialized checkpoint -> finite PCKh in [0, 100] and the
    eval2d_result.txt artifact.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")
sio = pytest.importorskip("scipy.io")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from x_as_supervision_tpu.data.hm36 import S_HM36_2_MPII_JT  # noqa: E402
from x_as_supervision_tpu.data.mpii import (  # noqa: E402
    MPII_FLIP_PAIRS,
    SC_BIAS,
    mpii as mpii_imdb,
)

PATCH = 64
HEAD_BOX = 50.0  # head size = ||(50, 50)|| * SC_BIAS


@pytest.fixture(scope="module")
def mini_mpii(tmp_path_factory):
    root = tmp_path_factory.mktemp("mpii2d") / "mpii"
    (root / "annot").mkdir(parents=True)
    (root / "images").mkdir()
    masks = root.parent / "mpii_masks"
    masks.mkdir()
    rng = np.random.default_rng(3)

    anno = []
    n = 8
    for i in range(n):
        img = f"im{i:04d}.jpg"
        frame = rng.uniform(0, 255, (300, 300, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "images" / img), frame)
        mask = np.zeros((300, 300, 3), np.uint8)
        cv2.circle(mask, (150, 150), 60, (255,) * 3, -1)
        cv2.imwrite(str(masks / img), mask)
        joints = rng.uniform(80, 220, (16, 2)).tolist()
        anno.append({
            "image": img,
            "center": [150.0, 150.0],
            "scale": 1.0,
            "joints": [[x, y] for x, y in joints],
            "joints_vis": [1] * 16,
        })
    with open(root / "annot" / "mpii_valid.json", "w") as f:
        json.dump(anno, f)
    headboxes = np.zeros((2, 2, n))
    headboxes[1] = HEAD_BOX
    sio.savemat(root / "annot" / "mpii_gt_valid.mat",
                {"headboxes_src": headboxes})
    return root, masks


@pytest.fixture(scope="module")
def mpii_ds(mini_mpii):
    from x_as_supervision_tpu.data.dataloader_2d import mpii_dataset

    root, masks = mini_mpii
    imdb = mpii_imdb("valid", str(root), str(masks), PATCH, PATCH, "")
    return mpii_dataset(imdb, patch_size=PATCH)


def _gt_as_pred(batch, num_hypo=1, swap_lr=False):
    """Detector-contract predictions (B, H, 18, 3) whose MPII projection
    equals the batch GT exactly (optionally fully L/R-swapped)."""
    gt16 = np.asarray(batch["cam_mono_joints"])[..., :2]  # patch px
    if swap_lr:
        perm = list(range(16))
        for a, b in MPII_FLIP_PAIRS:
            perm[a], perm[b] = perm[b], perm[a]
        gt16 = gt16[:, perm]
    b = gt16.shape[0]
    pred18 = np.zeros((b, 18, 2))
    for mpii_idx, hm_idx in enumerate(S_HM36_2_MPII_JT):
        pred18[:, hm_idx] = gt16[:, mpii_idx]
    norm = pred18 / (PATCH - 1) * 2 - 1
    kps = np.concatenate([norm, np.zeros_like(norm[..., :1])], -1)
    return np.tile(kps[:, None], (1, num_hypo, 1, 1))


def test_exact_gt_scores_one(mpii_ds):
    from eval2d import evaluate_pckh

    result = evaluate_pckh(
        mpii_ds, lambda imgs: _gt_as_pred(_CUR[0]), PATCH, 4, "confident"
    )
    assert result == pytest.approx(100.0)  # keypoint_pckh is a percentage


# evaluate_pckh calls forward_fn(imgs) without handing back the batch; the
# stub needs the batch's GT, so wrap the dataset to capture it.
_CUR = [None]


@pytest.fixture(autouse=True)
def _capture_batch(monkeypatch, mpii_ds):
    orig = mpii_ds.batch

    def capture(start, size):
        b = orig(start, size)
        _CUR[0] = b
        return b

    monkeypatch.setattr(mpii_ds, "batch", capture)


def test_swapped_gt_rescued_by_switch(mpii_ds):
    from eval2d import evaluate_pckh

    result = evaluate_pckh(
        mpii_ds, lambda imgs: _gt_as_pred(_CUR[0], swap_lr=True), PATCH, 4,
        "confident",
    )
    assert result == pytest.approx(100.0)


def test_shift_beyond_half_head_scores_zero(mpii_ds):
    from eval2d import evaluate_pckh

    # crop box is 250 original px wide -> patch px scale 250/PATCH. Shift
    # far beyond 0.5*head_size (threshold) AND beyond any joint-to-joint
    # distance, so the L/R switch cannot rescue a prediction either.
    head = np.hypot(HEAD_BOX, HEAD_BOX) * SC_BIAS
    shift_patch = 10.0 * head * PATCH / 250.0
    shift_norm = shift_patch / (PATCH - 1) * 2

    def fwd(imgs):
        kps = _gt_as_pred(_CUR[0])
        kps[..., 0] += shift_norm
        return kps

    result = evaluate_pckh(mpii_ds, fwd, PATCH, 4, "confident")
    assert result == pytest.approx(0.0)


def test_best_gather_recovers_gt_hypothesis(mpii_ds):
    from eval2d import evaluate_pckh

    def fwd(imgs):
        kps = _gt_as_pred(_CUR[0], num_hypo=3)
        kps[:, 0] += 0.9  # hypothesis 0 = garbage
        kps[:, 2] -= 0.7
        return kps  # hypothesis 1 = exact GT

    assert evaluate_pckh(mpii_ds, fwd, PATCH, 4, "best") == pytest.approx(100.0)
    assert evaluate_pckh(mpii_ds, fwd, PATCH, 4, "confident") < 50.0


def test_eval2d_cli_e2e(mini_mpii, tmp_path):
    """The real CLI end to end: config + random-weight checkpoint ->
    eval2d_result.txt with a finite PCKh in [0, 100]."""
    import jax

    from x_as_supervision_tpu.models.detector import build_detector
    from x_as_supervision_tpu.train.checkpoint import save_checkpoint

    root, masks = mini_mpii
    det_params = {
        "name": "resnet_multi", "num_kp": 18, "depth_dim": 16,
        "num_hypo": 2, "neighbor_size": 3, "num_layers": 18,
    }
    cfg = {
        "dataset_params": {
            "dataset": {"name": "mpii", "path": str(root),
                        "mask_path": str(masks), "test_image_set": "valid"},
            "dataiter": {"mean": [0.0] * 3, "std": [1.0] * 3},
            "cam_id_list": ["mono"],
            "geodesic_pt_list": [], "geodesic_param_list": [2, 1, 3, 20, 0.0],
        },
        "model_params": {
            "detector_params": det_params,
            "parent_ids": [0, 0, 1, 2, 0, 4, 5, 0, 17, 8, 9, 17, 11, 12, 17,
                           14, 15, 7],
            "child_ids": list(range(18)),
            "flip_pairs": [[1, 4], [2, 5], [3, 6], [14, 11], [15, 12],
                           [16, 13]],
            "line_select_ids": list(range(17)),
            "body_width": 3.0,
            "loss_config": {},
        },
        "train_params": {
            "num_epochs": 1, "batch_size": 2, "epoch_milestones": [],
            "lr_kp_detector": 0.0, "lr_discriminator": 0.0,
            "checkpoint_freq": 1, "patch_width": PATCH,
            "patch_height": PATCH, "rect_3d_width": 2000,
            "rect_3d_height": 2000,
        },
    }
    cfg_path = tmp_path / "mpii2d.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    det = build_detector(det_params)
    v = det.init(jax.random.PRNGKey(0),
                 np.zeros((1, PATCH, PATCH, 3), np.float32), train=False)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    ckpt_path = save_checkpoint(
        str(run_dir), 0,
        {"det_params": v["params"], "det_stats": v.get("batch_stats", {})},
    )

    env = {**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    out = subprocess.run(
        [sys.executable, "eval2d.py", "--config", str(cfg_path),
         "--checkpoint", ckpt_path, "--multi_hypo", "best",
         "--platform", "cpu"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    result_file = os.path.join(str(run_dir), "eval", "eval2d_result.txt")
    assert os.path.exists(result_file)
    line = open(result_file).read().strip()
    val = float(line.split(":")[1])
    assert np.isfinite(val) and 0.0 <= val <= 100.0, line
    assert "PCKh@0.5" in line
