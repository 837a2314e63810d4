"""MPI-INF-3DHP and MPII index builders on tiny synthetic on-disk fixtures
(annot.mat / camera.calibration / annot json / gt mat in the real formats)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from scipy.io import savemat

from x_as_supervision_tpu.data import mpi_inf_3dhp as MPI
from x_as_supervision_tpu.data import mpii as MPII

N_FRAMES = 3
RES = 512  # small stand-in for 2048x2048


def _calibration_text():
    lines = []
    for cam in range(MPI.TOTAL_MPI_VIDEO_NUM):
        lines += [
            f"name          {cam}",
            "  sensor      10 10",
            "  size        2048 2048",
            "  animated    0",
            "  intrinsic   500 0 256 0 0 500 256 0 0 0 1 0 0 0 0 1",
            "  extrinsic   1 0 0 100 0 1 0 200 0 0 1 300 0 0 0 1",
        ]
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def mini_mpi(tmp_path_factory, monkeypatch=None):
    root = tmp_path_factory.mktemp("mpidata") / "mpi_inf_3dhp"
    rng = np.random.default_rng(0)
    for subject in (1,):
        for seq in MPI.MPI_SEQ_IDX:
            base = root / f"S{subject}" / f"Seq{seq}"
            # camera-frame 28-joint poses ~3m in front of every camera
            pose = rng.normal(scale=200.0, size=(N_FRAMES, 28, 3))
            pose[..., 2] += 3000
            annot3 = np.empty((MPI.TOTAL_MPI_VIDEO_NUM, 1), object)
            annot2 = np.empty((MPI.TOTAL_MPI_VIDEO_NUM, 1), object)
            for cam in range(MPI.TOTAL_MPI_VIDEO_NUM):
                annot3[cam, 0] = pose.reshape(N_FRAMES, -1)
                annot2[cam, 0] = pose[..., :2].reshape(N_FRAMES, -1)
            base.mkdir(parents=True)
            savemat(base / "annot.mat", {"annot2": annot2, "annot3": annot3})
            (base / "camera.calibration").write_text(_calibration_text())
            for cam in MPI.USE_MPI_VIDEO_IDX:
                for sub in ("images", "masks", "chair_masks"):
                    d = base / sub / f"video_{cam}"
                    d.mkdir(parents=True)
                for f in range(N_FRAMES):
                    name = "frame_%06d.jpg" % (f + 1)
                    img = rng.uniform(0, 255, (RES, RES, 3)).astype(np.uint8)
                    cv2.imwrite(str(base / "images" / f"video_{cam}" / name), img)
                    person = np.zeros((RES, RES, 3), np.uint8)
                    cv2.circle(person, (RES // 2, RES // 2), 60, (255,) * 3, -1)
                    cv2.imwrite(str(base / "masks" / f"video_{cam}" / name), person)
                    chair = np.full((RES, RES, 3), 255, np.uint8)
                    cv2.imwrite(
                        str(base / "chair_masks" / f"video_{cam}" / name), chair
                    )
    return root


def test_mpi_calibration_parser(mini_mpi):
    intr, extr = MPI.parse_camera_calibration(
        str(mini_mpi / "S1" / "Seq1" / "camera.calibration")
    )
    assert intr[0] == [500.0, 500.0, 256.0, 256.0]
    np.testing.assert_allclose(extr[0][:3, 3], [100, 200, 300])


def test_mpi_gt_db(mini_mpi, monkeypatch):
    # image bounds check uses the full-res constant; shrink for the fixture
    monkeypatch.setattr(MPI, "INDOOR_IMAGE_RESOLUTION", [RES, RES])
    monkeypatch.setitem(MPI.SUBSET_POLICIES, "tinytest", (-1, -1, [1]))
    imdb = MPI.mpi_inf_3dhp("tinytest", str(mini_mpi), 64, 64, 2000, 2000, "")
    db = imdb.gt_db()
    # pelvis (joint 4) at z~3000, fl 500 -> all joints near the 512 center;
    # off-image joints would drop frames
    assert len(db) > 0
    smp = db[0][f"cam_{MPI.USE_MPI_VIDEO_IDX[0]}"]
    assert smp.joints_3d.shape == (28, 3)
    np.testing.assert_allclose(smp.joints_3d[MPI.MPI_TRAIN_ROOT_JT_IDX, 2],
                               0.0, atol=1e-3)
    assert smp.fl[0] == 500.0
    # 28 -> 18 remap
    MPI.from_mpi_inf_3dhp_to_hm36(db)
    assert db[0][f"cam_{MPI.USE_MPI_VIDEO_IDX[0]}"].joints_3d.shape == (18, 3)


@pytest.fixture(scope="module")
def mini_mpii(tmp_path_factory):
    root = tmp_path_factory.mktemp("mpiidata") / "mpii"
    (root / "annot").mkdir(parents=True)
    (root / "images").mkdir()
    masks = root.parent / "mpii_masks"
    masks.mkdir()
    rng = np.random.default_rng(1)

    anno = []
    n = 4
    for i in range(n):
        img = f"im{i:04d}.jpg"
        frame = rng.uniform(0, 255, (300, 300, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "images" / img), frame)
        mask = np.zeros((300, 300, 3), np.uint8)
        cv2.circle(mask, (150, 150), 60, (255,) * 3, -1)
        cv2.imwrite(str(masks / img), mask)
        joints = (rng.uniform(80, 220, (16, 2))).tolist()
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
    headboxes[1] = 50.0  # head size = 50 * SC_BIAS
    savemat(root / "annot" / "mpii_gt_valid.mat", {"headboxes_src": headboxes})
    return root, masks


def test_mpii_gt_db(mini_mpii):
    root, masks = mini_mpii
    imdb = MPII.mpii("valid", str(root), str(masks), 256, 256, "")
    db = imdb.gt_db()
    assert len(db) == 4
    smp = db[0]["cam_mono"]
    assert smp.joints_3d.shape == (16, 3)
    # head size = ||(50,50)|| * 0.6
    np.testing.assert_allclose(
        smp.head_size, np.linalg.norm([50, 50]) * 0.6, rtol=1e-6
    )
    # box: scale*200*1.25 shrunk to aspect 1 -> 250 wide
    np.testing.assert_allclose(smp.width, 250.0)
