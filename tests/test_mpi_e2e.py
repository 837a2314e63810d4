"""End-to-end MPI-INF-3DHP fixture test: an on-disk MPI-shaped dataset
(2048^2 frames, red-channel SAM masks, chair/exposure masks, annot.mat,
camera.calibration) driven through gt_db() -> mpi_inf_3dhp_Dataset -> a
jitted generator forward, exercising the MPI-only mask semantics
(red-channel read + Gaussian-blur threshold, data/pipeline.py:64-67,92-94)
the way test_data_layer.py does for H36M.

Reference: human_utils/dataset/mpi_inf_3dhp.py (db build + filters),
human_utils/dataloader/dataloader.py:31-36,64-91 (mask rewrite + blur).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
sio = pytest.importorskip("scipy.io")

import jax  # noqa: E402

from x_as_supervision_tpu.data import mpi_inf_3dhp as M  # noqa: E402
from x_as_supervision_tpu.data.pipeline import mpi_inf_3dhp_Dataset  # noqa: E402

IMG = 2048  # INDOOR_IMAGE_RESOLUTION
N_FRAMES = 3
CAMS = M.USE_MPI_VIDEO_IDX  # [0, 2, 4, 7, 8]


def _calibration_text(intr, extr):
    lines = []
    for cam_id in range(M.TOTAL_MPI_VIDEO_NUM):
        fx, fy, cx, cy = intr[cam_id]
        ex = extr[cam_id].flatten()
        lines.append(f"name          {cam_id}")
        lines.append("  sensor      10 10")
        lines.append("  size        2048 2048")
        lines.append("  animated    0")
        lines.append(
            "  intrinsic   "
            + " ".join(str(v) for v in
                       [fx, 0, cx, 0, 0, fy, cy, 0, 0, 0, 1, 0, 0, 0, 0, 1])
        )
        lines.append("  extrinsic   " + " ".join(str(v) for v in ex))
        lines.append("  radial      0")
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def mini_mpi(tmp_path_factory):
    base = tmp_path_factory.mktemp("data")
    root = base / "mpi_inf_3dhp"  # the SAM-mask rewrite keys on this name
    seq = root / "S1" / "Seq1"
    rng = np.random.default_rng(4)

    # world 28-joint poses (mm) around the origin
    kps_w = rng.normal(scale=250.0, size=(N_FRAMES, M.MPI_JT_NUM, 3))
    kps_w[..., 2] *= 0.3

    intr = [[1500.0, 1500.0, IMG / 2, IMG / 2]] * M.TOTAL_MPI_VIDEO_NUM
    extr = []
    for cam_id in range(M.TOTAL_MPI_VIDEO_NUM):
        ang = cam_id * 0.37
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])
        pelvis_w = kps_w[:, M.MPI_TRAIN_ROOT_JT_IDX].mean(axis=0)
        t = np.array([0.0, 0.0, 4000.0]) - rot @ pelvis_w
        ex = np.eye(4)
        ex[:3, :3] = rot
        ex[:3, 3] = t
        extr.append(ex)

    # annot3: (14, 1) object array of (n_frames, 84) camera-frame joints
    annot3 = np.empty((M.TOTAL_MPI_VIDEO_NUM, 1), dtype=object)
    for cam_id in range(M.TOTAL_MPI_VIDEO_NUM):
        rot, t = extr[cam_id][:3, :3], extr[cam_id][:3, 3]
        cam_kps = kps_w @ rot.T + t
        annot3[cam_id, 0] = cam_kps.reshape(N_FRAMES, -1)

    os.makedirs(seq)
    sio.savemat(str(seq / "annot.mat"), {"annot3": annot3})
    with open(seq / "camera.calibration", "w") as fh:
        fh.write(_calibration_text(intr, extr))

    for vid in CAMS:
        img_dir = seq / "images" / f"video_{vid}"
        exposure_dir = seq / "masks" / f"video_{vid}"
        chair_dir = seq / "chair_masks" / f"video_{vid}"
        sam_dir = (base / "sam_masks" / "mpi_inf_3dhp" / "S1" / "Seq1"
                   / "masks" / f"video_{vid}")
        for d in (img_dir, exposure_dir, chair_dir, sam_dir):
            os.makedirs(d)
        rot, t = extr[vid][:3, :3], extr[vid][:3, 3]
        fx, fy, cx, cy = intr[vid]
        for f in range(N_FRAMES):
            cam_kps = kps_w[f] @ rot.T + t
            u = (cam_kps[:, 0] / cam_kps[:, 2] * fx + cx).astype(int)
            v = (cam_kps[:, 1] / cam_kps[:, 2] * fy + cy).astype(int)

            body = np.zeros((IMG, IMG), np.uint8)
            for j, p in enumerate(M.MPI_PARENT_IDS):
                cv2.line(body, (u[j], v[j]), (u[p], v[p]), 255, 20)
            img = np.dstack([body // 2, body // 3, body]).astype(np.uint8)
            img += rng.integers(0, 20, img.shape, dtype=np.uint8)

            name = "frame_%06d.jpg" % (f + 1)
            cv2.imwrite(str(img_dir / name), img)
            # exposure-check mask (red channel, body area well under 85%)
            cv2.imwrite(str(exposure_dir / name),
                        np.dstack([body * 0, body * 0, body]))
            # chair mask: all white -> no joints flagged occluded
            cv2.imwrite(str(chair_dir / name),
                        np.full((IMG, IMG, 3), 255, np.uint8))
            # SAM mask read by the patch pipeline (red channel)
            cv2.imwrite(str(sam_dir / name),
                        np.dstack([body * 0, body * 0, body]))
    return root


def test_mpi_gt_db_and_pipeline(mini_mpi, monkeypatch):
    monkeypatch.setattr(M, "MPI_SEQ_IDX", [1])
    monkeypatch.setitem(M.SUBSET_POLICIES, "tiny", (-1, 1, [1]))

    imdb = M.mpi_inf_3dhp("tiny", str(mini_mpi), 64, 64, 2000, 2000, "")
    db = imdb.gt_db()
    assert len(db) == N_FRAMES
    smp = db[0]["cam_0"]
    assert smp.joints_3d.shape == (M.MPI_JT_NUM, 3)
    np.testing.assert_allclose(
        smp.joints_3d[M.MPI_TRAIN_ROOT_JT_IDX, 2], 0.0, atol=1e-3
    )
    assert smp.width > 0 and 0 < smp.center_x < IMG

    # pickle cache round-trip
    assert len(M.mpi_inf_3dhp("tiny", str(mini_mpi), 64, 64, 2000, 2000,
                              "").gt_db()) == N_FRAMES

    ds = mpi_inf_3dhp_Dataset(
        [imdb], True, 64, 64, 2000, 2000,
        batch_size=2, mean=[0.0, 0.0, 0.0], std=[255.0, 255.0, 255.0],
        aug_config={"scale_factor": 0, "rot_factor": 0, "color_factor": 0,
                    "rot_aug_rate": 0, "flip_aug_rate": 0,
                    "do_flip_aug": False},
        label_func=None, cam_id_list=list(CAMS), geodesic_pt_list=[],
        geodesic_param_list=[2, 1, 3, 20, 0.0], smpl_pseudo_img=None,
        rm_bg=True,
    )
    # convert_to_17kps default: 28 -> 18 H36M joints
    item = ds.sample(0)
    for vid in CAMS:
        ck = f"cam_{vid}"
        assert item[f"{ck}_img"].shape == (64, 64, 3)
        assert item[f"{ck}_joints"].shape == (18, 3)
        mask = item[f"{ck}_mask"]
        assert mask.shape == (64, 64, 1)
        # MPI mask path: red channel + Gaussian blur + binary threshold ->
        # strictly {0, 1} after the /255 normalization (pipeline.py:92-94)
        assert set(np.unique(mask)).issubset({0.0, 1.0})
        assert 0 < mask.sum() < mask.size
        # the body pixels survive into the patch: joints land on the mask
        px = item[f"{ck}_joints"][:, 0].astype(int).clip(0, 63)
        py = item[f"{ck}_joints"][:, 1].astype(int).clip(0, 63)
        assert (mask[py, px, 0] > 0).sum() >= 14
        assert np.isfinite(item[f"{ck}_geodesic_dis"]).all()

    # device path: one jitted generator forward on a collated MPI batch
    import jax.numpy as jnp

    from x_as_supervision_tpu.models import composed as C
    from x_as_supervision_tpu.models.detector import build_detector
    from x_as_supervision_tpu.models.physique import PhysiqueMaskGenerator

    batch = ds.batch_from_indices([0, 1])
    model_params = {
        "cam_id_list": list(CAMS),
        "parent_ids": [0, 0, 1, 2, 0, 4, 5, 0, 17, 8, 9, 17, 11, 12, 17, 14,
                       15, 7],
        "line_select_ids": list(range(17)),
        "body_width": 3.0,
        "loss_config": {
            "recons_loss": {"use_dis_map": False, "weight": 0.02},
            "physique_recons_loss": {"use_dis_map": True, "weight": 0.02},
            "symmetry_loss": {"weight": {"bone": 0.1, "kp": 0.1}},
        },
        "smpl_disc_params": {"disc_sup_dim": 3},
        "remat": False,
    }
    det = build_detector({"name": "resnet_multi", "num_kp": 18,
                          "depth_dim": 8, "num_hypo": 2, "neighbor_size": 3,
                          "num_layers": 18})
    phys = PhysiqueMaskGenerator(num_features=(4, 8))
    spec = C.GanSpec.from_config(model_params, det, None, phys)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    det_vars = det.init(jax.random.PRNGKey(0), jb["cam_0_img"])
    phys_vars = phys.init(jax.random.PRNGKey(1), jb["cam_0_mask"])
    losses, outputs, _, _ = C.generator_forward(
        spec, det_vars, phys_vars, None, jb, jax.random.PRNGKey(2),
        train=True,
    )
    assert set(losses) == {"reconstruction", "physique_recons", "symmetry"}
    for name, val in losses.items():
        assert np.isfinite(float(val)), name
