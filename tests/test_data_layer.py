"""End-to-end data-layer test on a synthetic on-disk mini-H36M: writes
matlab_meta.txt annotation files + jpg frames + SAM masks, builds the index
db (parser, projection, crop box, pickle cache), runs the patch pipeline
(affine crop, mask warp, geodesic), and collates batches."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from x_as_supervision_tpu.data import hm36 as H
from x_as_supervision_tpu.data.loader import BatchLoader
from x_as_supervision_tpu.data.pipeline import hm36_Dataset

IMG_W, IMG_H = 640, 640
N_FRAMES = 4


def _write_meta(path, kps_world, rot, trans, fl, c_p):
    """matlab_meta.txt in the reference's line format
    (reference: human_utils/dataset/hm36.py:60-98)."""
    lines = [str(N_FRAMES)]
    lines.append("size %d %d" % (IMG_W, IMG_H))
    # file stores R transposed (the parser re-transposes)
    lines.append("rot " + " ".join(str(v) for v in rot.T.flatten()))
    lines.append("trans " + " ".join(str(v) for v in trans))
    lines.append("fl " + " ".join(str(v) for v in fl))
    lines.append("cp " + " ".join(str(v) for v in c_p))
    lines.append("kp 0 0 0")
    lines.append("pp 0 0")
    jt_list = [1, 2, 3, 4, 7, 8, 9, 13, 14, 15, 16, 18, 19, 20, 26, 27, 28]
    lines.append("jt " + " ".join(str(v) for v in jt_list))
    for f in range(N_FRAMES):
        vals = kps_world[f].flatten()
        lines.append("kp " + " ".join("%.4f" % v for v in vals))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def mini_h36m(tmp_path_factory):
    base = tmp_path_factory.mktemp("data")
    root = base / "hm36"  # the SAM-mask path rewrite keys on 'hm36/images'
    root.mkdir()
    rng = np.random.default_rng(0)

    folder = "s_09_act_02_subact_01"
    # one pose sequence in world coords (mm), around origin
    kps32 = rng.normal(scale=300.0, size=(N_FRAMES, 32, 3))
    kps32[..., 2] *= 0.3

    cams = []
    for cam in range(4):
        angle = cam * np.pi / 2 + 0.3
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        trans = rot.T @ np.array([0.0, 0.0, -4000.0])  # camera 4m out
        fl = np.array([600.0, 600.0])
        c_p = np.array([IMG_W / 2, IMG_H / 2])
        cams.append((rot, trans, fl, c_p))

        cam_folder = f"{folder}_ca_{cam + 1:02d}"
        annot_dir = root / "annot" / cam_folder
        annot_dir.mkdir(parents=True)
        _write_meta(annot_dir / "matlab_meta.txt", kps32, rot, trans, fl, c_p)

        img_dir = root / "images" / cam_folder
        img_dir.mkdir(parents=True)
        mask_dir = str(img_dir).replace("hm36", "sam_masks/hm36", 1)
        # path rewrite keys on 'hm36/images' -> build parallel tree
    # write frames + masks
    for cam in range(4):
        cam_folder = f"{folder}_ca_{cam + 1:02d}"
        for f in range(N_FRAMES):
            name = "%s_%06d.jpg" % (cam_folder, f + 1)
            ipath = root / "images" / cam_folder / name
            img = (rng.uniform(0, 255, (IMG_H, IMG_W, 3))).astype(np.uint8)
            cv2.imwrite(str(ipath), img)
            mpath = str(ipath).replace("hm36/images", "sam_masks/hm36").replace(
                "jpg", "png"
            )
            os.makedirs(os.path.dirname(mpath), exist_ok=True)
            mask = np.zeros((IMG_H, IMG_W), np.uint8)
            cv2.circle(mask, (IMG_W // 2, IMG_H // 2), 150, 255, -1)
            cv2.imwrite(mpath, mask)
    return root


def test_hm36_index_and_pipeline(mini_h36m, monkeypatch):
    monkeypatch.setitem(
        H.SUBSET_POLICIES, "tiny", (-1, 1, 0, 1, [5])
    )

    def folders_one(subjects):
        return ["s_09_act_02_subact_01"]

    monkeypatch.setattr(H, "all_folders", folders_one)

    imdb = H.hm36("tiny", str(mini_h36m), 64, 64, 2000, 2000, "")
    db = imdb.gt_db()
    assert len(db) == N_FRAMES
    smp = db[0]["cam_0"]
    assert smp.joints_3d.shape == (18, 3)
    # pelvis-relative depth: root depth is 0
    np.testing.assert_allclose(smp.joints_3d[0, 2], 0.0, atol=1e-3)
    # crop box roughly centered on the projected pelvis
    assert 0 < smp.center_x < IMG_W and 0 < smp.center_y < IMG_H
    assert smp.width > 0

    # pickle cache round-trip
    db2 = H.hm36("tiny", str(mini_h36m), 64, 64, 2000, 2000, "").gt_db()
    assert len(db2) == len(db)

    ds = hm36_Dataset(
        [imdb], True, 64, 64, 2000, 2000,
        batch_size=2, mean=[0.0, 0.0, 0.0], std=[255.0, 255.0, 255.0],
        aug_config={"scale_factor": 0, "rot_factor": 0, "color_factor": 0,
                    "rot_aug_rate": 0, "flip_aug_rate": 0,
                    "do_flip_aug": False},
        label_func=None, cam_id_list=[0, 1, 2, 3], geodesic_pt_list=[],
        geodesic_param_list=[2, 1, 3, 20, 0.0], smpl_pseudo_img=None,
        rm_bg=True,
    )
    assert len(ds) % 2 == 0
    item = ds.sample(0)
    assert item["act"] == "act_02_subact_01"
    for cam in range(4):
        assert item[f"cam_{cam}_img"].shape == (64, 64, 3)
        assert item[f"cam_{cam}_mask"].shape == (64, 64, 1)
        assert item[f"cam_{cam}_geodesic_dis"].shape == (64, 64, 1)
        assert item[f"cam_{cam}_joints"].shape == (18, 3)
        assert item[f"cam_{cam}_trans_image"].shape == (2, 3)
        assert np.isfinite(item[f"cam_{cam}_img"]).all()

    # rm_bg: pixels with exactly-zero mask are zeroed (the warp's bilinear
    # edge band keeps fractional weights, like the reference)
    img, mask = item["cam_0_img"], item["cam_0_mask"]
    assert np.abs(img[mask[..., 0] == 0.0]).max() == 0.0
    assert (mask[..., 0] == 0.0).sum() > 0

    # joints consistent with the crop affine: pelvis lands near patch center
    pelvis_xy = item["cam_0_joints"][0, :2]
    assert np.all(np.abs(pelvis_xy - 32.0) < 16.0)

    # loader: epoch-sharded batches
    loader = BatchLoader(ds, batch_size=2, num_workers=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["cam_0_img"].shape == (2, 64, 64, 3)
    assert len(b["act"]) == 2

    # determinism: same epoch twice gives identical batches
    batches2 = list(loader.epoch(0))
    np.testing.assert_allclose(b["cam_0_img"], batches2[0]["cam_0_img"])
