"""Mixed MPI+H36M sampling logic and the TikTok mono dataset on a small
on-disk fixture."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from x_as_supervision_tpu.data.dataloader_2d import (
    TIKTOK_TRAIN_VIDEOS,
    TikTok_dataset,
    center_padding,
    data_color_aug,
)
from x_as_supervision_tpu.data.pipeline import mpi_inf_3dhp_hm36_Dataset


class _FakeIMDB:
    def __init__(self, db):
        self._db = db
        self.joint_num = 18

    def gt_db(self):
        return self._db


def _fake_record(tag, cams):
    from x_as_supervision_tpu.data.samples import PatchSample

    out = {}
    for c in cams:
        s = PatchSample.full(
            f"/fake/{tag}.jpg", 100, 100, 50, 50, 0,
            np.zeros((28 if len(cams) == 5 else 18, 3), np.float32),
            np.ones((28 if len(cams) == 5 else 18, 1), np.float32),
            np.zeros((6, 2), np.int32), np.zeros(18, np.int32),
        )
        s.joints_3d_cam = s.joints_3d.copy()
        out[f"cam_{c}"] = s
    return out


def test_mixed_dataset_indexing_and_epoch_reshuffle():
    mpi_db = [_fake_record(f"mpi{i}", [0, 2, 4, 7, 8]) for i in range(6)]
    hm_db = [_fake_record(f"hm{i}", [0, 1, 2, 3]) for i in range(10)]
    ds = mpi_inf_3dhp_hm36_Dataset(
        [_FakeIMDB(mpi_db), _FakeIMDB(hm_db)], True,
        patch_width=64, patch_height=64, rect_3d_width=2000,
        rect_3d_height=2000, batch_size=2, mean=None, std=None,
        aug_config={}, label_func=None, cam_id_list=[0, 1, 2, 3],
        geodesic_pt_list=[], geodesic_param_list=[2, 1, 3, 20, 0.0],
        smpl_pseudo_img=None, rm_bg=False,
    )
    # MPI records remapped to 18 joints + renamed cam_0..3
    rec = ds._select(0)
    assert set(rec.keys()) == {"cam_0", "cam_1", "cam_2", "cam_3"}
    assert rec["cam_0"].joints_3d.shape[0] == 18
    # length = padded mpi * 2; second half draws from hm36
    assert len(ds) == len(ds.db0) * 2
    rec2 = ds._select(len(ds.db0) + 1)
    assert "hm" in rec2["cam_0"].image
    # epoch reshuffle changes the mapping deterministically
    ds.set_epoch(0)
    a = ds._select(len(ds.db0) + 3)["cam_0"].image
    ds.set_epoch(1)
    b = ds._select(len(ds.db0) + 3)["cam_0"].image
    ds.set_epoch(0)
    c = ds._select(len(ds.db0) + 3)["cam_0"].image
    assert a == c  # deterministic per epoch


@pytest.fixture(scope="module")
def tiktok_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiktok")
    rng = np.random.default_rng(0)
    vid = TIKTOK_TRAIN_VIDEOS[0]
    img_dir = root / f"{vid:05d}" / "images"
    mask_dir = root / f"{vid:05d}" / "masks"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    for i in range(44):  # 20 cut from each end -> 4 usable
        frame = rng.uniform(0, 255, (120, 80, 3)).astype(np.uint8)
        mask = np.zeros((120, 80), np.uint8)
        cv2.circle(mask, (40, 60), 25, 255, -1)
        cv2.imwrite(str(img_dir / f"{i:05d}.png"), frame)
        cv2.imwrite(str(mask_dir / f"{i:05d}.png"), mask)
    return root


def test_tiktok_dataset_mono_schema(tiktok_root):
    ds = TikTok_dataset(
        str(tiktok_root), [2, 1, 3, 20, 0.0], None,
        norm_param={"mean": None, "std": None}, mode="train",
    )
    assert len(ds) == 4
    item = ds.sample(0)
    assert item["cam_mono_img"].shape == (256, 256, 3)
    assert item["cam_mono_mask"].shape == (256, 256, 1)
    assert item["cam_mono_geodesic_dis"].shape == (256, 256, 1)
    np.testing.assert_allclose(item["cam_mono_k_mat"], np.eye(3))
    # masked background is zero
    img, mask = item["cam_mono_img"], item["cam_mono_mask"]
    assert np.abs(img[mask[..., 0] == 0]).max() == 0.0
    # batch assembly via the mixin
    b = ds.batch(0, 2)
    assert b["cam_mono_img"].shape == (2, 256, 256, 3)


def test_center_padding_and_color_aug():
    img = np.ones((100, 60, 3), np.float32)
    p = center_padding(img)
    assert p.shape == (100, 100, 3)
    assert p[:, :20].sum() == 0 and p[:, 80:].sum() == 0

    rng = np.random.default_rng(5)
    out = data_color_aug(np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32), rng)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
