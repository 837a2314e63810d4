"""End-to-end SURREAL constructor test on a synthesized shard.

Builds a fake-but-format-faithful SURREAL segment (an .mp4 video, an
_info.mat with pose/shape/zrot/camLoc/gender/joints2D/joints3D, and a
_segm.mat with per-frame segmentation; see fixture_helpers), runs the
constructor over it, and checks the contract its output must satisfy:

  * image/mask/joints files + info.npy in the ori_surreal layout
  * joints land on the body mask (the reference's check_image probe,
    reference surreal_reader.py:76-78)
  * the 'ori_surreal' pseudo loader (data/pipeline.py) consumes the output
    and produces the cam_*_pseudo_img / _pseudo_joints training keys with
    the meters -> pixel-units depth conversion applied.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
pytest.importorskip("scipy.io")

import fixture_helpers as FH  # noqa: E402


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    root = tmp_path_factory.mktemp("surreal_root")
    smpl_root = tmp_path_factory.mktemp("smpl")
    # out dir name must contain 'surreal_h36m_pose' — the pseudo loader
    # dispatches its format on the path (data/pipeline.py:171)
    out = tmp_path_factory.mktemp("o") / "surreal_h36m_pose"
    s = FH.synthesize_surreal_segment(str(root), str(smpl_root))
    s["out"] = str(out)
    return s


@pytest.fixture(scope="module")
def constructed(shard):
    return FH.run_surreal_constructor(shard, shard["out"])


def test_constructor_writes_consistent_samples(shard, constructed):
    assert len(constructed) >= 1, "no frames survived the filters"
    for idx in constructed:
        img = cv2.imread(os.path.join(shard["out"], "image",
                                      f"image_{idx:06d}.png"))
        mask = cv2.imread(os.path.join(shard["out"], "mask",
                                       f"mask_{idx:06d}.png"),
                          cv2.IMREAD_GRAYSCALE)
        joints = np.load(os.path.join(shard["out"], "joints",
                                      f"joint_{idx:06d}.npy"))
        assert img.shape == (256, 256, 3)
        assert mask.shape == (256, 256)
        assert joints.shape == (18, 3)
        # xy normalized to [-1, 1], z pelvis-relative meters
        assert np.all(joints[:, :2] >= -1.0) and np.all(joints[:, :2] <= 1.0)
        assert abs(joints[0, 2]) < 1e-5  # pelvis-centered depth
        assert np.abs(joints[:, 2]).max() < 2.0  # meters, body-scale

        # the reference's check_image probe: joints land on the body mask
        px = ((joints[:, 0] + 1) / 2 * 256).astype(int).clip(0, 255)
        py = ((joints[:, 1] + 1) / 2 * 256).astype(int).clip(0, 255)
        on_mask = (mask[py, px] > 0).sum()
        assert on_mask >= 14, f"only {on_mask}/18 joints on mask (idx {idx})"
        # image body region coincides with the mask
        body = img.sum(axis=2) > 0
        overlap = (body & (mask > 0)).sum() / max(1, (mask > 0).sum())
        assert overlap > 0.6


def test_pseudo_loader_consumes_constructed_output(shard, constructed):
    from x_as_supervision_tpu.data.pipeline import PatchDataset

    ds = PatchDataset.__new__(PatchDataset)
    ds.cam_id_list = [0, 1]
    ds.use_smpl_pseudo_mask = True
    ds.mean = ds.std = None
    ds.rect_3d_width = 2000.0
    ds.uint8_feed = False
    ds._setup_pseudo({
        "data_path": shard["out"], "use_flag": True, "use_mask": True,
    })
    assert ds.smpl_pseudo_img_type == "ori_surreal"

    out = {}
    ds.generate_pseudo_smpl_data(out, np.random.default_rng(0))
    for cam in (0, 1):
        img = out[f"cam_{cam}_pseudo_img"]
        joints = out[f"cam_{cam}_pseudo_joints"]
        assert img.shape == (256, 256, 3)
        assert joints.shape == (18, 3)
        # z left meters at write time, converted to normalized pixel units
        # by the loader (x1000 / rect_3d_width)
        assert np.abs(joints[:, 2]).max() < 2.0 * 1000.0 / 2000.0
        # joints still land on the (mask-multiplied) body pixels
        px = ((joints[:, 0] + 1) / 2 * 256).astype(int).clip(0, 255)
        py = ((joints[:, 1] + 1) / 2 * 256).astype(int).clip(0, 255)
        body = img.sum(axis=2) > 0
        assert (body[py, px]).sum() >= 14
