"""End-to-end SURREAL constructor test on a synthesized shard.

Builds a fake-but-format-faithful SURREAL segment (an .mp4 video, an
_info.mat with pose/shape/zrot/camLoc/gender/joints2D/joints3D, and a
_segm.mat with per-frame segmentation), runs the constructor over it, and
checks the contract its output must satisfy:

  * image/mask/joints files + info.npy in the ori_surreal layout
  * joints land on the body mask (the reference's check_image probe,
    reference surreal_reader.py:76-78)
  * the 'ori_surreal' pseudo loader (data/pipeline.py) consumes the output
    and produces the cam_*_pseudo_img / _pseudo_joints training keys with
    the meters -> pixel-units depth conversion applied.
"""

import math
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")
sio = pytest.importorskip("scipy.io")

from x_as_supervision_tpu.models import smpl as S  # noqa: E402
from x_as_supervision_tpu.tools import surreal_constructor as SC  # noqa: E402

RES_X, RES_Y, T = 320, 240, 6


def _write_smpl_npz(model, path):
    np.savez(
        path,
        v_template=np.asarray(model.v_template),
        shapedirs=np.asarray(model.shapedirs),
        posedirs=np.asarray(model.posedirs),
        j_regressor=np.asarray(model.j_regressor),
        weights=np.asarray(model.weights),
        kintree_parents=np.asarray(model.kintree_parents),
        faces=np.asarray(model.faces),
        betas_mean=np.asarray(model.betas_mean),
    )


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    """Synthesize one SURREAL segment + SMPL assets; return all paths."""
    # out dir name must contain 'surreal_h36m_pose' — the pseudo loader
    # dispatches its format on the path (data/pipeline.py:171)
    root = tmp_path_factory.mktemp("surreal_root")
    smpl_root = tmp_path_factory.mktemp("smpl")
    out = tmp_path_factory.mktemp("o") / "surreal_h36m_pose"
    os.makedirs(out)

    rng = np.random.default_rng(11)
    model = S.random_smpl_model(jax.random.PRNGKey(2))
    _write_smpl_npz(model, smpl_root / "smpl_female.npz")
    reg = np.asarray(
        jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (17, 128)) * 3,
                       axis=-1)
    )
    np.save(smpl_root / "J_regressor_h36m.npy", reg)

    # --- per-frame SMPL state ---
    zrot = 0.4
    rz = np.array([
        [math.cos(zrot), -math.sin(zrot), 0],
        [math.sin(zrot), math.cos(zrot), 0],
        [0, 0, 1],
    ])
    poses = (rng.normal(size=(72, T)) * 0.05).astype(np.float32)
    betas = (rng.normal(size=(10, 1)) * 0.2).astype(np.float32)

    intrinsic = SC.get_intrinsic(RES_X, RES_Y)

    # world joints: run the same SMPL forward the constructor will run,
    # then translate so the pelvis projects to the frame center
    joints3d = np.zeros((3, 24, T), np.float32)
    pelvis_world = np.array([0.0, 0.3, 0.2])
    cam_loc = pelvis_world + np.array([8.0, 0.0, 0.0])
    extrinsic, _, _ = SC.get_extrinsic(cam_loc)

    frames, segms = [], {}
    for t in range(T):
        pose_t = poses[:, t].copy()
        pose_t[:3] = SC.rotate_body(rz, pose_t[:3])
        verts, joints = S.smpl_forward(
            model, jnp.asarray(pose_t[None]), jnp.asarray(betas[:, 0][None]),
            center_idx=None,
        )
        j = np.asarray(joints[0])
        trans = pelvis_world - j[0]
        joints3d[:, :, t] = (j + trans).T

        # project ALL joints for the 2D track + build the mask from the
        # regressed H36M joints (what the filter checks against)
        verts_w = np.asarray(verts[0]) + trans
        h36m = reg @ verts_w
        pts2d = SC.project_vertices(h36m, intrinsic, extrinsic)[:, :2]
        mask = np.zeros((RES_Y, RES_X), np.uint8)
        hull = cv2.convexHull(pts2d.astype(np.int32))
        cv2.fillConvexPoly(mask, hull, 1)
        mask = cv2.dilate(mask, np.ones((9, 9), np.uint8))
        segms[f"segm_{t + 1}"] = mask
        frames.append(
            np.dstack([mask * 180, mask * 150, mask * 120]).astype(np.uint8)
        )

    joints2d = np.zeros((2, 24, T), np.float32)
    for t in range(T):
        p = SC.project_vertices(joints3d[:, :, t].T, intrinsic, extrinsic)
        joints2d[:, :, t] = p[:, :2].T

    seg_dir = root / "train" / "run0" / "seq0"
    os.makedirs(seg_dir)
    info_path = str(seg_dir / "seg_info.mat")
    sio.savemat(info_path, {
        "pose": poses, "shape": betas, "zrot": np.array([[zrot]]),
        "camLoc": cam_loc.reshape(3, 1), "gender": np.array([[0]]),
        "joints2D": joints2d, "joints3D": joints3d,
    })
    sio.savemat(str(seg_dir / "seg_segm.mat"), segms)
    vw = cv2.VideoWriter(
        str(seg_dir / "seg.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 30,
        (RES_X, RES_Y),
    )
    for f in frames:
        vw.write(f)
    vw.release()

    return dict(root=str(root), smpl_root=str(smpl_root), out=str(out),
                info=info_path, regressor=reg)


@pytest.fixture(scope="module")
def constructed(shard):
    np.random.seed(0)
    ctor = SC.SurrealConstructor(
        shard["smpl_root"], shard["out"], res=(RES_X, RES_Y),
        h36m_regressor=shard["regressor"],
    )
    written = ctor.process_segment(0, shard["info"], sample_times=4)
    np.save(os.path.join(shard["out"], "info.npy"), sorted(written))
    return written


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
