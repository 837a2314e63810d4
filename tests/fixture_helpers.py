"""Shared on-disk fixture builders for the e2e tests.

synthesize_surreal_segment: a format-faithful fake SURREAL segment
(.mp4 + _info.mat + _segm.mat) with internally consistent SMPL pose,
camera, joints2D/joints3D, and per-frame segmentation, plus the SMPL npz
assets the constructor loads.

make_mini_h36m: an on-disk miniature Human3.6M (annot/matlab_meta.txt in
the reference's line format + stick-figure jpgs + SAM masks) whose images
are rendered FROM the ground-truth joints — a learnable, non-synthetic-
loader dataset for end-to-end train->eval runs (hm36 subset policy 'mini').
"""

from __future__ import annotations

import math
import os

import numpy as np

RES_X, RES_Y = 320, 240


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


def synthesize_surreal_segment(root, smpl_root, num_frames=6, seed=11):
    """Write a fake SURREAL segment + SMPL assets; returns paths dict."""
    import cv2
    import jax
    import jax.numpy as jnp
    import scipy.io as sio

    from x_as_supervision_tpu.models import smpl as S
    from x_as_supervision_tpu.tools import surreal_constructor as SC

    rng = np.random.default_rng(seed)
    model = S.random_smpl_model(jax.random.PRNGKey(2))
    os.makedirs(smpl_root, exist_ok=True)
    _write_smpl_npz(model, os.path.join(smpl_root, "smpl_female.npz"))
    reg = np.asarray(
        jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(3), (17, 128)) * 3, axis=-1
        )
    )
    np.save(os.path.join(smpl_root, "J_regressor_h36m.npy"), reg)

    zrot = 0.4
    rz = np.array([
        [math.cos(zrot), -math.sin(zrot), 0],
        [math.sin(zrot), math.cos(zrot), 0],
        [0, 0, 1],
    ])
    poses = (rng.normal(size=(72, num_frames)) * 0.05).astype(np.float32)
    betas = (rng.normal(size=(10, 1)) * 0.2).astype(np.float32)

    intrinsic = SC.get_intrinsic(RES_X, RES_Y)
    joints3d = np.zeros((3, 24, num_frames), np.float32)
    pelvis_world = np.array([0.0, 0.3, 0.2])
    cam_loc = pelvis_world + np.array([8.0, 0.0, 0.0])
    extrinsic, _, _ = SC.get_extrinsic(cam_loc)

    frames, segms = [], {}
    for t in range(num_frames):
        pose_t = poses[:, t].copy()
        pose_t[:3] = SC.rotate_body(rz, pose_t[:3])
        verts, joints = S.smpl_forward(
            model, jnp.asarray(pose_t[None]), jnp.asarray(betas[:, 0][None]),
            center_idx=None,
        )
        j = np.asarray(joints[0])
        trans = pelvis_world - j[0]
        joints3d[:, :, t] = (j + trans).T

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

    joints2d = np.zeros((2, 24, num_frames), np.float32)
    for t in range(num_frames):
        p = SC.project_vertices(joints3d[:, :, t].T, intrinsic, extrinsic)
        joints2d[:, :, t] = p[:, :2].T

    seg_dir = os.path.join(root, "train", "run0", "seq0")
    os.makedirs(seg_dir, exist_ok=True)
    info_path = os.path.join(seg_dir, "seg_info.mat")
    sio.savemat(info_path, {
        "pose": poses, "shape": betas, "zrot": np.array([[zrot]]),
        "camLoc": cam_loc.reshape(3, 1), "gender": np.array([[0]]),
        "joints2D": joints2d, "joints3D": joints3d,
    })
    sio.savemat(info_path.replace("_info.mat", "_segm.mat"), segms)
    vw = cv2.VideoWriter(
        info_path.replace("_info.mat", ".mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 30, (RES_X, RES_Y),
    )
    for f in frames:
        vw.write(f)
    vw.release()

    return dict(root=str(root), smpl_root=str(smpl_root), info=info_path,
                regressor=reg)


def run_surreal_constructor(shard, out, target=256, sample_times=4, seed=0):
    """Run the constructor over the synthesized segment into `out`."""
    from x_as_supervision_tpu.tools import surreal_constructor as SC

    np.random.seed(seed)
    os.makedirs(out, exist_ok=True)
    ctor = SC.SurrealConstructor(
        shard["smpl_root"], str(out), res=(RES_X, RES_Y), target=target,
        h36m_regressor=shard["regressor"],
    )
    written = ctor.process_segment(0, shard["info"],
                                   sample_times=sample_times)
    np.save(os.path.join(out, "info.npy"), sorted(written))
    return written


def make_mixed_fingerprint_loader(num_shards=1, shard_index=0):
    """A mixed MPI+HM36 dataset whose sample() returns a cheap numeric
    fingerprint of the selected record (no cv2/io), wrapped in a
    BatchLoader — used to compare epoch composition across real
    processes positionally."""
    from test_mixed_and_2d_datasets import _FakeIMDB, _fake_record

    from x_as_supervision_tpu.data.loader import BatchLoader
    from x_as_supervision_tpu.data.pipeline import mpi_inf_3dhp_hm36_Dataset

    class FingerprintMixed(mpi_inf_3dhp_hm36_Dataset):
        def sample(self, index):
            path = self._select(index)["cam_0"].image  # "/fake/<tag>.jpg"
            tag = path.rsplit("/", 1)[1].split(".")[0]
            kind, num = ("mpi", tag[3:]) if tag.startswith("mpi") \
                else ("hm", tag[2:])
            return {"fp": np.float64((0 if kind == "mpi" else 1000)
                                     + int(num))}

    mpi_db = [_fake_record(f"mpi{i}", [0, 2, 4, 7, 8]) for i in range(6)]
    hm_db = [_fake_record(f"hm{i}", [0, 1, 2, 3]) for i in range(10)]
    ds = FingerprintMixed(
        [_FakeIMDB(mpi_db), _FakeIMDB(hm_db)], True,
        patch_width=64, patch_height=64, rect_3d_width=2000,
        rect_3d_height=2000, batch_size=2, mean=None, std=None,
        aug_config={}, label_func=None, cam_id_list=[0, 1, 2, 3],
        geodesic_pt_list=[], geodesic_param_list=[2, 1, 3, 20, 0.0],
        smpl_pseudo_img=None, rm_bg=False,
    )
    return BatchLoader(
        ds, batch_size=4, shuffle=True, num_workers=2, prefetch=1,
        num_shards=num_shards, shard_index=shard_index,
    )


def make_mini_h36m(root, img_size=640, n_frames=8, seed=0):
    """Write the on-disk mini-H36M under <root>/hm36 (images rendered from
    the GT joints; SAM masks = the rendered body). Uses the same meta-file
    line format the reference parser reads (reference hm36.py:60-98)."""
    import cv2

    from x_as_supervision_tpu.data.synthetic import (
        H36M_PARENT_IDS,
        _random_pose,
    )

    hm_root = os.path.join(root, "hm36")
    rng = np.random.default_rng(seed)
    folder = "s_09_act_02_subact_01"

    # 17 H36M joints placed into the 32-joint world layout the meta stores
    jt_list = [1, 2, 3, 4, 7, 8, 9, 13, 14, 15, 16, 18, 19, 20, 26, 27, 28]
    poses18 = np.stack([_random_pose(rng) for _ in range(n_frames)])
    kps32 = np.zeros((n_frames, 32, 3))
    for out_idx, meta_idx in enumerate(jt_list):
        kps32[:, meta_idx - 1] = poses18[:, out_idx]

    def write_meta(path, rot, trans, fl, c_p):
        lines = [str(n_frames)]
        lines.append("size %d %d" % (img_size, img_size))
        lines.append("rot " + " ".join(str(v) for v in rot.T.flatten()))
        lines.append("trans " + " ".join(str(v) for v in trans))
        lines.append("fl " + " ".join(str(v) for v in fl))
        lines.append("cp " + " ".join(str(v) for v in c_p))
        lines.append("kp 0 0 0")
        lines.append("pp 0 0")
        lines.append("jt " + " ".join(str(v) for v in jt_list))
        for f in range(n_frames):
            lines.append(
                "kp " + " ".join("%.4f" % v for v in kps32[f].flatten())
            )
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    for cam in range(4):
        angle = cam * np.pi / 2 + 0.3
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        trans = rot.T @ np.array([0.0, 0.0, -4000.0])
        fl = np.array([600.0, 600.0])
        c_p = np.array([img_size / 2, img_size / 2])

        cam_folder = f"{folder}_ca_{cam + 1:02d}"
        annot_dir = os.path.join(hm_root, "annot", cam_folder)
        img_dir = os.path.join(hm_root, "images", cam_folder)
        os.makedirs(annot_dir, exist_ok=True)
        os.makedirs(img_dir, exist_ok=True)
        write_meta(os.path.join(annot_dir, "matlab_meta.txt"), rot, trans,
                   fl, c_p)

        for f in range(n_frames):
            cam_pts = (kps32[f, [j - 1 for j in jt_list]] - trans) @ rot.T
            u = (cam_pts[:, 0] / cam_pts[:, 2] * fl[0] + c_p[0]).astype(int)
            v = (cam_pts[:, 1] / cam_pts[:, 2] * fl[1] + c_p[1]).astype(int)
            # thorax = shoulder midpoint (index 17 in the 18-joint layout)
            u = np.append(u, (u[11] + u[14]) // 2)
            v = np.append(v, (v[11] + v[14]) // 2)

            body = np.zeros((img_size, img_size), np.uint8)
            for j, p in enumerate(H36M_PARENT_IDS):
                cv2.line(body, (u[j], v[j]), (u[p], v[p]), 255, 9)
            img = np.dstack([body // 2, (body // 3) * 2, body])
            img = (img + rng.integers(0, 15, img.shape)).astype(np.uint8)

            name = "%s_%06d.jpg" % (cam_folder, f + 1)
            cv2.imwrite(os.path.join(img_dir, name), img)
            mpath = os.path.join(img_dir, name).replace(
                "hm36/images", "sam_masks/hm36"
            ).replace("jpg", "png")
            os.makedirs(os.path.dirname(mpath), exist_ok=True)
            cv2.imwrite(mpath, body)
    return hm_root
