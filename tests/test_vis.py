"""Host-side visualization helpers (train/vis.py).

Deterministic pixel-level checks of the TB panel builders — the numpy/
cv2/matplotlib equivalents of the reference's vis stack (reference:
train_util.py:108-227, human_utils/common/visualization/pose.py).
"""

import numpy as np

from x_as_supervision_tpu.train import vis


PARENTS = [0, 0, 1]
FLIP_PAIRS = [[1, 2]]


def test_pose_vis_denormalizes_and_draws():
    # joint 0 at the exact center of a 65x65 canvas in [-1,1] coords
    pose = np.array([[0.0, 0.0], [0.5, 0.5], [-0.5, -0.5]])
    out = vis.pose_vis(pose, (65, 65), FLIP_PAIRS, parent_ids=PARENTS)
    assert out.shape == (3, 65, 65) and out.dtype == np.uint8
    hwc = out.transpose(1, 2, 0)
    # (0+1)/2 * 64 = 32: a non-white marker lands on the center pixel
    assert not np.array_equal(hwc[32, 32], [255, 255, 255])
    # left/right coloring, probed off the bone diagonal (bones overdraw
    # circles): joint 1 is in a flip pair -> red (BGR (0,0,255)); joint 0
    # is not -> green (0,255,0). hwc[row=y, col=x].
    assert tuple(hwc[46, 50]) == (0, 0, 255)
    assert tuple(hwc[30, 34]) == (0, 255, 0)
    # bones are yellow and pass through the joint centers
    assert tuple(hwc[40, 40]) == (255, 255, 0)


def test_pose_vis_gt_passthrough_and_background_denorm():
    # is_gt: pixel coords used as-is; [0,1] float background scales to 255
    pose = np.array([[10.0, 20.0]])
    img = np.full((32, 32, 3), 0.25)
    out = vis.pose_vis(pose, (32, 32), [], parent_ids=[0], is_gt=True,
                       img=img)
    hwc = out.transpose(1, 2, 0)
    # marker pixel just off-center (the zero-length self-parent bone
    # overdraws the exact center); (x, y) -> column, row
    assert tuple(hwc[18, 12]) == (0, 255, 0)
    assert tuple(hwc[0, 0]) == (63, 63, 63)   # int(0.25 * 255)


def test_img_vis_mean_std_and_gray_expansion():
    img = np.full((8, 8), 0.5, dtype=np.float32)  # HW gray, normalized
    out = vis.img_vis(img, mean=[0.0], std=[1.0])
    assert out.shape == (3, 8, 8) and out.dtype == np.uint8
    assert np.all(out == 127)  # 0.5 * 255 (< 128 heuristic fires)
    # mean/std undo: (img * std + mean) with already-255-scale result
    img2 = np.full((4, 4, 3), 0.5, dtype=np.float32)
    out2 = vis.img_vis(img2, mean=[100.0, 100.0, 100.0],
                       std=[200.0, 200.0, 200.0])
    assert np.all(out2 == 200)  # 0.5*200+100, >=128 so no rescale


def test_pose_vis_3d_and_dis_vis_render_figures():
    kps = np.array([[0.0, 0, 0], [1, 1, 1], [2, 0, 1]])
    out = vis.pose_vis_3d(kps, FLIP_PAIRS, parent_ids=PARENTS,
                          ref_keypoints=kps + 0.5)
    assert out.ndim == 3 and out.shape[0] == 3 and out.dtype == np.uint8
    assert out.min() < 255  # something was drawn

    dis = np.random.default_rng(0).random((16, 16))
    out2 = vis.dis_vis(dis, centers=[[4, 4], [8, 8]])
    assert out2.shape[0] == 3 and out2.dtype == np.uint8


def test_depth_heatmap_vis_shapes():
    k, d = 18, 64
    depth_map = np.random.default_rng(1).random((k, d))
    gt = np.zeros((k, 3))
    gt[:, 2] = np.linspace(-100, 100, k)
    out = vis.depth_heatmap_vis(depth_map, gt, depth_scale=256)
    assert out.ndim == 3 and out.shape[0] == 3 and out.dtype == np.uint8
