import numpy as np
import jax.numpy as jnp

from x_as_supervision_tpu.train import eval_utils as EU
from x_as_supervision_tpu.train import metrics as MET


def _naive_procrustes(src, tgt):
    """Per-sample reference Procrustes (independent re-derivation)."""
    src_t, tgt_t = src.T, tgt.T
    mu1, mu2 = src_t.mean(1, keepdims=True), tgt_t.mean(1, keepdims=True)
    x1, x2 = src_t - mu1, tgt_t - mu2
    var1 = (x1**2).sum()
    k = x1 @ x2.T
    u, _, vh = np.linalg.svd(k)
    v = vh.T
    z = np.eye(3)
    z[-1, -1] = np.sign(np.linalg.det(u @ v.T))
    r = v @ z @ u.T
    scale = np.trace(r @ k) / var1
    t = mu2 - scale * (r @ mu1)
    return (scale * r @ src_t + t).T


def test_batched_procrustes_matches_naive():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(5, 18, 3))
    tgt = rng.normal(size=(5, 18, 3))
    got = MET.compute_similarity_transform_batch(src, tgt)
    want = np.stack([_naive_procrustes(s, t) for s, t in zip(src, tgt)])
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_pmpjpe_invariant_to_rigid_transform():
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(3, 18, 3)) * 100
    # pred = rotated+scaled+shifted gt -> P-MPJPE ~ 0, MPJPE large
    from scipy.spatial.transform import Rotation

    r = Rotation.from_rotvec([0.3, 0.1, -0.2]).as_matrix()
    pred = 1.3 * gt @ r.T + np.array([50.0, -20.0, 10.0])
    mask = np.ones(gt.shape[:2], bool)
    p_err = MET.keypoint_mpjpe(pred, gt, mask, "procrustes")
    assert p_err.mean() < 1e-6
    assert MET.keypoint_mpjpe(pred, gt, mask, "none").mean() > 1.0
    # scale alignment fixes pure scaling
    s_err = MET.keypoint_mpjpe(1.7 * gt, gt, mask, "scale")
    assert s_err.mean() < 1e-6


def test_pck_auc_perfect_prediction():
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(4, 18, 3))
    mask = np.ones(gt.shape[:2], bool)
    assert MET.keypoint_3d_pck(gt, gt, mask).mean() == 100.0
    auc = MET.keypoint_3d_auc(gt, gt, mask)
    # threshold 0.0 bucket scores 0 -> 30/31 of full marks
    np.testing.assert_allclose(auc, 100.0 * 30 / 31, atol=0.1)


def test_pckh():
    gt = np.zeros((2, 16, 2))
    pred = gt.copy()
    pred[0, 0] = [10.0, 0.0]  # one joint off by 10, head size 10 -> miss
    head = np.full((2,), 10.0)
    pckh = MET.keypoint_pckh(pred, gt, head)
    np.testing.assert_allclose(pckh[1], 100.0)
    np.testing.assert_allclose(pckh[0], 100.0 * 15 / 16)


def test_switch_points_swaps_flipped_pose():
    rng = np.random.default_rng(3)
    gt = rng.normal(size=(2, 18, 3)).astype(np.float32)
    flipped = np.array(gt)
    for a, b in EU.DEFAULT_SWITCH_LIST:
        flipped[:, [a, b]] = flipped[:, [b, a]]
    fixed, mask = EU.switch_points(jnp.asarray(flipped), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(fixed), gt, atol=1e-6)
    # unswapped joints (not in switch_list) report no swap
    swapped_joints = {j for pair in EU.DEFAULT_SWITCH_LIST for j in pair}
    m = np.asarray(mask)[..., 0]
    for j in range(18):
        if j not in swapped_joints:
            assert not m[:, j].any()


def test_per_act_tables():
    rec, cnt = EU.new_act_table(), EU.new_act_table()
    EU.update_dict(rec, cnt, np.array([1.0, 3.0]), ["act_02_x", "act_02_y"])
    EU.update_dict(rec, cnt, np.array([2.0]), ["act_14_z"])
    full, select = EU.cal_per_class_error(rec, cnt)
    # Directions avg 2.0, Walking 2.0, others 0
    np.testing.assert_allclose(rec["Directions"], 2.0)
    np.testing.assert_allclose(rec["Walking"], 2.0)
    np.testing.assert_allclose(full, 4.0 / 15, rtol=1e-6)
    np.testing.assert_allclose(select, 4.0 / 6, rtol=1e-6)
