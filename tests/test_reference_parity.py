"""Numerical parity vs the reference torch implementation (part 1: ops).

Feeds identical inputs through /root/reference's torch functions and this
repo's JAX rebuild and asserts value (and gradient, where the op is on the
training path) agreement at fp32:

  * make_coordinate_grid / draw_lines (modules/util.py:3-59) — value + grad
  * patch/image/world converter chains + triangulation (util.py:61-230)
  * loss primitives (modules/base_losses/loss_func.py) — value + grad
  * integral decode, single + multi (keypoint_detector_integral*.py:
    softmax -> marginals -> expectation / peak+window) — value + grad

Note on decode shapes: the reference indexes the W-marginal with
arange(depth_dim) and the D-marginal with arange(W)
(keypoint_detector_integral_multi.py:50-57 with the (D, H, W) call at :76),
so it only runs when depth_dim == heatmap side; all shipped configs use 64.
Tests follow that constraint.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import refshim  # noqa: E402

from x_as_supervision_tpu.ops import geometry as G  # noqa: E402
from x_as_supervision_tpu.ops import integral as I  # noqa: E402
from x_as_supervision_tpu.ops import losses as L  # noqa: E402

REF = refshim.load_reference()
RNG = np.random.default_rng(20260816)


def t(x):
    return torch.tensor(np.asarray(x))


def n(x):
    return np.asarray(x.detach().numpy() if hasattr(x, "detach") else x)


# --- camera fixture shared by the converter tests -------------------------


def make_camera_batch(b=3, k=18, size=64, cams=(0, 1, 2)):
    """Random but geometrically sane camera params in both layouts."""
    batch = {}
    for cam in cams:
        ck = f"cam_{cam}"
        f = RNG.uniform(900, 1200, size=(b,))
        cx = RNG.uniform(400, 600, size=(b,))
        cy = RNG.uniform(400, 600, size=(b,))
        k_mat = np.zeros((b, 3, 3), np.float32)
        k_mat[:, 0, 0] = f
        k_mat[:, 1, 1] = f
        k_mat[:, 0, 2] = cx
        k_mat[:, 1, 2] = cy
        k_mat[:, 2, 2] = 1.0
        # random small rotation + translation putting the subject ~4m away
        axis = RNG.normal(size=(b, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        ang = RNG.uniform(-0.4, 0.4, size=(b, 1))
        from scipy.spatial.transform import Rotation

        rot = Rotation.from_rotvec(axis * ang).as_matrix().astype(np.float32)
        trans = RNG.uniform(-200, 200, size=(b, 3)).astype(np.float32)
        trans[:, 2] += 4000.0
        scale = RNG.uniform(0.2, 0.3, size=(b,))
        affine = np.zeros((b, 2, 3), np.float32)
        affine[:, 0, 0] = scale
        affine[:, 1, 1] = scale
        affine[:, 0, 2] = RNG.uniform(-20, 20, size=(b,))
        affine[:, 1, 2] = RNG.uniform(-20, 20, size=(b,))
        pelvis = RNG.uniform(-100, 100, size=(b, 3)).astype(np.float32)
        pelvis[:, 2] += 4000.0
        batch[f"{ck}_k_mat"] = k_mat
        batch[f"{ck}_rot_world"] = rot
        batch[f"{ck}_trans_world"] = trans
        batch[f"{ck}_trans_image"] = affine
        batch[f"{ck}_pelvis"] = pelvis
        batch[f"{ck}_img"] = RNG.normal(size=(b, size, size, 3)).astype(
            np.float32
        )
    kps = RNG.uniform(-0.9, 0.9, size=(b, k, 3)).astype(np.float32)
    return batch, kps


def torch_batch(batch):
    out = {}
    for key, v in batch.items():
        arr = t(v)
        if key.endswith("_img"):
            arr = arr.permute(0, 3, 1, 2)  # NHWC -> NCHW
        out[key] = arr
    return out


# --- grid + renderer -------------------------------------------------------


def test_make_coordinate_grid_matches():
    ref = REF.util.make_coordinate_grid((48, 32), torch.float32)
    ours = G.make_coordinate_grid(48, 32)
    np.testing.assert_allclose(n(ours), n(ref), atol=1e-6)


@pytest.mark.parametrize("num_lines", [17, 25])
def test_draw_lines_value_and_grad(num_lines):
    b, k, size = 2, 18, 32
    parents = [int(RNG.integers(0, k)) for _ in range(num_lines)]
    children = [int((p + RNG.integers(1, k)) % k) for p in parents]
    width = 3.0 * 1e-3
    kps = RNG.uniform(-0.95, 0.95, size=(b, k, 2)).astype(np.float32)
    w = RNG.normal(size=(b, num_lines, size, size)).astype(np.float32)

    kt = t(kps).requires_grad_(True)
    ref_hm = REF.util.draw_lines(kt, size, parents, children, width)
    (ref_hm * t(w)).sum().backward()

    ours_fn = lambda kk: G.draw_lines(kk, size, parents, children, width)
    ours_hm = ours_fn(jnp.asarray(kps))
    np.testing.assert_allclose(n(ours_hm), n(ref_hm), rtol=1e-4, atol=1e-5)

    grad = jax.grad(lambda kk: (ours_fn(kk) * w).sum())(jnp.asarray(kps))
    np.testing.assert_allclose(n(grad), n(kt.grad), rtol=1e-3, atol=1e-4)


# --- converter chains -------------------------------------------------------


def test_patch_world_roundtrip_chain_matches():
    batch, kps = make_camera_batch()
    tb = torch_batch(batch)

    ref_world = REF.util.convert_patch_to_world(
        t(kps), tb, "cam_0", is_norm=True, RECT_WIDTH=2000
    )
    our_world = G.convert_patch_to_world(
        jnp.asarray(kps), batch, "cam_0", is_norm=True, rect_width=2000.0
    )
    np.testing.assert_allclose(n(our_world), n(ref_world), rtol=1e-4, atol=2e-2)

    ref_back = REF.util.convert_world_to_patch(
        ref_world, tb, "cam_0", is_norm=True, RECT_WIDTH=2000
    )
    our_back = G.convert_world_to_patch(
        our_world, batch, "cam_0", is_norm=True, rect_width=2000.0
    )
    np.testing.assert_allclose(n(our_back), n(ref_back), rtol=1e-4, atol=1e-4)
    # and the roundtrip itself closes
    np.testing.assert_allclose(n(our_back), kps, rtol=1e-3, atol=1e-3)


def test_patch_to_world_unnormalized_and_mono():
    batch, kps = make_camera_batch()
    tb = torch_batch(batch)
    # un-normalized branch (gt joints path, reference model.py:84)
    kp_px = (kps + 1.0) * 32.0
    ref = REF.util.convert_patch_to_world(t(kp_px), tb, "cam_1", is_norm=False)
    ours = G.convert_patch_to_world(
        jnp.asarray(kp_px), batch, "cam_1", is_norm=False
    )
    np.testing.assert_allclose(n(ours), n(ref), rtol=1e-4, atol=2e-2)

    # mono visualization branch (patch=False)
    ref_m = REF.util.convert_patch_to_world(
        t(kps), tb, "cam_1", is_norm=True, RECT_WIDTH=256, mono=True,
        patch=False,
    )
    ours_m = G.convert_patch_to_world(
        jnp.asarray(kps), batch, "cam_1", is_norm=True, rect_width=256.0,
        mono=True, patch=False,
    )
    np.testing.assert_allclose(n(ours_m), n(ref_m), rtol=1e-5, atol=1e-5)


def test_triangulation_matches():
    batch, kps = make_camera_batch()
    tb = torch_batch(batch)
    # consistent multi-view detections: lift cam_0 patch kps to world, then
    # re-project into each camera's patch (keeps depths positive so the
    # confidence weighting is sane)
    world = G.convert_patch_to_world(jnp.asarray(kps), batch, "cam_0")
    kp_dict = {}
    for cam in (0, 1, 2):
        ck = f"cam_{cam}"
        kp_dict[ck] = np.asarray(
            G.convert_world_to_patch(world, batch, ck)
        ).astype(np.float32)

    ref_tri = REF.util.triangulation(
        {k: t(v) for k, v in kp_dict.items()}, tb, [0, 1, 2], is_norm=True,
        RECT_WIDTH=2000,
    )
    our_tri = G.triangulation(
        {k: jnp.asarray(v) for k, v in kp_dict.items()}, batch, [0, 1, 2],
        is_norm=True, rect_width=2000.0,
    )
    # SVD null-vector sign/conditioning differs slightly between LAPACK and
    # XLA; compare reconstructed points with mm-scale tolerance.
    np.testing.assert_allclose(n(our_tri), n(ref_tri), rtol=1e-3, atol=0.5)
    # and both agree with the true world points
    np.testing.assert_allclose(n(our_tri), n(world), rtol=1e-3, atol=1.0)


def test_smpl_to_h36m_and_pelvis_to_world():
    verts = RNG.normal(size=(2, 100, 3)).astype(np.float32)
    reg = RNG.normal(size=(17, 100)).astype(np.float32)
    ref = REF.util.smpl_to_h36m(t(verts), t(reg))
    ours = G.smpl_to_h36m(jnp.asarray(verts), jnp.asarray(reg))
    np.testing.assert_allclose(n(ours), n(ref), rtol=1e-4, atol=1e-5)

    batch, _ = make_camera_batch()
    tb = torch_batch(batch)
    ref_p = REF.util.convert_pelvis_to_world(tb, "cam_2")
    our_p = G.convert_pelvis_to_world(batch, "cam_2")
    np.testing.assert_allclose(n(our_p), n(ref_p), rtol=1e-4, atol=1e-2)


# --- loss primitives --------------------------------------------------------


def test_mask_reconstruction_loss_parity():
    mask = RNG.uniform(0, 1, size=(2, 1, 16, 16)).astype(np.float32)
    gt = RNG.uniform(0, 1, size=(2, 1, 16, 16)).astype(np.float32)
    w = RNG.uniform(0.5, 2.0, size=(2, 1, 16, 16)).astype(np.float32)

    for weight, clip in [(None, False), (None, True), (w, False), (w, True)]:
        mt = t(mask).requires_grad_(True)
        ref = REF.loss.compute_mask_reconstruction_loss(
            mt, t(gt), weight=None if weight is None else t(weight),
            use_clip=clip,
        )
        ref_scalar = ref.mean()  # the trainer's reduction (train.py:182)
        ref_scalar.backward()

        our_fn = lambda m: L.compute_mask_reconstruction_loss(
            m, jnp.asarray(gt),
            weight=None if weight is None else jnp.asarray(weight),
            use_clip=clip,
        )
        ours = our_fn(jnp.asarray(mask))
        np.testing.assert_allclose(
            float(ours), float(ref_scalar), rtol=1e-5,
            err_msg=f"weight={weight is not None} clip={clip}",
        )
        grad = jax.grad(our_fn)(jnp.asarray(mask))
        np.testing.assert_allclose(
            n(grad), n(mt.grad), rtol=1e-4, atol=1e-9,
            err_msg=f"grad weight={weight is not None} clip={clip}",
        )


def test_sym_and_supervision_losses_parity():
    kps = (RNG.normal(size=(4, 18, 3)) * 300).astype(np.float32)
    np.testing.assert_allclose(
        float(L.compute_bone_sym_loss(jnp.asarray(kps))),
        float(REF.loss.compute_bone_sym_loss(t(kps))), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(L.compute_kp_sym_loss(jnp.asarray(kps))),
        float(REF.loss.compute_kp_sym_loss(t(kps))), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(L.compute_kp_sym_loss(jnp.asarray(kps[..., :2]), is_3d=False)),
        float(REF.loss.compute_kp_sym_loss(t(kps[..., :2]), is_3D=False)),
        rtol=1e-5,
    )

    pred = RNG.uniform(-1, 1, size=(4, 18, 3)).astype(np.float32)
    gt = RNG.uniform(-1, 1, size=(4, 18, 3)).astype(np.float32)
    for mode in ("mean", "sum"):
        np.testing.assert_allclose(
            float(L.compute_supervision(
                jnp.asarray(pred), jnp.asarray(gt), mode=mode
            )),
            float(REF.loss.compute_supervision(t(pred), t(gt), mode=mode)),
            rtol=1e-5,
        )
    np.testing.assert_allclose(
        float(L.compute_supervision(
            jnp.asarray(pred), jnp.asarray(gt) * 32.0, feature_shape=(64, 64, 64)
        )),
        float(REF.loss.compute_supervision(
            t(pred), t(gt) * 32.0, feature_shape=(64, 64, 64)
        )),
        rtol=1e-5,
    )


def test_disc_loss_parity():
    p2 = RNG.normal(size=(6, 1)).astype(np.float32)
    p3 = RNG.normal(size=(6, 3, 1)).astype(np.float32)
    g2 = RNG.normal(size=(6, 1)).astype(np.float32)
    g3 = RNG.normal(size=(6, 3, 1)).astype(np.float32)
    cases = [
        (p2, None), (p3, None), (p2, g2), (p3, g2), (p2, g3), (p3, g3),
    ]
    for pred, gt in cases:
        ref = REF.loss.compute_disc_loss(
            t(pred), None if gt is None else t(gt)
        )
        ours = L.compute_disc_loss(
            jnp.asarray(pred), None if gt is None else jnp.asarray(gt)
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_generate_joint_location_label_parity():
    joints = (RNG.uniform(0, 64, size=(18, 3))).astype(np.float32)
    vis = np.ones((18, 3), np.float32)
    ref, _ = REF.integral.generate_joint_location_label(
        64.0, 64.0, joints, vis
    )
    ours = L.generate_joint_location_label(64.0, 64.0, jnp.asarray(joints))
    np.testing.assert_allclose(n(ours), ref, rtol=1e-6)


# --- integral decode ---------------------------------------------------------


def _ref_detector(cls, **attrs):
    """Instantiate a reference detector without building its ResNet."""
    det = cls.__new__(cls)
    torch.nn.Module.__init__(det)
    for k, v in attrs.items():
        setattr(det, k, v)

    class _Precomputed(torch.nn.Module):
        def forward(self, x):
            return x

    det.net = _Precomputed()
    return det


def test_decode_single_parity():
    b, k, s = 2, 5, 16  # depth_dim == heatmap side (see module docstring)
    logits = RNG.normal(size=(b, s, s, k * s)).astype(np.float32) * 2.0

    ref_det = _ref_detector(REF.kpd.KPDetector3D, num_kp=k, name="ref")
    lt = t(logits).permute(0, 3, 1, 2).contiguous().requires_grad_(True)
    ref_kps, ref_dpm = ref_det(lt)
    w = RNG.normal(size=tuple(ref_kps.shape)).astype(np.float32)
    (ref_kps * t(w)).sum().backward()

    our_fn = lambda lg: I.decode_single(lg, num_joints=k)
    ours = our_fn(jnp.asarray(logits))
    np.testing.assert_allclose(n(ours.kps), n(ref_kps), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        n(ours.depth_prob_map), n(ref_dpm), rtol=1e-4, atol=1e-6
    )

    grad = jax.grad(lambda lg: (our_fn(lg).kps * w).sum())(jnp.asarray(logits))
    ref_grad = n(lt.grad).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    np.testing.assert_allclose(n(grad), ref_grad, rtol=1e-3, atol=1e-7)


@pytest.mark.parametrize("num_hypo,neighbor", [(2, 3), (3, 5)])
def test_decode_multi_parity(num_hypo, neighbor):
    b, k, s = 2, 5, 16
    logits = RNG.normal(size=(b, s, s, k * s)).astype(np.float32) * 2.0

    ref_det = _ref_detector(
        REF.kpd_multi.KPDetector3DMulti, num_kp=k, num_hypo=num_hypo,
        neighbor_size=neighbor, name="ref",
    )
    lt = t(logits).permute(0, 3, 1, 2).contiguous().requires_grad_(True)
    ref_kps, ref_dpm = ref_det(lt)
    w = RNG.normal(size=tuple(ref_kps.shape)).astype(np.float32)
    (ref_kps * t(w)).sum().backward()

    our_fn = lambda lg: I.decode_multi(
        lg, num_joints=k, num_hypo=num_hypo, neighbor_size=neighbor
    )
    ours = our_fn(jnp.asarray(logits))
    np.testing.assert_allclose(n(ours.kps), n(ref_kps), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        n(ours.depth_prob_map), n(ref_dpm), rtol=1e-4, atol=1e-6
    )

    grad = jax.grad(lambda lg: (our_fn(lg).kps * w).sum())(jnp.asarray(logits))
    ref_grad = n(lt.grad).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(n(grad), ref_grad, rtol=1e-3, atol=1e-7)
