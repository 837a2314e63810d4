"""Geometry primitives: coordinate grids, patch/image/world conversions,
DLT triangulation, SMPL->H36M regression, pose augmentations.

Semantics mirror the reference framework's geometry library
(reference: modules/util.py) but are written as pure, functional JAX ops:
no in-place mutation, explicit 2x2 inverses instead of LAPACK calls, and
randomness threaded through `jax.random` keys.

Conventions (identical to the reference):
  * keypoints are (..., K, 3) with channels (x, y, z); x is the image
    column (u), y the image row (v).
  * "patch" coords: pixels inside the 256x256 crop; optionally normalized so
    x,y in [-1, 1] (divide by (S-1)) and z in [-1, 1] (pelvis-relative depth
    divided by (S-1) pixels, 1 px == RECT_WIDTH/S mm).
  * "image" coords: pixels of the full camera image + metric depth in mm.
  * "world" coords: mm, camera extrinsics (R, t) with x_img = R x_world + t.
  * `trans_image` is the 2x3 affine mapping image->patch pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Geometry runs on tiny matrices where bf16 MXU rounding (the TPU default for
# matmul-class ops) is unacceptable; pin full fp32 precision throughout.
_PREC = jax.lax.Precision.HIGHEST


def make_coordinate_grid(height: int, width: int, dtype=jnp.float32) -> Array:
    """[-1, 1]^2 meshgrid of shape (H, W, 2) with channels (x, y).

    Reference: modules/util.py:3-19.
    """
    x = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    y = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    xx = jnp.broadcast_to(x[None, :], (height, width))
    yy = jnp.broadcast_to(y[:, None], (height, width))
    return jnp.stack([xx, yy], axis=-1)


# ---------------------------------------------------------------------------
# Differentiable skeleton line renderer.
# This XLA form IS the production path: component-wise x/y arrays keep the
# pixel axis on the 128-wide lanes (a trailing (..., 2) coordinate axis
# would pad to 128 and inflate HBM traffic 64x), and measures 6 ms fwd+bwd
# at B=64 on the v5e bench chip (PERF.md). A bespoke Pallas kernel was
# evaluated and not adopted: the op is a pure element-wise map + exp over a
# (B, L, S*S) volume that XLA already fuses into adjacent ops, so a kernel
# can only re-derive the same fusion (unlike the decode, there is no
# reduction structure to reorganize).
# ---------------------------------------------------------------------------

# Line ids rendered with a 2x sharper falloff when the extended (>= 21 line)
# skeleton is used: the four arm bones. Reference: modules/util.py:50-53.
ARM_LINE_IDS = (11, 12, 14, 15)


def draw_lines(
    keypoints: Array,
    image_size: int,
    parent_ids,
    child_ids,
    body_width: float,
) -> Array:
    """Differentiable point-to-segment Gaussian line rendering.

    For every pixel of an `image_size`^2 grid in [-1,1]^2 compute the squared
    distance to each bone segment (clamped to the segment: before-start /
    after-end / interior cases) and return exp(-d^2 / body_width) heatmaps.
    When >= 21 lines are rendered, arm bones (ARM_LINE_IDS) use a 2x sharper
    falloff.

    Args:
      keypoints: (B, K, 2) keypoint positions in [-1, 1].
      image_size: output grid side S.
      parent_ids / child_ids: per-line endpoint joint indices (length L).
      body_width: Gaussian falloff width (already scaled by 1e-3 upstream).

    Returns:
      (B, L, S, S) heatmaps.

    Reference semantics: modules/util.py:21-59.
    """
    parent_ids = jnp.asarray(parent_ids, dtype=jnp.int32)
    child_ids = jnp.asarray(child_ids, dtype=jnp.int32)
    num_lines = int(parent_ids.shape[0])

    # TPU layout note: x/y stay in SEPARATE (B, L, P) arrays. A trailing
    # coordinate axis of size 2 would be padded to the 128-lane tile,
    # inflating every (B, L, P, 2) intermediate 64x in VMEM/HBM traffic;
    # component-wise arrays keep the pixel axis on the lanes instead.
    sx = keypoints[:, child_ids, 0][..., None]  # start, (B, L, 1)
    sy = keypoints[:, child_ids, 1][..., None]
    ex = keypoints[:, parent_ids, 0][..., None]  # end
    ey = keypoints[:, parent_ids, 1][..., None]
    vx, vy = ex - sx, ey - sy  # bone vector

    coord = jnp.linspace(-1.0, 1.0, image_size, dtype=keypoints.dtype)
    gx = jnp.tile(coord, image_size).reshape(1, 1, -1)  # (1, 1, P)
    gy = jnp.repeat(coord, image_size).reshape(1, 1, -1)

    dsx, dsy = gx - sx, gy - sy  # pixel - start
    t = (dsx * vx + dsy * vy) / (1e-8 + vx * vx + vy * vy)

    dex, dey = gx - ex, gy - ey
    sq_start = dsx * dsx + dsy * dsy
    sq_end = dex * dex + dey * dey
    fx, fy = dsx - t * vx, dsy - t * vy  # pixel - foot of perpendicular
    sq_foot = fx * fx + fy * fy

    sq = jnp.where(t <= 0.0, sq_start, jnp.where(t >= 1.0, sq_end, sq_foot))
    sq = sq.reshape(keypoints.shape[0], num_lines, image_size, image_size)

    neg = -sq / body_width
    if num_lines >= 21:
        sharp = jnp.zeros((num_lines,), dtype=keypoints.dtype).at[
            jnp.asarray(ARM_LINE_IDS)
        ].set(1.0)
        neg = neg * (1.0 + sharp)[None, :, None, None]
    return jnp.exp(neg)


# ---------------------------------------------------------------------------
# Patch <-> image <-> world chains.
# ---------------------------------------------------------------------------


def _invert_affine_2x3(trans: Array) -> tuple[Array, Array]:
    """Invert a (..., 2, 3) affine by explicit 2x2 inverse (XLA-friendly)."""
    a, b = trans[..., 0, 0], trans[..., 0, 1]
    c, d = trans[..., 1, 0], trans[..., 1, 1]
    det = a * d - b * c
    inv = (
        jnp.stack(
            [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)],
            axis=-2,
        )
        / det[..., None, None]
    )
    t = trans[..., :, 2]
    return inv, t


def convert_patch_to_image(
    kps: Array,
    trans: Array,
    image_depth: int,
    image_height: int,
    image_width: int,
    depth_scale,
    pelvis: Array,
    is_norm: bool = True,
) -> Array:
    """Crop-patch -> full-image pixel coords + metric depth.

    kps: (B, K, 3); trans: (B, 2, 3) image->patch affine; pelvis: (B, 3)
    with pelvis[..., 2] the camera-frame pelvis depth in mm.
    Reference: modules/util.py:61-82.
    """
    x, y, z = kps[..., 0], kps[..., 1], kps[..., 2]
    if is_norm:
        x = (x + 1.0) / 2.0 * (image_width - 1)
        y = (y + 1.0) / 2.0 * (image_height - 1)
        z = z * (image_depth - 1)

    inv, t = _invert_affine_2x3(trans)
    xy = jnp.stack([x, y], axis=-1) - t[..., None, :]
    xy = jnp.einsum("...ij,...kj->...ki", inv, xy, precision=_PREC)

    z = z * depth_scale + pelvis[..., 2][..., None]
    return jnp.concatenate([xy, z[..., None]], axis=-1)


def convert_image_to_patch(
    kps: Array,
    trans: Array,
    image_depth: int,
    image_height: int,
    image_width: int,
    depth_scale,
    pelvis: Array,
    is_norm: bool = True,
) -> Array:
    """Inverse of convert_patch_to_image. Reference: modules/util.py:98-113."""
    z = (kps[..., 2] - pelvis[..., 2][..., None]) / depth_scale
    xy = jnp.einsum(
        "...ij,...kj->...ki", trans[..., :, :2], kps[..., :2], precision=_PREC
    )
    xy = xy + trans[..., :, 2][..., None, :]
    x, y = xy[..., 0], xy[..., 1]
    if is_norm:
        x = x / (image_width - 1) * 2.0 - 1.0
        y = y / (image_height - 1) * 2.0 - 1.0
        z = z / (image_depth - 1)
    return jnp.stack([x, y, z], axis=-1)


def convert_image_to_world(
    kps: Array, fx, fy, u, v, trans: Array, rot: Array
) -> Array:
    """Pinhole back-projection then camera->world: x_w = R^-1 (x_c - t).

    fx/fy/u/v: (B, 1) intrinsics; trans: (B, 3); rot: (B, 3, 3).
    Reference: modules/util.py:85-95.
    """
    z = kps[..., 2]
    x = (kps[..., 0] - u) / fx * z
    y = (kps[..., 1] - v) / fy * z
    cam = jnp.stack([x, y, z], axis=-1) - trans[..., None, :]
    # R is orthonormal for camera extrinsics but the reference uses a true
    # inverse; solve with the explicit inverse via linalg for exactness.
    rot_inv = jnp.linalg.inv(rot)
    return jnp.einsum("...ij,...kj->...ki", rot_inv, cam, precision=_PREC)


def convert_world_to_image(
    kps: Array, fx, fy, u, v, trans: Array, rot: Array
) -> Array:
    """World->camera then pinhole projection. Reference: modules/util.py:116-125."""
    cam = jnp.einsum("...ij,...kj->...ki", rot, kps, precision=_PREC) + trans[..., None, :]
    z = cam[..., 2]
    x = cam[..., 0] / z * fx + u
    y = cam[..., 1] / z * fy + v
    return jnp.stack([x, y, z], axis=-1)


def _cam_params(params: dict, mode: str):
    return (
        params[f"{mode}_trans_image"],
        params[f"{mode}_img"].shape,
        params[f"{mode}_pelvis"],
        params[f"{mode}_k_mat"],
        params[f"{mode}_trans_world"],
        params[f"{mode}_rot_world"],
    )


def _img_side(shape_img) -> int:
    """Spatial side of an image batch; accepts NCHW or NHWC batches.

    The reference reads shape[-1] of an NCHW tensor (modules/util.py:137-138);
    our pipeline is NHWC (TPU-native), so take the width axis accordingly.
    """
    # NHWC when the trailing axis is a small channel count.
    if len(shape_img) == 4 and shape_img[-1] in (1, 3):
        return int(shape_img[-2])
    return int(shape_img[-1])


def convert_patch_to_world(
    keypoints: Array,
    params: dict,
    mode: str,
    is_norm: bool = True,
    rect_width: float = 2000.0,
    mono: bool = False,
    patch: bool = True,
) -> Array:
    """Full patch->world chain keyed off the per-camera batch dict.

    Reference: modules/util.py:128-152 (incl. the mono visualization branch
    that fakes world coords: +128 z offset, (x,z,y) axis swap, negation).
    """
    trans_img, shape_img, pelvis, k_mat, trans_world, rot_world = _cam_params(
        params, mode
    )
    side = _img_side(shape_img)

    if patch:
        kp_img = convert_patch_to_image(
            keypoints,
            trans_img,
            side,
            _img_height(shape_img),
            side,
            rect_width / side,
            pelvis,
            is_norm=is_norm,
        )
    else:
        kp_img = keypoints

    if not mono:
        return convert_image_to_world(
            kp_img,
            k_mat[..., 0, [0]],
            k_mat[..., 1, [1]],
            k_mat[..., 0, [2]],
            k_mat[..., 1, [2]],
            trans_world,
            rot_world,
        )
    kp_world = kp_img.at[..., 2].add(128.0)
    kp_world = kp_world[..., jnp.array([0, 2, 1])]
    return -kp_world


def _img_height(shape_img) -> int:
    if len(shape_img) == 4 and shape_img[-1] in (1, 3):
        return int(shape_img[-3])
    return int(shape_img[-2])


def convert_world_to_patch(
    keypoints: Array,
    params: dict,
    mode: str,
    is_norm: bool = True,
    rect_width: float = 2000.0,
) -> Array:
    """Full world->patch chain. Reference: modules/util.py:155-168."""
    trans_img, shape_img, pelvis, k_mat, trans_world, rot_world = _cam_params(
        params, mode
    )
    side = _img_side(shape_img)
    kp_img = convert_world_to_image(
        keypoints,
        k_mat[..., 0, [0]],
        k_mat[..., 1, [1]],
        k_mat[..., 0, [2]],
        k_mat[..., 1, [2]],
        trans_world,
        rot_world,
    )
    return convert_image_to_patch(
        kp_img,
        trans_img,
        side,
        _img_height(shape_img),
        side,
        rect_width / side,
        pelvis,
        is_norm=is_norm,
    )


# ---------------------------------------------------------------------------
# Multi-view DLT triangulation.
# ---------------------------------------------------------------------------


def batch_triangulate(keypoints: Array, p_all: Array) -> Array:
    """DLT SVD triangulation of multi-view 2D detections.

    keypoints: (B, V, K, 3) image-pixel detections with confidence in ch 2
    (the reference feeds metric depth there and uses it only as a positive
    per-view weight); p_all: (B, V, 3, 4) projection matrices.
    Returns (B, K, 4): xyz world + mean confidence.

    Reference: modules/util.py:198-230.
    """
    vis = (keypoints[..., -1] > 0).astype(keypoints.dtype).sum(axis=1)  # (B,K)
    conf3d = keypoints[..., -1].sum(axis=1) / vis

    p0 = p_all[:, None, :, 0, :]  # (B, 1, V, 4)
    p1 = p_all[:, None, :, 1, :]
    p2 = p_all[:, None, :, 2, :]

    u = jnp.transpose(keypoints[..., 0], (0, 2, 1))[..., None]  # (B, K, V, 1)
    v = jnp.transpose(keypoints[..., 1], (0, 2, 1))[..., None]
    conf = jnp.transpose(keypoints[..., 2], (0, 2, 1))[..., None]

    a_u = conf * (u * p2 - p0)  # (B, K, V, 4)
    a_v = conf * (v * p2 - p1)
    a = jnp.concatenate([a_u, a_v], axis=2)  # (B, K, 2V, 4)

    _, _, vh = jnp.linalg.svd(a, full_matrices=True)
    x = vh[:, :, -1, :]  # (B, K, 4)
    x = x / x[..., 3:]
    return jnp.concatenate([x[..., :3], conf3d[..., None]], axis=-1)


def triangulation(
    keypoints: dict,
    params: dict,
    cam_id_list,
    is_norm: bool = True,
    rect_width: float = 2000.0,
) -> Array:
    """Per-camera patch->image lift + DLT over all cameras.

    Reference: modules/util.py:171-195.
    """
    points, pmats = [], []
    for cam_id in cam_id_list:
        mode = f"cam_{cam_id}"
        trans_img, shape_img, pelvis, k_mat, trans_world, rot_world = (
            _cam_params(params, mode)
        )
        side = _img_side(shape_img)
        kp_img = convert_patch_to_image(
            keypoints[mode],
            trans_img,
            side,
            _img_height(shape_img),
            side,
            rect_width / side,
            pelvis,
            is_norm=is_norm,
        )
        points.append(kp_img[:, None])
        pmat = jnp.einsum(
            "...ij,...jk->...ik",
            k_mat,
            jnp.concatenate([rot_world, trans_world[..., None]], axis=-1),
            precision=_PREC,
        )
        pmats.append(pmat[:, None])
    points = jnp.concatenate(points, axis=1)
    pmats = jnp.concatenate(pmats, axis=1)
    return batch_triangulate(points, pmats)[..., :3]


# ---------------------------------------------------------------------------
# SMPL-side helpers.
# ---------------------------------------------------------------------------

# H36M joint re-ordering applied after the SMPL->H36M linear regressor:
# swap the L/R limb blocks [11..13] <-> [14..16]. Reference: modules/util.py:333.
_H36M_SWAP_SRC = (11, 12, 13, 14, 15, 16)
_H36M_SWAP_DST = (14, 15, 16, 11, 12, 13)


def smpl_to_h36m(verts: Array, h36m_regressor: Array) -> Array:
    """Regress 17 H36M joints from SMPL verts, swap L/R, append thorax
    (= mean of the shoulders), pelvis-center. Returns (B, 18, 3).

    Reference: modules/util.py:331-341.
    """
    joints = jnp.einsum("bki,lk->bli", verts, h36m_regressor, precision=_PREC)
    joints = joints.at[:, jnp.asarray(_H36M_SWAP_SRC)].set(
        joints[:, jnp.asarray(_H36M_SWAP_DST)]
    )
    thorax = joints[:, jnp.asarray([11, 14]), :].mean(axis=1, keepdims=True)
    joints = jnp.concatenate([joints, thorax], axis=1)
    return joints - joints[:, :1, :]


def convert_pelvis_to_world(x: dict, mode: str) -> Array:
    """Camera-frame pelvis -> world. Reference: modules/util.py:343-352."""
    pelvis = x[f"{mode}_pelvis"][:, None, :]
    trans_world = x[f"{mode}_trans_world"]
    rot_world = x[f"{mode}_rot_world"]
    rot_inv = jnp.linalg.inv(rot_world)
    return jnp.einsum(
        "...ij,...kj->...ki",
        rot_inv,
        pelvis - trans_world[:, None, :],
        precision=_PREC,
    )


def project_smpl_to_patch_kps(
    global_rot_params: Array,
    pose_params: Array,
    shape_params: Array,
    smpl_forward,
    h36m_regressor: Array,
    x: dict,
    mode: str,
    convert_verts: bool = False,
):
    """SMPL forward (global rotation applied separately, post-regressor),
    m -> mm, shift to the sample's world pelvis, project world -> patch.

    `smpl_forward(pose72, betas10) -> (verts, joints)` is a pure function
    (the JAX SMPL layer's apply). Reference: modules/util.py:356-387.
    """
    batch = pose_params.shape[0]
    full_pose = jnp.zeros((batch, 72), dtype=pose_params.dtype)
    full_pose = full_pose.at[:, 3:].set(pose_params)
    verts, _ = smpl_forward(full_pose, shape_params)

    pelvis = convert_pelvis_to_world(x, mode)

    if convert_verts:
        verts = jnp.einsum("bij,bjk->bik", verts, global_rot_params, precision=_PREC)
        return verts * 1000.0 + pelvis

    joints = smpl_to_h36m(verts, h36m_regressor)
    joints = jnp.einsum("bij,bjk->bik", joints, global_rot_params, precision=_PREC)
    joints = joints * 1000.0 + pelvis
    return convert_world_to_patch(joints, x, mode, is_norm=False)


# ---------------------------------------------------------------------------
# Pose augmentations for the adversarial stream (rng-keyed, functional).
# ---------------------------------------------------------------------------


def random_rotation_3d(key: jax.Array, keypoints: Array) -> Array:
    """Rotate each pose about the z axis by a uniform angle in [-pi/4, pi/4].

    Matches the reference's row-vector convention kps @ R.
    Reference: modules/util.py:389-407.
    """
    b = keypoints.shape[0]
    angle = (jax.random.uniform(key, (b,)) - 0.5) * 0.5 * jnp.pi
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rot = jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return jnp.einsum("bij,bjk->bik", keypoints, rot, precision=_PREC)


_FLIP_LEG_SRC = (1, 2, 3, 4, 5, 6)
_FLIP_LEG_DST = (4, 5, 6, 1, 2, 3)
_FLIP_ARM_SRC = (11, 12, 13, 14, 15, 16)
_FLIP_ARM_DST = (14, 15, 16, 11, 12, 13)


def flip_3d(key: jax.Array, keypoints: Array) -> Array:
    """Randomly swap either the leg or the arm L/R joint blocks.

    Reference: modules/util.py:409-416.
    """
    legs = keypoints.at[:, jnp.asarray(_FLIP_LEG_SRC)].set(
        keypoints[:, jnp.asarray(_FLIP_LEG_DST)]
    )
    arms = keypoints.at[:, jnp.asarray(_FLIP_ARM_SRC)].set(
        keypoints[:, jnp.asarray(_FLIP_ARM_DST)]
    )
    return jnp.where(jax.random.uniform(key, ()) < 0.5, legs, arms)


def my_truncated_normal(
    key: jax.Array,
    pos: float,
    neg: float,
    size=(1, 1),
    ignore: float = 0.4,
    mean: float = 0.0,
) -> Array:
    """Rule-based half-truncated-normal sampler for SMPL pose angles.

    With prob `ignore` return zeros; otherwise pick the positive or negative
    branch with equal probability and sample |N(0, (width/1.96)^2)| clipped to
    [-width, width], signed by the branch, shifted by `mean`.
    Reference: modules/util.py:233-256.
    """
    k_ig, k_sign, k_n = jax.random.split(key, 3)
    use_pos = jax.random.uniform(k_sign, ()) < 0.5
    width = jnp.where(use_pos, pos, neg)
    flag = jnp.where(use_pos, 1.0, -1.0)
    std = width / 1.96
    sample = jnp.clip(jax.random.normal(k_n, size) * std, -width, width)
    out = jnp.abs(sample) * flag + mean
    degenerate = jnp.logical_or(
        jnp.logical_and(use_pos, pos == mean),
        jnp.logical_and(jnp.logical_not(use_pos), neg == mean),
    )
    zero = jnp.zeros(size)
    out = jnp.where(degenerate, zero, out)
    return jnp.where(jax.random.uniform(k_ig, ()) < ignore, zero, out)


# Per-channel (72 = 24 joints x 3 axes) angle ranges in degrees for the
# rule-based SMPL pose prior; entries are (pos, neg) or (pos, neg, mean) or a
# single root-angle bound. Reference: modules/util.py:259-315.
RULE_RANGES = (
    (5,), (180,), (5,),
    (45, 60), (10, 10), (30, 0),
    (45, 60), (10, 10), (0, 30),
    (60, 20), (30, 30), (30, 30),
    (70, 0), (20, 20), (10, 10),
    (70, 0), (20, 20), (10, 10),
    (20, 10), (0, 0), (15, 15),
) + ((0, 0),) * 24 + (
    (15, 15), (50, 50), (15, 15),
    (90, 90), (50, 120), (150, 30, -60),
    (90, 90), (120, 50), (30, 150, 60),
    (60, 60), (0, 120), (15, 15),
    (60, 60), (120, 0), (15, 15),
) + ((0, 0),) * 12

RULE_RANGES_NEGATIVE = (
    (5,), (180,), (5,),
    (70, 90), (10, 10), (30, 0),
    (70, 90), (10, 10), (0, 30),
    (30, 40), (30, 30), (30, 30),
    (10, 50), (20, 20), (10, 10),
    (10, 50), (20, 20), (10, 10),
    (20, 10), (0, 0), (15, 15),
) + ((0, 0),) * 24 + (
    (15, 15), (50, 50), (15, 15),
    (90, 90), (50, 120), (150, 30, -60),
    (90, 90), (120, 50), (30, 150, 60),
    (60, 60), (0, 120), (15, 15),
    (60, 60), (120, 0), (15, 15),
) + ((0, 0),) * 12


def rule_transformation(
    key: jax.Array, batch_size: int, gen_negative: bool = False
):
    """Sample SMPL (pose72, beta10) from the hand-tuned per-joint prior.

    Reference: modules/util.py:259-328.
    """
    ranges = RULE_RANGES_NEGATIVE if gen_negative else RULE_RANGES
    keys = jax.random.split(key, len(ranges) + 1)
    beta = my_truncated_normal(
        keys[-1], 1.5, 1.5, size=(batch_size, 10), ignore=0.0
    )
    deg = jnp.pi / 180.0
    cols = []
    for i, r in enumerate(ranges):
        if len(r) == 1:
            col = my_truncated_normal(
                keys[i], r[0] * deg, r[0] * deg, size=(batch_size,), ignore=0.0
            )
        elif len(r) == 2:
            col = my_truncated_normal(
                keys[i], r[0] * deg, r[1] * deg, size=(batch_size,)
            )
        else:
            col = my_truncated_normal(
                keys[i], r[0] * deg, r[1] * deg, size=(batch_size,),
                mean=r[2] * deg,
            )
        cols.append(col)
    pose = jnp.stack(cols, axis=1)
    return pose, beta
