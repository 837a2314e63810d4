import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x_as_supervision_tpu.ops import geometry as G
import oracles


RNG = np.random.default_rng(0)


def rand_cam(b):
    """Random plausible camera: intrinsics, a rotation, translation, crop."""
    k_mat = np.zeros((b, 3, 3))
    k_mat[:, 0, 0] = RNG.uniform(1000, 1200, b)
    k_mat[:, 1, 1] = RNG.uniform(1000, 1200, b)
    k_mat[:, 0, 2] = RNG.uniform(480, 520, b)
    k_mat[:, 1, 2] = RNG.uniform(480, 520, b)
    k_mat[:, 2, 2] = 1.0
    rot = np.stack([_random_rotation() for _ in range(b)])
    trans = RNG.uniform(-100, 100, (b, 3))
    trans[:, 2] += 5000
    affine = RNG.uniform(0.2, 0.4, (b, 2, 3))
    affine[:, 0, 1] = RNG.uniform(-0.05, 0.05, b)
    affine[:, 1, 0] = RNG.uniform(-0.05, 0.05, b)
    affine[:, :, 2] = RNG.uniform(-30, 30, (b, 2))
    pelvis = RNG.uniform(-50, 50, (b, 3))
    pelvis[:, 2] += 5000
    return k_mat, rot, trans, affine, pelvis


def _random_rotation():
    a = RNG.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def test_make_coordinate_grid():
    got = np.asarray(G.make_coordinate_grid(5, 7))
    want = oracles.grid_xy(5, 7)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("num_lines", [17, 25])
def test_draw_lines_matches_naive(num_lines):
    b, k, size = 2, 18, 16
    kps = RNG.uniform(-0.9, 0.9, (b, k, 2)).astype(np.float32)
    parents = RNG.integers(0, k, num_lines).tolist()
    children = RNG.integers(0, k, num_lines).tolist()
    width = 3.0e-3
    got = np.asarray(G.draw_lines(jnp.asarray(kps), size, parents, children, width))
    want = oracles.draw_lines_naive(kps, size, parents, children, width)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_patch_image_world_roundtrip():
    b, k = 3, 18
    k_mat, rot, trans, affine, pelvis = rand_cam(b)
    kps = RNG.uniform(-0.8, 0.8, (b, k, 3)).astype(np.float64)

    img = G.convert_patch_to_image(
        jnp.asarray(kps), jnp.asarray(affine), 256, 256, 256, 2000.0 / 256, jnp.asarray(pelvis)
    )
    want = oracles.patch_to_image_naive(kps, affine, 256, 256, 256, 2000.0 / 256, pelvis)
    np.testing.assert_allclose(np.asarray(img), want, rtol=1e-4, atol=1e-3)

    back = G.convert_image_to_patch(
        img, jnp.asarray(affine), 256, 256, 256, 2000.0 / 256, jnp.asarray(pelvis)
    )
    np.testing.assert_allclose(np.asarray(back), kps, rtol=1e-3, atol=1e-3)

    fx, fy = k_mat[:, 0, [0]], k_mat[:, 1, [1]]
    u, v = k_mat[:, 0, [2]], k_mat[:, 1, [2]]
    world = G.convert_image_to_world(
        img, jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(u), jnp.asarray(v),
        jnp.asarray(trans), jnp.asarray(rot),
    )
    want_world = oracles.image_to_world_naive(np.asarray(img), fx, fy, u, v, trans, rot)
    np.testing.assert_allclose(np.asarray(world), want_world, rtol=1e-3, atol=1e-2)

    img_again = G.convert_world_to_image(
        world, jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(u), jnp.asarray(v),
        jnp.asarray(trans), jnp.asarray(rot),
    )
    np.testing.assert_allclose(np.asarray(img_again), np.asarray(img), rtol=1e-3, atol=1e-2)


def _batch_dict(b, side=32):
    k_mat, rot, trans, affine, pelvis = rand_cam(b)
    x = {}
    for cam in (0, 1):
        key = f"cam_{cam}"
        x[f"{key}_img"] = jnp.zeros((b, side, side, 3))
        x[f"{key}_trans_image"] = jnp.asarray(affine)
        x[f"{key}_pelvis"] = jnp.asarray(pelvis)
        x[f"{key}_k_mat"] = jnp.asarray(k_mat)
        x[f"{key}_trans_world"] = jnp.asarray(trans)
        x[f"{key}_rot_world"] = jnp.asarray(rot)
    return x


def test_world_patch_roundtrip_via_dict():
    b, k = 2, 18
    x = _batch_dict(b)
    kps = jnp.asarray(RNG.uniform(-0.5, 0.5, (b, k, 3)))
    world = G.convert_patch_to_world(kps, x, "cam_0", is_norm=True)
    back = G.convert_world_to_patch(world, x, "cam_0", is_norm=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(kps), rtol=1e-3, atol=1e-3)


def test_triangulation_recovers_world_points():
    """Project known world points into two synthetic cameras and verify the
    DLT recovers them."""
    b, k = 2, 18
    world_pts = RNG.uniform(-500, 500, (b, k, 3))
    world_pts[..., 2] += 0.0

    x = {}
    cams = []
    for cam in (0, 1, 2):
        k_mat, rot, trans, affine, _ = rand_cam(b)
        key = f"cam_{cam}"
        img = oracles.world_to_image_naive(
            world_pts, k_mat[:, 0, [0]], k_mat[:, 1, [1]], k_mat[:, 0, [2]], k_mat[:, 1, [2]], trans, rot
        )
        # patch coords via the affine (is_norm False keeps pixels)
        patch = np.zeros_like(img)
        for bb in range(b):
            patch[bb, :, :2] = (affine[bb, :, :2] @ img[bb, :, :2].T).T + affine[bb, :, 2]
        pelvis = np.zeros((b, 3))
        patch[..., 2] = img[..., 2] / (2000.0 / 256)  # invert depth scale, pelvis 0
        x[f"{key}_img"] = jnp.zeros((b, 256, 256, 3))
        x[f"{key}_trans_image"] = jnp.asarray(affine)
        x[f"{key}_pelvis"] = jnp.asarray(pelvis)
        x[f"{key}_k_mat"] = jnp.asarray(k_mat)
        x[f"{key}_trans_world"] = jnp.asarray(trans)
        x[f"{key}_rot_world"] = jnp.asarray(rot)
        cams.append(cam)

    kp_dict = {f"cam_{c}": jnp.asarray(
        np.concatenate([
            np.asarray(
                # patch xy for this camera
                _patch_for(x, c, world_pts)
            )
        ], axis=-1)
    ) for c in cams}
    tri = G.triangulation(kp_dict, x, cams, is_norm=False)
    np.testing.assert_allclose(np.asarray(tri), world_pts, rtol=1e-2, atol=2.0)


def _patch_for(x, cam, world_pts):
    key = f"cam_{cam}"
    return G.convert_world_to_patch(
        jnp.asarray(world_pts), x, key, is_norm=False
    )


def test_smpl_to_h36m_shape_and_centering():
    b = 2
    verts = jnp.asarray(RNG.normal(size=(b, 100, 3)))
    reg = jnp.asarray(RNG.uniform(0, 1, (17, 100)))
    joints = G.smpl_to_h36m(verts, reg)
    assert joints.shape == (b, 18, 3)
    np.testing.assert_allclose(np.asarray(joints[:, 0]), 0.0, atol=1e-5)
    # thorax is the shoulder midpoint
    mid = (joints[:, 11] + joints[:, 14]) / 2
    np.testing.assert_allclose(np.asarray(joints[:, 17]), np.asarray(mid), atol=1e-5)


def test_random_rotation_preserves_z_and_norm():
    key = jax.random.PRNGKey(0)
    kps = jnp.asarray(RNG.normal(size=(4, 18, 3)))
    out = G.random_rotation_3d(key, kps)
    np.testing.assert_allclose(np.asarray(out[..., 2]), np.asarray(kps[..., 2]), atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(kps), axis=-1),
        atol=1e-4,
    )


def test_rule_transformation_shapes_and_bounds():
    pose, beta = G.rule_transformation(jax.random.PRNGKey(1), 8)
    assert pose.shape == (8, 72)
    assert beta.shape == (8, 10)
    # channels declared (0, 0) must be exactly zero
    np.testing.assert_allclose(np.asarray(pose[:, 21:45]), 0.0)
    np.testing.assert_allclose(np.asarray(pose[:, 60:72]), 0.0)
    assert np.all(np.abs(np.asarray(beta)) <= 1.5 + 1e-6)
