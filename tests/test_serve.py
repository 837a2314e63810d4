"""Serving path: PoseEstimator batch padding, preprocessing, world lift."""

import jax
import numpy as np

from test_train_step import TINY_CONFIG
from x_as_supervision_tpu.serve import PoseEstimator
from x_as_supervision_tpu.train.factory import build_gan_spec
import jax.numpy as jnp


def _estimator(batch_size=4):
    cfg = {**TINY_CONFIG}
    cfg["dataset_params"] = {
        "cam_id_list": [0],
        "dataiter": {"mean": [0.0, 0.0, 0.0], "std": [255.0, 255.0, 255.0]},
    }
    cfg["train_params"] = dict(TINY_CONFIG["train_params"], patch_width=64,
                               patch_height=64)
    spec = build_gan_spec(cfg)
    det_vars = spec.detector.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return PoseEstimator(cfg, det_vars=det_vars, batch_size=batch_size,
                         dtype=jnp.float32)


def test_partial_batch_padding_consistency():
    est = _estimator(batch_size=4)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (6, 64, 64, 3)).astype(np.float32)

    out = est(imgs)
    assert out.kps_patch.shape == (6, 2, 18, 3)
    assert out.kps_pixels.shape == (6, 2, 18, 3)
    # padding must not change per-image results: run image 5 alone
    single = est(imgs[5:6])
    np.testing.assert_allclose(
        single.kps_patch[0], out.kps_patch[5], atol=2e-5
    )
    # pixel conversion
    np.testing.assert_allclose(
        out.kps_pixels[..., 0], (out.kps_patch[..., 0] + 1) / 2 * 63,
        atol=1e-4,
    )


def test_world_lift_matches_geometry_op():
    est = _estimator()
    rng = np.random.default_rng(1)
    n, h = 3, 2
    kps = rng.uniform(-0.5, 0.5, (n, h, 18, 3)).astype(np.float32)
    cam = {
        "trans_image": np.tile(
            np.array([[0.25, 0, 8.0], [0, 0.25, 4.0]], np.float32), (n, 1, 1)
        ),
        "pelvis": np.tile(np.array([0, 0, 5000.0], np.float32), (n, 1)),
        "k_mat": np.tile(
            np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]],
                     np.float32), (n, 1, 1),
        ),
        "rot_world": np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
        "trans_world": np.tile(np.array([0, 0, 5000.0], np.float32), (n, 1)),
    }
    world = est.lift_to_world(kps, cam)
    assert world.shape == (n, h, 18, 3)
    assert np.isfinite(world).all()

    # cross-check one hypothesis against the geometry op directly
    from x_as_supervision_tpu.ops import geometry as G

    params = {
        "cam_0_trans_image": jnp.asarray(cam["trans_image"]),
        "cam_0_img": jnp.zeros((n, 64, 64, 3)),
        "cam_0_pelvis": jnp.asarray(cam["pelvis"]),
        "cam_0_k_mat": jnp.asarray(cam["k_mat"]),
        "cam_0_trans_world": jnp.asarray(cam["trans_world"]),
        "cam_0_rot_world": jnp.asarray(cam["rot_world"]),
    }
    direct = G.convert_patch_to_world(
        jnp.asarray(kps[:, 0]), params, "cam_0", is_norm=True
    )
    np.testing.assert_allclose(world[:, 0], np.asarray(direct), atol=1e-3)
