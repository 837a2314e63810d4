"""SMPL full-chain integration: rule-based pose prior -> SMPL forward ->
H36M regression -> world placement -> patch projection
(reference: modules/util.py:233-387)."""

import jax
import jax.numpy as jnp
import numpy as np

from x_as_supervision_tpu.models import smpl as S
from x_as_supervision_tpu.ops import geometry as G


def _cam_dict(b, side=64):
    rng = np.random.default_rng(0)
    k_mat = np.zeros((b, 3, 3))
    k_mat[:, 0, 0] = k_mat[:, 1, 1] = 1000.0
    k_mat[:, 0, 2] = k_mat[:, 1, 2] = 500.0
    k_mat[:, 2, 2] = 1.0
    rot = np.tile(np.eye(3), (b, 1, 1))
    trans = np.zeros((b, 3))
    trans[:, 2] = 5000.0
    affine = np.tile(np.array([[0.25, 0.0, 10.0], [0.0, 0.25, 5.0]]),
                     (b, 1, 1))
    pelvis = np.zeros((b, 3))
    pelvis[:, 2] = 5000.0
    return {
        "cam_0_img": jnp.zeros((b, side, side, 3)),
        "cam_0_trans_image": jnp.asarray(affine),
        "cam_0_pelvis": jnp.asarray(pelvis),
        "cam_0_k_mat": jnp.asarray(k_mat),
        "cam_0_trans_world": jnp.asarray(trans),
        "cam_0_rot_world": jnp.asarray(rot),
    }


def test_rule_prior_through_smpl_to_patch():
    b = 2
    model = S.random_smpl_model(jax.random.PRNGKey(0))
    reg = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (17, 128)).astype(np.float32)
    )
    pose, beta = G.rule_transformation(jax.random.PRNGKey(2), b)
    global_rot = jnp.tile(jnp.eye(3), (b, 1, 1))
    x = _cam_dict(b)

    kps_patch = G.project_smpl_to_patch_kps(
        global_rot, pose[:, 3:], beta,
        lambda p, s: S.smpl_forward(model, p, s),
        reg, x, "cam_0",
    )
    assert kps_patch.shape == (b, 18, 3)
    assert np.isfinite(np.asarray(kps_patch)).all()

    verts = G.project_smpl_to_patch_kps(
        global_rot, pose[:, 3:], beta,
        lambda p, s: S.smpl_forward(model, p, s),
        reg, x, "cam_0", convert_verts=True,
    )
    assert verts.shape == (b, 128, 3)
    # world verts sit around the pelvis (z ~ 0 in world after -R t with
    # identity rot: world pelvis = (0,0,5000) - (0,0,5000) = origin area)
    assert np.abs(np.asarray(verts).mean(axis=(0, 1))).max() < 2000
