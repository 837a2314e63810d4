"""SMPL body model as a pure, fully-batched JAX function.

The reference wraps smplpytorch (chumpy pkl deserialization + a Python loop
over 24 kinematic-chain joints + per-joint Rodrigues calls, reference:
modules/smplpytorch/pytorch/smpl_layer.py:63-156, tensutils.py:6-19). Here:

  * model arrays are loaded once from an .npz produced offline by
    tools/smpl_pkl_to_npz.py (no chumpy at runtime);
  * Rodrigues runs batched over all 24 joints at once;
  * the kinematic chain is an unrolled 24-step composition (static
    topology, so XLA sees straight-line code);
  * blend shapes / pose-corrective shapes / LBS are einsums on the MXU.

Outputs are identical to the reference: (verts (B, 6890, 3), joints
(B, 24, 3)) in meters, optionally centered on `center_idx`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST


class SmplModel(NamedTuple):
    """Static SMPL arrays (fp32)."""

    v_template: jax.Array  # (V, 3)
    shapedirs: jax.Array  # (V, 3, 10)
    posedirs: jax.Array  # (V, 3, 207)
    j_regressor: jax.Array  # (24, V)
    weights: jax.Array  # (V, 24)
    kintree_parents: tuple  # length 24, parents[0] is unused/root
    faces: np.ndarray  # (F, 3) int, host-side only
    betas_mean: jax.Array  # (10,) default betas


def load_smpl_npz(path: str) -> SmplModel:
    data = np.load(path, allow_pickle=False)
    return SmplModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(data["shapedirs"], jnp.float32),
        posedirs=jnp.asarray(data["posedirs"], jnp.float32),
        j_regressor=jnp.asarray(data["j_regressor"], jnp.float32),
        weights=jnp.asarray(data["weights"], jnp.float32),
        kintree_parents=tuple(int(p) for p in data["kintree_parents"]),
        faces=np.asarray(data["faces"]),
        betas_mean=jnp.asarray(data.get("betas_mean", np.zeros(10)), jnp.float32),
    )


def random_smpl_model(key, num_verts: int = 128) -> SmplModel:
    """Small random model with valid topology — test fixture only."""
    ks = jax.random.split(key, 5)
    parents = (0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16,
               17, 18, 19, 20, 21)
    return SmplModel(
        v_template=jax.random.normal(ks[0], (num_verts, 3)) * 0.3,
        shapedirs=jax.random.normal(ks[1], (num_verts, 3, 10)) * 0.01,
        posedirs=jax.random.normal(ks[2], (num_verts, 3, 207)) * 0.001,
        j_regressor=jax.nn.softmax(
            jax.random.normal(ks[3], (24, num_verts)), axis=-1
        ),
        weights=jax.nn.softmax(jax.random.normal(ks[4], (num_verts, 24))),
        kintree_parents=parents,
        faces=np.zeros((1, 3), np.int32),
        betas_mean=jnp.zeros(10),
    )


def batch_rodrigues(axisang: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) via quaternions.

    Keeps the reference's ||v + 1e-8|| regularization (reference:
    modules/smplpytorch/pytorch/rodrigues_layer.py:41-52).
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    w = jnp.cos(half)[..., 0]
    xyz = jnp.sin(half) * axis
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(*axisang.shape[:-1], 3, 3)


def smpl_forward(
    model: SmplModel,
    pose_axisang: jax.Array,  # (B, 72)
    betas: jax.Array | None = None,  # (B, 10)
    trans: jax.Array | None = None,  # (B, 3)
    center_idx: int | None = 0,
) -> tuple[jax.Array, jax.Array]:
    """SMPL forward: (verts (B, V, 3), joints (B, 24, 3)) in meters.

    Reference: modules/smplpytorch/pytorch/smpl_layer.py:63-156.
    """
    b = pose_axisang.shape[0]
    rots = batch_rodrigues(pose_axisang.reshape(b, 24, 3))  # (B, 24, 3, 3)

    if betas is None:
        betas = jnp.broadcast_to(model.betas_mean[None], (b, 10))

    # Blend shapes: v_shaped = template + shapedirs . betas
    v_shaped = model.v_template[None] + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, betas, precision=_PREC
    )
    joints_rest = jnp.einsum(
        "jv,bvc->bjc", model.j_regressor, v_shaped, precision=_PREC
    )  # (B, 24, 3)

    # Pose-corrective blendshapes use the 23 non-root rotations minus I.
    pose_map = (rots[:, 1:] - jnp.eye(3)).reshape(b, 207)
    v_posed = v_shaped + jnp.einsum(
        "vcp,bp->bvc", model.posedirs, pose_map, precision=_PREC
    )

    # Kinematic chain: unrolled 24-step 4x4 composition.
    def with_zeros(rot3x3, t3):
        top = jnp.concatenate([rot3x3, t3[..., None]], axis=-1)  # (B, 3, 4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0]), (b, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)  # (B, 4, 4)

    results = [with_zeros(rots[:, 0], joints_rest[:, 0])]
    for i in range(1, 24):
        parent = model.kintree_parents[i]
        rel = with_zeros(
            rots[:, i], joints_rest[:, i] - joints_rest[:, parent]
        )
        results.append(
            jnp.einsum(
                "bij,bjk->bik", results[parent], rel, precision=_PREC
            )
        )
    g_global = jnp.stack(results, axis=1)  # (B, 24, 4, 4)

    # Remove the rest-pose joint location from each transform (inverse bind).
    j_h = jnp.concatenate(
        [joints_rest, jnp.zeros((b, 24, 1))], axis=-1
    )  # (B, 24, 4)
    correction = jnp.einsum(
        "bjik,bjk->bji", g_global, j_h, precision=_PREC
    )  # (B, 24, 4)
    # Subtract the correction in the translation column only (th_pack).
    g_adj = g_global - jnp.concatenate(
        [jnp.zeros((b, 24, 4, 3)), correction[..., None]], axis=-1
    )

    # LBS: per-vertex transform = sum_j w_vj G_j
    t_per_vert = jnp.einsum(
        "bjmn,vj->bvmn", g_adj, model.weights, precision=_PREC
    )
    v_h = jnp.concatenate([v_posed, jnp.ones((b, v_posed.shape[1], 1))], -1)
    verts = jnp.einsum(
        "bvmn,bvn->bvm", t_per_vert, v_h, precision=_PREC
    )[..., :3]
    joints = g_global[..., :3, 3]

    if trans is not None:
        verts = verts + trans[:, None]
        joints = joints + trans[:, None]
    elif center_idx is not None:
        center = joints[:, center_idx : center_idx + 1]
        verts = verts - center
        joints = joints - center
    return verts, joints
