"""Loss primitives for the unsupervised pose pipeline.

Semantics mirror the reference's loss library (reference:
modules/base_losses/loss_func.py and modules/base_losses/integral.py); all
functions are pure and broadcast over leading batch axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def compute_mask_reconstruction_loss(
    mask: Array, gt: Array, weight: Array | None = None, use_clip: bool = False
) -> Array:
    """MSE between rendered and GT masks with the reference's exact (and
    asymmetric) `use_clip` semantics (reference: loss_func.py:4-16, reduced
    by the caller's `.mean()` at reference train.py:182):

      * weight is None: the MSE is reduced to a scalar FIRST
        (reduction='mean'), so `use_clip` multiplies that scalar by the
        activation filter tensor `(mask > 0.1)` — after the trainer's final
        mean this is `mean((mask-gt)^2) * mean(mask > 0.1)`. The filter is
        non-differentiable, so the gradient is the plain-MSE gradient to
        EVERY pixel, scaled by the active-pixel fraction.
      * weight given: elementwise MSE (reduction='none'), optionally masked
        by the filter, weighted, then meaned — gradient reaches only
        filter-active pixels.

    The shipped S2 configs (recons_loss: use_dis_map false) hit the first
    branch; preserving it exactly matters for training dynamics.
    """
    if weight is None:
        loss = ((mask - gt) ** 2).mean()
        if use_clip:
            # (mask > 0.1) is non-differentiable: value scales the scalar
            # MSE; gradient flows only through the MSE term — both match
            # torch (the bool->float cast carries no grad there either).
            loss = loss * (mask > 0.1).astype(loss.dtype).mean()
        return loss
    loss = (mask - gt) ** 2
    if use_clip:
        loss = loss * (mask > 0.1).astype(loss.dtype)
    return (loss * weight).mean()


# Distal/proximal joint pairs of the 8 symmetric limb bones (R arm, L arm,
# R leg, L leg x upper/lower). Reference: loss_func.py:18-25.
_BONE_CHILD = (16, 15, 13, 12, 3, 2, 6, 5)
_BONE_PARENT = (15, 14, 12, 11, 2, 1, 5, 4)


def compute_bone_sym_loss(keypoints: Array) -> Array:
    """L/R limb-length symmetry: MSE between paired bone lengths (in meters,
    hence the 1e-3 scale on mm input). Reference: loss_func.py:18-25.
    """
    bone = (
        keypoints[:, jnp.asarray(_BONE_CHILD), :]
        - keypoints[:, jnp.asarray(_BONE_PARENT), :]
    )
    length = jnp.linalg.norm(bone, axis=2) * 1e-3
    left = length[:, jnp.asarray((0, 2, 4, 6))]
    right = length[:, jnp.asarray((1, 3, 5, 7))]
    return ((left - right) ** 2).mean()


def compute_kp_sym_loss(keypoints: Array, is_3d: bool = True) -> Array:
    """Shoulder/hip midpoints should coincide with thorax/pelvis.

    center = ((kp11 + kp14)/2, (kp1 + kp4)/2) vs (thorax=kp[-1], pelvis=kp0).
    3D poses are in mm and scaled to meters first. Reference: loss_func.py:27-35.
    """
    center = (
        keypoints[:, jnp.asarray((11, 1)), :] + keypoints[:, jnp.asarray((14, 4)), :]
    ) / 2.0
    target = keypoints[:, jnp.asarray((keypoints.shape[1] - 1, 0)), :]
    if is_3d:
        return (((center - target) * 1e-3) ** 2).mean()
    return ((center - target) ** 2).mean()


def compute_supervision(
    keypoint: Array,
    keypoint_gt: Array,
    feature_shape=None,
    mode: str = "mean",
) -> Array:
    """MSE supervision; optionally un-normalizes [-1,1] xy (and z) into
    feature-map pixels first. Reference: loss_func.py:38-52.
    """
    if feature_shape is not None:
        xy = (keypoint[..., :2] + 1.0) / 2.0
        x = xy[..., 0] * (feature_shape[0] - 1)
        y = xy[..., 1] * (feature_shape[1] - 1)
        parts = [x[..., None], y[..., None]]
        if keypoint.shape[-1] == 3:
            parts.append(keypoint[..., 2:3] * (feature_shape[2] - 1))
        keypoint = jnp.concatenate(parts, axis=-1)

    sq = (keypoint - keypoint_gt) ** 2
    if mode == "mean":
        return sq.mean()
    if mode == "sum":
        return sq.sum() / keypoint.shape[0]
    raise ValueError(f"unknown reduction mode {mode}")


def compute_disc_loss(pred_logits: Array, gt_logits: Array | None) -> Array:
    """LSGAN losses with min-over-hypothesis reduction on 3-dim logits.

    pred_logits: (B, 1) or (B, H, 1). gt_logits None selects the generator
    loss ((pred-1)^2); otherwise the discriminator pair
    0.5 (gt-1)^2 + 0.5 pred^2. Reference: loss_func.py:54-76.
    """

    def _reduce(term: Array) -> Array:
        if term.ndim == 2:
            return term.mean()
        if term.ndim == 3:
            return term.min(axis=1).mean()
        raise ValueError("logits must be (B, 1) or (B, H, 1)")

    if gt_logits is None:
        return _reduce((pred_logits - 1.0) ** 2)
    return 0.5 * _reduce((gt_logits - 1.0) ** 2) + 0.5 * _reduce(
        pred_logits**2
    )


def generate_joint_location_label(
    patch_width: float, patch_height: float, joints: Array
) -> Array:
    """Normalize pixel joints to [-0.5, 0.5] xy and depth/width z, flattened.

    Reference: modules/base_losses/integral.py:1-13.
    """
    x = joints[..., 0] / patch_width - 0.5
    y = joints[..., 1] / patch_height - 0.5
    z = joints[..., 2] / patch_width
    out = jnp.stack([x, y, z], axis=-1)
    return out.reshape(*out.shape[:-2], -1)
