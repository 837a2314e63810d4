"""Composed generator / discriminator loss computation.

Pure-functional equivalents of the reference's Counter3DModel /
Counter3DDisc wrappers (reference: modules/model.py:24-264): given module
definitions, parameter/stat pytrees, and a batch dict, return the gated loss
menu and visualization outputs. Everything here traces into a single jitted
train step; the config-driven gating is static Python.

BatchNorm statistics are threaded sequentially through the detector
forwards in the same order the reference executes them, so the running-stat
trajectory matches torch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..ops import geometry as G
from ..ops import losses as L


def cal_links(parent_ids, line_select_ids=None, use_root=False, extension=True):
    """Bone (parent, child) lists for the line renderer / graph builders,
    with the 8 synthetic "body" edges appended for rendering.
    Reference: modules/model.py:8-22."""
    parent_ids = list(parent_ids)
    if not use_root:
        child_ids = list(range(1, len(parent_ids)))
        parent_ids = parent_ids[1:]
    else:
        child_ids = list(range(len(parent_ids)))

    if line_select_ids is not None:
        parent_ids = [parent_ids[i] for i in line_select_ids]
        child_ids = [child_ids[i] for i in line_select_ids]

    if extension:
        parent_ids = parent_ids + [7, 7, 7, 7, 0, 0, 1, 4]
        child_ids = child_ids + [1, 4, 11, 14, 2, 5, 14, 11]
    return parent_ids, child_ids


@dataclass(frozen=True)
class GanSpec:
    """Static composition config shared by the generator and discriminator
    steps (derived from model_params; reference: modules/model.py:24-48)."""

    detector: Any  # flax module
    discriminator: Any | None
    physique: Any | None
    cam_id_list: tuple
    loss_config: dict
    render_parent_ids: tuple  # cal_links(extension=True)
    render_child_ids: tuple
    body_width: float
    disc_sup_dim: int = 3
    use_aug: bool = False
    remat: bool = True

    @staticmethod
    def from_config(model_params, detector, discriminator, physique):
        line_select = model_params.get("line_select_ids")
        rp, rc = cal_links(
            model_params["parent_ids"], line_select_ids=line_select,
            use_root=False, extension=True,
        )
        disc_params = model_params.get("smpl_disc_params", {})
        return GanSpec(
            detector=detector,
            discriminator=discriminator,
            physique=physique,
            cam_id_list=tuple(model_params["cam_id_list"]),
            loss_config=model_params["loss_config"],
            render_parent_ids=tuple(rp),
            render_child_ids=tuple(rc),
            body_width=float(model_params.get("body_width", 3.0)) * 1e-3,
            disc_sup_dim=disc_params.get("disc_sup_dim", 3),
            use_aug=disc_params.get("use_aug", False),
        )


def _active_cams(spec: GanSpec, batch: dict):
    """Mono datasets carry a single 'cam_mono_*' view.
    Reference: modules/model.py:51-55."""
    if "cam_mono_img" in batch:
        return ("mono",)
    return spec.cam_id_list


def _detector_apply(spec, det_vars, img, rng, train):
    """One detector forward, returning decode + updated batch stats.

    Under `spec.remat` the forward is wrapped in jax.checkpoint: the step
    runs the detector up to 8x per iteration (4 cameras + 4 pseudo views,
    reference modules/model.py:62-69,145-164), and storing each forward's
    activations — in particular the (B, 64, 64, K, 64) softmax volume — for
    the backward pass exceeds HBM. Rematerialization trades one recompute
    per forward for an ~8x activation-memory reduction.
    """
    del rng  # the detector has no dropout; rngs are for the discriminator

    if not train:
        return spec.detector.apply(det_vars, img, train=False), det_vars

    def fwd(params, stats, img):
        out, mutated = spec.detector.apply(
            {"params": params, "batch_stats": stats},
            img, train=True, mutable=["batch_stats"],
        )
        return out.kps, out.depth_prob_map, mutated["batch_stats"]

    if spec.remat:
        fwd = jax.checkpoint(fwd)
    kps, depth_map, new_stats = fwd(
        det_vars["params"], det_vars.get("batch_stats", {}), img
    )
    from ..ops.integral import IntegralDecode

    return IntegralDecode(kps, depth_map), {
        "params": det_vars["params"],
        "batch_stats": new_stats,
    }


def _vmap_hypo(fn, kps_h):
    """Apply fn over the hypothesis axis of (B, H, K, C) -> (H, ...)."""
    return jax.vmap(fn, in_axes=1)(kps_h)


def generator_forward(
    spec: GanSpec,
    det_vars: dict,
    phys_vars: dict | None,
    disc_params: dict | None,
    batch: dict,
    rng: jax.Array,
    train: bool = True,
):
    """Generator-side loss menu.

    Returns (loss_values, outputs, new_det_vars, new_phys_vars). Loss gating
    follows the presence of keys in loss_config exactly as the reference
    (modules/model.py:98-190), including:
      * symmetry: min over hypotheses of (bone + kp [+2D kp]) scalars;
      * smpl_gen: LSGAN generator loss on the discriminator's logits of the
        normalized root-centered world pose; the un-augmented branch feeds
        stop_gradient'ed poses (reference detaches at modules/model.py:128 —
        its gradient reaches only the discriminator, which the reference's
        leftover-grad accumulation folds into the *next* disc update; see
        train/trainer.py for that bookkeeping);
      * smpl_pseudo_img: detector on pseudo renders, min-over-hypo MSE;
      * physique_recons / recons: mask reconstruction on the line render.
    """
    cams = _active_cams(spec, batch)
    loss_cfg = spec.loss_config
    losses: dict[str, jax.Array] = {}
    outputs: dict[str, jax.Array] = {}

    rngs = jax.random.split(rng, 8 * max(len(cams), 1) + 8)
    rng_i = iter(range(len(rngs)))

    kps_ori = {}
    kps_world = {}
    for cam in cams:
        ck = f"cam_{cam}"
        decode, det_vars = _detector_apply(
            spec, det_vars, batch[f"{ck}_img"], rngs[next(rng_i)], train
        )
        kps = decode.kps  # (B, H, K, 3)
        kps_ori[ck] = kps
        outputs[f"pose_2d_pred_{ck}_ori"] = kps[:1, 0]
        outputs[f"depth_map_{ck}"] = decode.depth_prob_map

        if cam == "mono":
            lift = lambda k: G.convert_patch_to_world(
                k, batch, ck, is_norm=True, rect_width=256.0, mono=True,
                patch=False,
            )
        else:
            lift = lambda k: G.convert_patch_to_world(
                k, batch, ck, is_norm=True
            )
        kps_world[ck] = _vmap_hypo(lift, kps).transpose(1, 0, 2, 3)
        outputs[f"pose_3d_depth_{ck}"] = kps_world[ck][:, 0]

    if "mono" not in cams:
        outputs["kp_gt_world"] = G.convert_patch_to_world(
            batch["cam_0_joints"], batch, "cam_0", is_norm=False
        )[:1]

    # Skeleton line rendering from hypothesis 0 (multi-hypo only differs in
    # z, so one render per camera suffices; reference modules/model.py:88-96).
    reconstructed = {}
    for cam in cams:
        ck = f"cam_{cam}"
        img_side = batch[f"{ck}_img"].shape[-2]
        def render(kps2d):
            hm = G.draw_lines(
                kps2d, img_side,
                spec.render_parent_ids, spec.render_child_ids,
                spec.body_width,
            )
            return hm.max(axis=1)[..., None]  # (B, S, S, 1) NHWC

        if spec.remat:
            render = jax.checkpoint(render)
        mask = render(kps_ori[ck][:, 0, :, :2])
        reconstructed[ck] = mask
        outputs[f"mask_heatmap_line_{ck}"] = mask

    if "symmetry_loss" in loss_cfg:
        w = loss_cfg["symmetry_loss"]["weight"]
        loss_sym = 0.0
        for cam in cams:
            if cam == "mono":
                continue
            ck = f"cam_{cam}"

            def _sym_one(kw, k2d):
                val = L.compute_bone_sym_loss(kw) * w["bone"]
                val = val + L.compute_kp_sym_loss(kw) * w["kp"]
                if "kp_2d" in w:
                    val = val + (
                        L.compute_kp_sym_loss(k2d[..., :2], is_3d=False)
                        * 1e2 * w["kp_2d"]
                    )
                return val

            per_hypo = jax.vmap(_sym_one, in_axes=(1, 1))(
                kps_world[ck], kps_ori[ck]
            )
            loss_sym = loss_sym + per_hypo.min()
        losses["symmetry"] = loss_sym

    if "smpl_gen_loss" in loss_cfg and disc_params is not None:
        loss_gen = 0.0
        for cam in cams:
            ck = f"cam_{cam}"
            pred_world = kps_world[ck]
            pred_world = (pred_world - pred_world[:, :, :1, :]) / 1000.0

            def disc_apply(kps):
                return spec.discriminator.apply(
                    {"params": disc_params}, kps, train=train,
                    rngs={"dropout": rngs[next(rng_i)]} if train else None,
                )

            detached = jax.lax.stop_gradient(
                pred_world[..., : spec.disc_sup_dim]
            )
            logits = jax.vmap(disc_apply, in_axes=1, out_axes=1)(detached)
            if not spec.use_aug:
                loss_gen = loss_gen + L.compute_disc_loss(logits, None)
            else:
                loss_gen = loss_gen + L.compute_disc_loss(logits, None) * 0.7
                rot = jax.vmap(
                    lambda k, key=rngs[next(rng_i)]: G.random_rotation_3d(
                        key, k
                    ),
                    in_axes=1, out_axes=1,
                )(pred_world)
                logits_rot = jax.vmap(disc_apply, in_axes=1, out_axes=1)(
                    rot[..., : spec.disc_sup_dim]
                )
                loss_gen = loss_gen + L.compute_disc_loss(logits_rot, None) * 0.3
        losses["smpl_gen"] = loss_gen * loss_cfg["smpl_gen_loss"]["weight"]

    if "smpl_pseudo_img_loss" in loss_cfg:
        loss_pseudo = 0.0
        for cam in cams:
            ck = f"cam_{cam}"
            decode, det_vars = _detector_apply(
                spec, det_vars, batch[f"{ck}_pseudo_img"],
                rngs[next(rng_i)], train,
            )
            pseudo_pred = decode.kps
            pseudo_gt = batch[f"{ck}_pseudo_joints"]

            outputs[f"pose_2d_pred_{ck}_pseudo"] = pseudo_pred[:1, 0]
            mono_lift = lambda k: G.convert_patch_to_world(
                k, batch, ck, is_norm=True, rect_width=256.0, mono=True,
                patch=False,
            )
            outputs[f"pose_3d_pred_{ck}_pseudo"] = mono_lift(
                pseudo_pred[:, 0]
            )[:1]
            outputs[f"pose_3d_gt_{ck}_pseudo"] = mono_lift(pseudo_gt)[:1]

            per_hypo = jax.vmap(
                lambda p: L.compute_supervision(p, pseudo_gt), in_axes=1
            )(pseudo_pred)
            loss_pseudo = loss_pseudo + per_hypo.min()
        losses["smpl_pseudo_img"] = (
            loss_pseudo * loss_cfg["smpl_pseudo_img_loss"]["weight"]
        )

    if "physique_recons_loss" in loss_cfg and spec.physique is not None:
        use_dis = loss_cfg["physique_recons_loss"]["use_dis_map"]
        loss_phy = 0.0
        for cam in cams:
            ck = f"cam_{cam}"
            if train:
                phy_mask, mutated = spec.physique.apply(
                    phys_vars, reconstructed[ck], train=True,
                    mutable=["batch_stats"],
                )
                phys_vars = {**phys_vars, "batch_stats": mutated["batch_stats"]}
            else:
                phy_mask = spec.physique.apply(
                    phys_vars, reconstructed[ck], train=False
                )
            outputs[f"mask_physique_{ck}"] = phy_mask[:1]
            loss_phy = loss_phy + L.compute_mask_reconstruction_loss(
                phy_mask,
                batch[f"{ck}_mask"],
                weight=batch[f"{ck}_geodesic_dis"] if use_dis else None,
            )
        losses["physique_recons"] = (
            loss_phy * loss_cfg["physique_recons_loss"]["weight"]
        )

    if "recons_loss" in loss_cfg:
        use_dis = loss_cfg["recons_loss"]["use_dis_map"]
        loss_rec = 0.0
        for cam in cams:
            ck = f"cam_{cam}"
            loss_rec = loss_rec + L.compute_mask_reconstruction_loss(
                reconstructed[ck],
                batch[f"{ck}_mask"],
                weight=batch[f"{ck}_geodesic_dis"] if use_dis else None,
                use_clip=True,
            )
        losses["reconstruction"] = loss_rec * loss_cfg["recons_loss"]["weight"]

    return losses, outputs, det_vars, phys_vars


def discriminator_forward(
    spec: GanSpec,
    disc_params: dict,
    det_vars: dict,
    batch: dict,
    rng: jax.Array,
    train: bool = True,
):
    """Discriminator-side LSGAN loss: real = pseudo SMPL joints from the
    data stream, fake = detector predictions (stop-gradient).

    Returns (loss, outputs, new_det_vars).
    Reference: modules/model.py:218-264.
    """
    cams = _active_cams(spec, batch)
    outputs: dict[str, jax.Array] = {}
    loss_disc = 0.0

    rngs = jax.random.split(rng, 8 * max(len(cams), 1) + 8)
    rng_i = iter(range(len(rngs)))

    for cam in cams:
        ck = f"cam_{cam}"
        decode, det_vars = _detector_apply(
            spec, det_vars, batch[f"{ck}_img"], rngs[next(rng_i)], train
        )
        pred = jax.lax.stop_gradient(decode.kps)  # (B, H, K, 3)

        smpl_joints = batch[f"{ck}_pseudo_joints"]
        smpl_world = G.convert_patch_to_world(
            smpl_joints, batch, ck, is_norm=True, rect_width=256.0,
            mono=True, patch=False,
        )
        outputs[f"pose_smpl_2d_{ck}"] = smpl_joints[:1]
        outputs[f"pose_smpl_3d_{ck}"] = smpl_world[:1]

        def disc_apply(kps):
            return spec.discriminator.apply(
                {"params": disc_params}, kps, train=train,
                rngs={"dropout": rngs[next(rng_i)]} if train else None,
            )

        pred_logits = jax.vmap(disc_apply, in_axes=1, out_axes=1)(
            pred[..., : spec.disc_sup_dim]
        )  # (B, H, 1)
        smpl_logits = disc_apply(smpl_joints[..., : spec.disc_sup_dim])

        outputs[f"smpl_logits_{ck}"] = smpl_logits[:1]
        outputs[f"pred_logits_{ck}"] = pred_logits[:1, 0]

        if spec.use_aug:
            rot = G.random_rotation_3d(rngs[next(rng_i)], smpl_world)
            outputs[f"pose_smpl_3d_{ck}_rot"] = rot[:1]
            rot_logits = disc_apply(rot[..., : spec.disc_sup_dim])
            loss_disc = loss_disc + L.compute_disc_loss(
                pred_logits, smpl_logits
            ) * 0.6
            loss_disc = loss_disc + L.compute_disc_loss(rot_logits, None) * 0.4
        else:
            loss_disc = loss_disc + L.compute_disc_loss(
                pred_logits, smpl_logits
            )

    loss_disc = loss_disc * spec.loss_config["smpl_disc_loss"]["weight"]
    return loss_disc, outputs, det_vars
