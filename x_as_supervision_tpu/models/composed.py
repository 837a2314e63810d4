"""Composed generator / discriminator loss computation.

Pure-functional equivalents of the reference's Counter3DModel /
Counter3DDisc wrappers (reference: modules/model.py:24-264): given module
definitions, parameter/stat pytrees, and a batch dict, return the gated loss
menu and visualization outputs. Everything traces into a single jitted
train step; the config-driven gating is static Python.

TPU-first restructuring (vs the reference's per-camera Python loops):
the camera axis is folded into the batch axis, so each phase runs ONE
detector forward over (num_cams * B) images instead of num_cams sequential
forwards (reference modules/model.py:62-69 loops cameras). With equal-sized
camera groups every loss value is algebraically identical (sum over cameras
of per-camera means == num_cams * global mean); the only deviation is
BatchNorm batch statistics, which normalize over all cameras jointly rather
than per camera — documented here as the intended SyncBN generalization
(the reference's own statistics already depend on world size). The pseudo
stream keeps its own forward so its render statistics do not mix with real
images.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import geometry as G
from ..ops import losses as L
from ..ops.integral import IntegralDecode


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
    # rematerialization mode: 'none' | 'full' (checkpoint whole detector
    # forwards + renderer) | 'decode' (in-module decode checkpoint) |
    # 'head_decode' (checkpoint final 1x1 conv + decode so the K*D-channel
    # logits volume — the dominant activation — is recomputed in the
    # backward pass; residual is the small feature map).
    remat_mode: str = "full"
    fuse_gan_step: bool = True
    # Accepted for config compatibility; the reference reads this flag but
    # never acts on it (reference modules/model.py:40, SURVEY §5.6).
    use_learned_width: bool = False
    # Device-side feed normalization (dataset_params.uint8_feed): the host
    # ships uint8 images/masks (4x less host->device bandwidth) and
    # preprocess_batch applies (img - mean)/std, mask/255 and rm_bg inside
    # the jitted step. None = the host already normalized (default path).
    feed_mean: tuple | None = None
    feed_std: tuple | None = None
    feed_rm_bg: bool = False

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
            remat_mode=_remat_mode(model_params.get("remat", True)),
            fuse_gan_step=model_params.get("fuse_gan_step", True),
            use_learned_width=model_params.get("use_learned_width", False),
        )


def _remat_mode(cfg) -> str:
    """Config value (bool or string) -> canonical remat mode."""
    if cfg is True:
        return "full"
    if cfg is False or cfg is None:
        return "none"
    if cfg in ("none", "full", "decode", "head_decode", "pseudo"):
        return cfg
    raise ValueError(f"unknown remat mode {cfg!r}")


def preprocess_batch(batch: dict, spec: GanSpec) -> dict:
    """Device-side feed normalization for uint8-shipped tensors (traced
    inside the jitted step; see GanSpec.feed_* and data/pipeline.py
    uint8_feed). float32 entries pass through untouched, so mixed/legacy
    feeds keep working. Order matches the host pipeline exactly:
    (img - mean)/std, mask/255, then rm_bg's img *= mask
    (reference: dataloader.py:70-75,184-187)."""
    mean = (
        jnp.asarray(spec.feed_mean, jnp.float32)
        if spec.feed_mean is not None else None
    )
    std = (
        jnp.asarray(spec.feed_std, jnp.float32)
        if spec.feed_std is not None else None
    )
    out = dict(batch)
    was_u8 = set()
    for k, v in batch.items():
        if not hasattr(v, "dtype") or v.dtype != jnp.uint8:
            continue
        if k.endswith("_img") or k.endswith("_pseudo_img"):
            x = v.astype(jnp.float32)
            if mean is not None and std is not None:
                x = (x - mean) / std
            out[k] = x
            if k.endswith("_img") and not k.endswith("_pseudo_img"):
                was_u8.add(k)
        elif k.endswith("_mask"):
            out[k] = v.astype(jnp.float32) / 255.0
    if spec.feed_rm_bg:
        for k in was_u8:
            mk = k[: -len("_img")] + "_mask"
            if mk in out:
                out[k] = out[k] * out[mk]
    return out


def _active_cams(spec: GanSpec, batch: dict):
    """Mono datasets carry a single 'cam_mono_*' view.
    Reference: modules/model.py:51-55."""
    if "cam_mono_img" in batch:
        return ("mono",)
    return spec.cam_id_list


def _stack_cam_images(batch: dict, cams, suffix: str) -> jax.Array:
    """(C*B, H, W, 3) stack of per-camera images, camera-major."""
    imgs = [batch[f"cam_{c}_{suffix}"] for c in cams]
    return jnp.concatenate(imgs, axis=0)


def _detector_apply(spec, det_vars, img, train, force_remat=False):
    """One (camera-batched) detector forward + updated batch stats.

    Rematerialization policy (spec.remat_mode):
      * 'full': jax.checkpoint around the whole forward — the step runs the
        detector up to 3x per iteration on (C*B)-sized batches; recompute
        each forward rather than store all their activations.
      * 'pseudo': checkpoint only the forwards a caller marks with
        force_remat (the pseudo-image stream): its activations are dead
        weight between the forward and the very end of the backward, so
        recomputing that one forward (~fwd cost) relieves HBM pressure
        without touching the camera stream.
      * 'head_decode': checkpoint ONLY the final 1x1 conv + integral decode.
        The K*D-channel logits ARE the (K, D, H, W) softmax volume (~tens
        of MB per image in fp32) and dominate saved activations; the plain
        'decode' checkpoint cannot help because the logits stay alive as
        the checkpoint's residual input. Starting the region before the
        projection keeps only the num_filters-channel feature map.
      * 'decode': in-module decode checkpoint (models/detector.py).
      * 'none': store everything (fastest when HBM fits).
    """
    if not train:
        return spec.detector.apply(det_vars, img, train=False), det_vars

    stats_in = det_vars.get("batch_stats", {})

    if spec.remat_mode == "head_decode":
        feats, mutated = spec.detector.apply(
            {"params": det_vars["params"], "batch_stats": stats_in},
            img, train=True, mutable=["batch_stats"], stage="features",
        )

        @jax.checkpoint
        def tail(params, feats):
            # final conv + decode: parameter-only (no BN), so no mutable
            out = spec.detector.apply(
                {"params": params}, feats, train=True, stage="tail"
            )
            return out.kps, out.depth_prob_map

        kps, depth_map = tail(det_vars["params"], feats)
        return IntegralDecode(kps, depth_map), {
            "params": det_vars["params"],
            "batch_stats": mutated["batch_stats"],
        }

    def fwd(params, stats, img):
        out, mutated = spec.detector.apply(
            {"params": params, "batch_stats": stats},
            img, train=True, mutable=["batch_stats"],
        )
        return out.kps, out.depth_prob_map, mutated["batch_stats"]

    if spec.remat_mode == "full" or force_remat:
        fwd = jax.checkpoint(fwd)
    kps, depth_map, new_stats = fwd(
        det_vars["params"], stats_in, img
    )
    return IntegralDecode(kps, depth_map), {
        "params": det_vars["params"],
        "batch_stats": new_stats,
    }


def _disc_apply(spec, disc_params, kps_flat, rng, train):
    """One (fully batched) discriminator forward on (N, K, dim) poses."""
    rngs = {"dropout": rng} if train else None
    return spec.discriminator.apply(
        {"params": disc_params}, kps_flat[..., : spec.disc_sup_dim],
        train=train, rngs=rngs,
    )


def generator_forward(
    spec: GanSpec,
    det_vars: dict,
    phys_vars: dict | None,
    disc_params: dict | None,
    batch: dict,
    rng: jax.Array,
    train: bool = True,
    return_cam_decode: bool = False,
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
        train/state.py for that bookkeeping);
      * smpl_pseudo_img: detector on pseudo renders, min-over-hypo MSE;
      * physique_recons / recons: mask reconstruction on the line render.
    """
    cams = _active_cams(spec, batch)
    nc = len(cams)
    loss_cfg = spec.loss_config
    losses: dict[str, jax.Array] = {}
    outputs: dict[str, jax.Array] = {}
    k_gen, k_rot, k_pseudo = jax.random.split(rng, 3)

    # --- one detector forward over all cameras ---
    imgs = _stack_cam_images(batch, cams, "img")
    b = imgs.shape[0] // nc
    decode, det_vars = _detector_apply(spec, det_vars, imgs, train)
    kps_all = decode.kps.reshape(nc, b, *decode.kps.shape[1:])  # (C,B,H,K,3)
    nh = kps_all.shape[2]

    kps_ori = {f"cam_{c}": kps_all[i] for i, c in enumerate(cams)}
    kps_world = {}
    for i, cam in enumerate(cams):
        ck = f"cam_{cam}"
        outputs[f"pose_2d_pred_{ck}_ori"] = kps_all[i, :1, 0]
        if i == 0:
            outputs[f"depth_map_{ck}"] = decode.depth_prob_map

        # fold hypotheses into the batch axis for the world lift: (B, H)
        # reshapes sample-major, so each camera row repeats nh times.
        rep = lambda x: jnp.repeat(x, nh, axis=0)
        cam_params = {
            f"{ck}_trans_image": rep(batch[f"{ck}_trans_image"]),
            f"{ck}_img": batch[f"{ck}_img"],
            f"{ck}_pelvis": rep(batch[f"{ck}_pelvis"]),
            f"{ck}_k_mat": rep(batch[f"{ck}_k_mat"]),
            f"{ck}_trans_world": rep(batch[f"{ck}_trans_world"]),
            f"{ck}_rot_world": rep(batch[f"{ck}_rot_world"]),
        }
        kps_bh = kps_all[i].reshape(b * nh, *kps_all.shape[3:])
        if cam == "mono":
            world = G.convert_patch_to_world(
                kps_bh, cam_params, ck, is_norm=True, rect_width=256.0,
                mono=True, patch=False,
            )
        else:
            world = G.convert_patch_to_world(
                kps_bh, cam_params, ck, is_norm=True
            )
        kps_world[ck] = world.reshape(b, nh, *world.shape[1:])
        outputs[f"pose_3d_depth_{ck}"] = kps_world[ck][:, 0]

    if "mono" not in cams:
        outputs["kp_gt_world"] = G.convert_patch_to_world(
            batch["cam_0_joints"], batch, "cam_0", is_norm=False
        )[:1]

    # --- one line render over all cameras (hypothesis 0 xy only;
    #     reference modules/model.py:88-96) ---
    img_side = batch[f"cam_{cams[0]}_img"].shape[-2]
    kps2d_all = kps_all[:, :, 0, :, :2].reshape(nc * b, -1, 2)

    def render(kps2d):
        hm = G.draw_lines(
            kps2d, img_side, spec.render_parent_ids, spec.render_child_ids,
            spec.body_width,
        )
        return hm.max(axis=1)[..., None]  # (CB, S, S, 1)

    if spec.remat_mode == "full":
        render = jax.checkpoint(render)
    masks_all = render(kps2d_all)
    reconstructed = {
        f"cam_{c}": masks_all[i * b : (i + 1) * b]
        for i, c in enumerate(cams)
    }
    for cam in cams:
        outputs[f"mask_heatmap_line_cam_{cam}"] = reconstructed[f"cam_{cam}"][:1]

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
        # normalized root-centered world poses, all cams x hypos in one
        # disc forward; loss = sum over cams of per-cam LSGAN gen loss
        # == nc * global mean of the min-over-hypo terms.
        pw = jnp.stack([kps_world[f"cam_{c}"] for c in cams])  # (C,B,H,K,3)
        pw = (pw - pw[:, :, :, :1, :]) / 1000.0
        flat = pw.reshape(nc * b * nh, *pw.shape[3:])
        detached = jax.lax.stop_gradient(flat)
        logits = _disc_apply(spec, disc_params, detached, k_gen, train)
        logits = logits.reshape(nc * b, nh, 1)
        if not spec.use_aug:
            loss_gen = L.compute_disc_loss(logits, None) * nc
        else:
            loss_gen = L.compute_disc_loss(logits, None) * nc * 0.7
            rot = G.random_rotation_3d(
                k_rot, pw.reshape(nc * b * nh, *pw.shape[3:])
            )
            logits_rot = _disc_apply(spec, disc_params, rot, k_rot, train)
            logits_rot = logits_rot.reshape(nc * b, nh, 1)
            loss_gen = loss_gen + L.compute_disc_loss(logits_rot, None) * nc * 0.3
        losses["smpl_gen"] = loss_gen * loss_cfg["smpl_gen_loss"]["weight"]

    if "smpl_pseudo_img_loss" in loss_cfg:
        pseudo_imgs = _stack_cam_images(batch, cams, "pseudo_img")
        decode_p, det_vars = _detector_apply(
            spec, det_vars, pseudo_imgs, train,
            force_remat=(spec.remat_mode == "pseudo"),
        )
        pred_all = decode_p.kps.reshape(nc, b, nh, *decode_p.kps.shape[2:])

        loss_pseudo = 0.0
        for i, cam in enumerate(cams):
            ck = f"cam_{cam}"
            pseudo_gt = batch[f"{ck}_pseudo_joints"]
            pred = pred_all[i]  # (B, H, K, 3)

            outputs[f"pose_2d_pred_{ck}_pseudo"] = pred[:1, 0]
            mono_lift = lambda k, ck=ck: G.convert_patch_to_world(
                k, batch, ck, is_norm=True, rect_width=256.0, mono=True,
                patch=False,
            )
            outputs[f"pose_3d_pred_{ck}_pseudo"] = mono_lift(pred[:, 0])[:1]
            outputs[f"pose_3d_gt_{ck}_pseudo"] = mono_lift(pseudo_gt)[:1]

            per_hypo = jax.vmap(
                lambda p, g=pseudo_gt: L.compute_supervision(p, g), in_axes=1
            )(pred)
            loss_pseudo = loss_pseudo + per_hypo.min()
            # Opt-in hypothesis-0 pull (extension; confident-mode
            # experiment, PERF.md round 5): the min-over-hypotheses
            # reduction never anchors WHICH hypothesis is reliable, so the
            # oracle-free 'confident' eval (reference eval.py:146-148,
            # hypothesis 0) lags 'best' badly. A small extra pseudo term on
            # hypothesis 0 pushes it toward the supervised solution without
            # collapsing the hypothesis diversity the min preserves.
            h0w = loss_cfg["smpl_pseudo_img_loss"].get("hypo0_weight", 0.0)
            if h0w:
                loss_pseudo = loss_pseudo + h0w * per_hypo[0]
        losses["smpl_pseudo_img"] = (
            loss_pseudo * loss_cfg["smpl_pseudo_img_loss"]["weight"]
        )

    if "physique_recons_loss" in loss_cfg and spec.physique is not None:
        # weight == 0 makes the dis-map weighting unobservable (the loss is
        # multiplied by 0 either way), so the geodesic maps need not exist
        # in the batch — lets the pipeline skip the FMM solve + transfer
        # for configs like S1 that carry the key at weight 0.
        use_dis = (
            loss_cfg["physique_recons_loss"]["use_dis_map"]
            and loss_cfg["physique_recons_loss"].get("weight", 0) != 0
        )
        # one physique forward over all cameras
        if train:
            phy_all, mutated = spec.physique.apply(
                phys_vars, masks_all, train=True, mutable=["batch_stats"],
            )
            phys_vars = {**phys_vars, "batch_stats": mutated["batch_stats"]}
        else:
            phy_all = spec.physique.apply(phys_vars, masks_all, train=False)

        gt_masks = _stack_cam_images(batch, cams, "mask")
        weight = (
            _stack_cam_images(batch, cams, "geodesic_dis") if use_dis else None
        )
        for i, cam in enumerate(cams):
            outputs[f"mask_physique_cam_{cam}"] = phy_all[i * b : i * b + 1]
        loss_phy = L.compute_mask_reconstruction_loss(
            phy_all, gt_masks, weight=weight
        ) * nc
        losses["physique_recons"] = (
            loss_phy * loss_cfg["physique_recons_loss"]["weight"]
        )

    if "recons_loss" in loss_cfg:
        use_dis = (
            loss_cfg["recons_loss"]["use_dis_map"]
            and loss_cfg["recons_loss"].get("weight", 0) != 0
        )  # weight-0 gating: see physique_recons above
        gt_masks = _stack_cam_images(batch, cams, "mask")
        weight = (
            _stack_cam_images(batch, cams, "geodesic_dis") if use_dis else None
        )
        # Per-camera scalars, then sum: with use_clip the reference's loss is
        # a PRODUCT of two per-camera means (MSE x active-pixel fraction), so
        # sum_c(a_c * f_c) != nc * mean(a) * mean(f) — the camera axis cannot
        # be folded for this loss (reference modules/model.py:181-190).
        per_cam = lambda t: t.reshape(nc, b, *t.shape[1:])
        if weight is None:
            loss_rec = jax.vmap(
                lambda m, g: L.compute_mask_reconstruction_loss(
                    m, g, use_clip=True
                )
            )(per_cam(masks_all), per_cam(gt_masks)).sum()
        else:
            loss_rec = jax.vmap(
                lambda m, g, w: L.compute_mask_reconstruction_loss(
                    m, g, weight=w, use_clip=True
                )
            )(per_cam(masks_all), per_cam(gt_masks), per_cam(weight)).sum()
        losses["reconstruction"] = loss_rec * loss_cfg["recons_loss"]["weight"]

    if return_cam_decode:
        return losses, outputs, det_vars, phys_vars, decode
    return losses, outputs, det_vars, phys_vars


def discriminator_forward(
    spec: GanSpec,
    disc_params: dict,
    det_vars: dict,
    batch: dict,
    rng: jax.Array,
    train: bool = True,
    precomputed_decode=None,
):
    """Discriminator-side LSGAN loss: real = pseudo SMPL joints from the
    data stream, fake = detector predictions (stop-gradient).

    Returns (loss, outputs, new_det_vars).
    Reference: modules/model.py:218-264; camera axis batched as in
    generator_forward (loss values identical, see module docstring).
    """
    cams = _active_cams(spec, batch)
    nc = len(cams)
    outputs: dict[str, jax.Array] = {}
    k_fake, k_real, k_rot, k_rlogit = jax.random.split(rng, 4)

    b = batch[f"cam_{cams[0]}_img"].shape[0]
    if precomputed_decode is None:
        imgs = _stack_cam_images(batch, cams, "img")
        decode, det_vars = _detector_apply(spec, det_vars, imgs, train)
    else:
        # Fused GAN step: reuse the generator phase's detector forward. In
        # train mode BatchNorm normalizes by the batch's own statistics, so
        # the discriminator-phase forward of the same batch under the same
        # parameters is numerically identical (the reference's duplicate
        # forward only double-updates the eval-time running averages;
        # reference train.py:161-190).
        decode = precomputed_decode
    pred = jax.lax.stop_gradient(decode.kps)  # (CB, H, K, 3)
    nh = pred.shape[1]

    smpl_joints = jnp.concatenate(
        [batch[f"cam_{c}_pseudo_joints"] for c in cams], axis=0
    )  # (CB, K, 3)

    pred_logits = _disc_apply(
        spec, disc_params, pred.reshape(nc * b * nh, *pred.shape[2:]),
        k_fake, train,
    ).reshape(nc * b, nh, 1)
    smpl_logits = _disc_apply(spec, disc_params, smpl_joints, k_real, train)

    for i, cam in enumerate(cams):
        ck = f"cam_{cam}"
        outputs[f"pose_smpl_2d_{ck}"] = smpl_joints[i * b : i * b + 1]
        outputs[f"smpl_logits_{ck}"] = smpl_logits[i * b : i * b + 1]
        outputs[f"pred_logits_{ck}"] = pred_logits[i * b : i * b + 1, 0]

    # world lift of the pseudo joints (vis + rotation augmentation source)
    world_blocks = []
    for i, cam in enumerate(cams):
        ck = f"cam_{cam}"
        w = G.convert_patch_to_world(
            batch[f"{ck}_pseudo_joints"], batch, ck, is_norm=True,
            rect_width=256.0, mono=True, patch=False,
        )
        world_blocks.append(w)
        outputs[f"pose_smpl_3d_{ck}"] = w[:1]
    smpl_world = jnp.concatenate(world_blocks, axis=0)

    if spec.use_aug:
        rot = G.random_rotation_3d(k_rot, smpl_world)
        for i, cam in enumerate(cams):
            outputs[f"pose_smpl_3d_cam_{cam}_rot"] = rot[i * b : i * b + 1]
        rot_logits = _disc_apply(spec, disc_params, rot, k_rlogit, train)
        loss = (
            L.compute_disc_loss(pred_logits, smpl_logits) * nc * 0.6
            + L.compute_disc_loss(rot_logits, None) * nc * 0.4
        )
    else:
        loss = L.compute_disc_loss(pred_logits, smpl_logits) * nc

    loss = loss * spec.loss_config["smpl_disc_loss"]["weight"]
    return loss, outputs, det_vars
