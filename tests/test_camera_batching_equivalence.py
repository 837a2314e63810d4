"""Numerical proof of the camera-batching claim (models/composed.py
docstring): folding the camera axis into the batch gives loss values
identical to the reference's per-camera loop. Run in eval-mode BN
(running-average statistics) so normalization is per-image and the two
formulations are exactly comparable."""

import numpy as np
import jax
import jax.numpy as jnp

from test_train_step import TINY_CONFIG
from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
from x_as_supervision_tpu.models.composed import generator_forward
from x_as_supervision_tpu.ops import geometry as G
from x_as_supervision_tpu.ops import losses as L
from x_as_supervision_tpu.train.factory import build_gan_spec
from x_as_supervision_tpu.train.state import init_train_state, make_optimizers


def test_batched_losses_match_per_camera_loop():
    cfg = {**TINY_CONFIG}
    spec = build_gan_spec(cfg)
    ds = SyntheticPoseDataset(num_samples=4, cam_id_list=(0, 1), patch_size=64)
    batch = {k: jnp.asarray(v) for k, v in ds.device_batch(0, 4).items()}
    opt_det, opt_disc = make_optimizers(cfg["train_params"], 10)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
    )
    det_vars = {"params": state.det_params, "batch_stats": state.det_stats}
    phys_vars = {"params": state.phys_params, "batch_stats": state.phys_stats}

    losses, _, _, _ = generator_forward(
        spec, det_vars, phys_vars, state.disc_params, batch,
        jax.random.PRNGKey(1), train=False,
    )

    # ---- reference-shaped per-camera loop (eval-mode modules) ----
    cams = spec.cam_id_list
    loop = {"symmetry": 0.0, "smpl_pseudo_img": 0.0, "reconstruction": 0.0,
            "physique_recons": 0.0, "smpl_gen": 0.0}
    w = spec.loss_config
    for cam in cams:
        ck = f"cam_{cam}"
        decode = spec.detector.apply(det_vars, batch[f"{ck}_img"], train=False)
        kps = decode.kps  # (B, H, K, 3)
        nh = kps.shape[1]

        world = []
        for h in range(nh):
            world.append(G.convert_patch_to_world(
                kps[:, h], batch, ck, is_norm=True))
        world = jnp.stack(world, axis=1)

        # symmetry: min over hypotheses of per-hypo scalars
        sym = []
        for h in range(nh):
            v = L.compute_bone_sym_loss(world[:, h]) * w["symmetry_loss"]["weight"]["bone"]
            v += L.compute_kp_sym_loss(world[:, h]) * w["symmetry_loss"]["weight"]["kp"]
            v += L.compute_kp_sym_loss(kps[:, h, :, :2], is_3d=False) * 1e2 * \
                w["symmetry_loss"]["weight"]["kp_2d"]
            sym.append(v)
        loop["symmetry"] += jnp.stack(sym).min()

        # gen loss on detached normalized world poses
        pw = (world - world[:, :, :1, :]) / 1000.0
        logits = []
        for h in range(nh):
            logits.append(spec.discriminator.apply(
                {"params": state.disc_params}, pw[:, h, :, :3], train=False))
        logits = jnp.stack(logits, axis=1)
        loop["smpl_gen"] += L.compute_disc_loss(logits, None) * \
            w["smpl_gen_loss"]["weight"]

        # pseudo loss
        decode_p = spec.detector.apply(
            det_vars, batch[f"{ck}_pseudo_img"], train=False)
        per_h = [L.compute_supervision(decode_p.kps[:, h],
                                       batch[f"{ck}_pseudo_joints"])
                 for h in range(nh)]
        loop["smpl_pseudo_img"] += jnp.stack(per_h).min() * \
            w["smpl_pseudo_img_loss"]["weight"]

        # renders + recon losses
        hm = G.draw_lines(kps[:, 0, :, :2], 64, spec.render_parent_ids,
                          spec.render_child_ids, spec.body_width)
        mask = hm.max(axis=1)[..., None]
        loop["reconstruction"] += L.compute_mask_reconstruction_loss(
            mask, batch[f"{ck}_mask"], use_clip=True) * \
            w["recons_loss"]["weight"]
        phy = spec.physique.apply(phys_vars, mask, train=False)
        loop["physique_recons"] += L.compute_mask_reconstruction_loss(
            phy, batch[f"{ck}_mask"], weight=batch[f"{ck}_geodesic_dis"]) * \
            w["physique_recons_loss"]["weight"]

    for key in ("symmetry", "smpl_pseudo_img", "reconstruction", "smpl_gen"):
        np.testing.assert_allclose(
            float(losses[key]), float(loop[key]), rtol=2e-4, atol=1e-6,
            err_msg=key,
        )
    # physique runs on a concatenated batch; eval-mode BN makes it exact too
    np.testing.assert_allclose(
        float(losses["physique_recons"]), float(loop["physique_recons"]),
        rtol=2e-4, atol=1e-6,
    )
