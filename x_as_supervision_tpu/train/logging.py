"""TensorBoard logging with the reference's exact tag layout
(training_loss/*, training_pose_2d/*, training_mask/*, training_depth/*,
training_smpl/*, training_pseudo/*, meta/learning_rate/detector;
reference: train_util.py:229-305) so existing TB workflows transfer.
"""

from __future__ import annotations

import numpy as np

from . import vis


def create_writer(log_dir: str):
    from tensorboardX import SummaryWriter

    return SummaryWriter(log_dir=log_dir)


def tb_vis(
    tb_log,
    cur_step: int,
    tb_pair_ids,
    tb_parent_ids,
    total_loss,
    loss_kp: dict,
    loss_disc,
    output: dict,
    x: dict,
    config: dict,
    detector_lr: float,
    image_every: int = 50,
    simple_version: bool = False,
):
    if tb_log is None:
        return

    if not simple_version:
        if total_loss is not None:
            tb_log.add_scalar("training_loss/total_loss", float(total_loss),
                              cur_step)
        for key, value in loss_kp.items():
            tb_log.add_scalar(
                f"training_loss/{key}", float(np.asarray(value).mean()),
                cur_step,
            )
        tb_log.add_scalar(
            "meta/learning_rate/detector", float(detector_lr), cur_step
        )
        for key in output:
            # learned-line-width scalars (reference train_util.py:240-243;
            # the shipped models never emit them — hook kept for parity)
            if key.startswith("line_width"):
                for i, val in enumerate(np.asarray(output[key]).ravel()):
                    tb_log.add_scalar(
                        f"training_line_width/{key}_{i}", float(val), cur_step
                    )
        if loss_disc is not None:
            tb_log.add_scalar(
                "training_loss/smpl_disc", float(loss_disc), cur_step
            )

    if cur_step % image_every != 0:
        return

    dp = config.get("dataset_params", {})
    mean = dp.get("dataiter", {}).get("mean")
    std = dp.get("dataiter", {}).get("std")

    def _ms(arr):
        # uint8-fed batches are raw 0..255 (normalization happens on
        # device) — skip the un-normalize for display
        if np.asarray(arr).dtype == np.uint8:
            return None, None
        return mean, std

    for key in x.keys():
        if "pseudo" in key:
            continue
        val = x[key]
        if key.endswith("img"):
            m, s = _ms(val)
            tb_log.add_image(
                f"training_img/{key}", vis.img_vis(val[0], m, s), cur_step
            )
        elif key.endswith("mask"):
            tb_log.add_image(
                f"training_mask/{key}", vis.img_vis(val[0]), cur_step
            )
        elif key.endswith("joints"):
            cam_key = key.split("_joints")[0]
            img = x.get(f"{cam_key}_img")
            if img is None:
                continue
            m, s = _ms(img)
            tb_log.add_image(
                f"training_pose_2d/{cam_key}_gt_pose",
                vis.pose_vis(
                    np.asarray(val[0])[:, :2], img.shape[1:3], tb_pair_ids,
                    tb_parent_ids, img=np.asarray(img[0]), mean=m, std=s,
                    is_gt=True,
                ),
                cur_step,
            )
        elif key.endswith("geodesic_dis"):
            cam_key = key.split("_geodesic_dis")[0]
            center = x.get(f"{cam_key}_geodesic_center")
            if center is None:
                center = np.zeros((1, 2))
            else:
                center = np.asarray(center[0])
            tb_log.add_image(
                f"training_weight/{key}",
                vis.dis_vis(np.asarray(val[0]), center),
                cur_step,
            )

    for key in output.keys():
        val = np.asarray(output[key])
        if key.startswith("mask"):
            tb_log.add_image(
                f"training_mask/{key}", vis.img_vis(val[0]), cur_step
            )
        elif key.startswith("pose_2d"):
            mode = key.split("pose_2d_pred_")[1].rsplit("_", 1)[0]
            page = "training_pose_2d" if "pseudo" not in key else "training_pseudo"
            img = x.get(f"{mode}_img")
            if img is None:
                continue
            m, s = _ms(img)
            tb_log.add_image(
                f"{page}/{key}",
                vis.pose_vis(
                    val[0][:, :2], img.shape[1:3], tb_pair_ids, tb_parent_ids,
                    img=np.asarray(img[0]), mean=m, std=s,
                ),
                cur_step,
            )
        elif key.startswith("pose_3d"):
            page = "training_pose_3d" if "pseudo" not in key else "training_pseudo"
            tb_log.add_image(
                f"{page}/{key}",
                vis.pose_vis_3d(val[0], tb_pair_ids, tb_parent_ids),
                cur_step,
            )
        elif key.startswith("pose_smpl_2d") and not simple_version:
            img = x.get("cam_0_img")
            size = img.shape[1:3] if img is not None else (256, 256)
            tb_log.add_image(
                f"training_smpl/{key}",
                vis.pose_vis(val[0][:, :2], size, tb_pair_ids, tb_parent_ids),
                cur_step,
            )
        elif key.startswith("pose_smpl_3d") and not simple_version:
            tb_log.add_image(
                f"training_smpl/{key}",
                vis.pose_vis_3d(val[0], tb_pair_ids, tb_parent_ids),
                cur_step,
            )
        elif key.startswith("depth_map") and not simple_version:
            mode = key.split("depth_map_")[1]
            joints = x.get(f"{mode}_joints")
            if joints is None:
                continue
            tb_log.add_image(
                f"training_depth/{key}",
                vis.depth_heatmap_vis(val, np.asarray(joints[0])),
                cur_step,
            )
        elif "logits" in key and not simple_version:
            tb_log.add_scalar(
                f"training_disc/{key}", float(val[0].squeeze()), cur_step
            )

    if "kp_gt_world" in output:
        tb_log.add_image(
            "training_pose_3d/src_gt_pose_3d",
            vis.pose_vis_3d(
                np.asarray(output["kp_gt_world"])[0], tb_pair_ids,
                tb_parent_ids,
            ),
            cur_step,
        )
