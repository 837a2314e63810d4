"""Evaluation harness: multi-hypothesis selection, 2D/3D/triangulated
metrics, per-action H36M tables, ambiguity ratio, eval_result.txt writer.

Mirrors the reference Eval flow (reference: eval.py:65-298) with the device
side (detector forward, switch_points, hypothesis selection, world lifts,
DLT triangulation) fused into one jitted function per batch and the metric
accumulation on host in vectorized numpy.

Deviations preserved-or-documented (SURVEY.md §7.5):
  * metric tables are per-process, never all-reduced (reference
    eval.py:404-409) — we keep that on multi-host unless `reduce_hosts`;
  * the MPI 'Tri3D' file block divides by count_3d_table (not the tri
    count table), faithfully reproduced (reference eval.py:291).
"""

from __future__ import annotations

import copy
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as G
from . import eval_utils as EU
from . import metrics as MET
from . import vis


def _new_tables(cal_per_act: bool):
    if cal_per_act:
        act = EU.new_act_table()
        mk = lambda: {
            "mpjpe": copy.deepcopy(act),
            "n-mpjpe": copy.deepcopy(act),
            "p-mpjpe": copy.deepcopy(act),
        }
        return (
            copy.deepcopy(act), copy.deepcopy(act), mk(), mk(), mk(), mk()
        )
    zeros = lambda: {
        "mpjpe": 0.0, "n-mpjpe": 0.0, "p-mpjpe": 0.0, "pck": 0.0, "auc": 0.0
    }
    return 0.0, 0.0, zeros(), zeros(), zeros(), zeros()


class Evaluator:
    def __init__(
        self,
        config: dict,
        detector,
        det_vars: dict,
        dataset,
        log_dir: str,
        img_size: float = 256.0,
        batch_size: int | None = None,
        shard_across_processes: bool = True,
    ):
        self.config = config
        self.detector = detector
        self.det_vars = det_vars
        self.dataset = dataset
        self.log_dir = log_dir
        self.img_size = img_size
        self.cam_id_list = config["model_params"]["cam_id_list"]
        self.cal_per_act = (
            config["dataset_params"]["dataset"]["name"] != "mpi_inf_3dhp"
            if "dataset" in config.get("dataset_params", {})
            else True
        )
        # dataset_params.eval_protocol: 'mpi' forces the MPI-style report
        # (PCK@0.15m + AUC, no per-action tables) on any dataset — e.g. a
        # campaign_valid variant; 'hm36' forces per-action tables.
        proto = config.get("dataset_params", {}).get("eval_protocol")
        if proto is not None:
            self.cal_per_act = proto != "mpi"
        # device-side normalization for uint8-shipped eval batches
        # (dataset_params.uint8_feed; see models/composed.preprocess_batch)
        import types

        di = config.get("dataset_params", {}).get("dataiter", {})
        self._feed_spec = types.SimpleNamespace(
            feed_mean=tuple(di["mean"]) if di.get("mean") is not None
            else None,
            feed_std=tuple(di["std"]) if di.get("std") is not None else None,
            feed_rm_bg=bool(
                config.get("dataset_params", {}).get("rm_bg", False)
            ),
        )
        self.batch_size = batch_size or config["train_params"]["batch_size"]
        self.num_batches = max(1, len(dataset) // self.batch_size)
        # Shard eval batches across processes like the reference's
        # DistributedSampler (reference eval.py:317-326): process p walks
        # batches p, p+P, ... Every process previously walked the full
        # dataset (world-size x redundant work on a pod).
        if shard_across_processes:
            self.my_batches = list(
                range(jax.process_index(), self.num_batches,
                      jax.process_count())
            )
        else:
            self.my_batches = list(range(self.num_batches))

        self._device_step = jax.jit(
            partial(self._step), static_argnames=("mode",)
        )

    # ---------------- device side ----------------

    def _step(self, det_vars, batch, mode: str):
        """Per-batch device computation. Returns per-camera selected preds,
        2D errors inputs, world lifts, triangulation, swap masks."""
        from ..models.composed import preprocess_batch

        batch = preprocess_batch(batch, self._feed_spec)
        kp_pred = {}
        kp_pred_2d = {}
        trans_masks = {}
        for cam_id in self.cam_id_list:
            ck = f"cam_{cam_id}"
            decode = self.detector.apply(
                det_vars, batch[f"{ck}_img"], train=False
            )
            pred = decode.kps  # (B, H, K, 3)

            kp_gt = batch[f"{ck}_joints"]
            kp_gt = kp_gt.at[..., :2].set(
                kp_gt[..., :2] / (self.img_size - 1) * 2 - 1
            )
            kp_gt = kp_gt.at[..., 2].set(kp_gt[..., 2] / (self.img_size - 1))

            pred2d = pred[..., :2]
            # L/R disambiguation per hypothesis (reference eval.py:130-136).
            sw2d, _ = jax.vmap(
                lambda p: EU.switch_points(p, kp_gt[..., :2]), in_axes=1,
                out_axes=1,
            )(pred2d)
            sw3d, tmask = jax.vmap(
                lambda p: EU.switch_points(p, kp_gt, switch_all=False),
                in_axes=1, out_axes=1,
            )(pred)
            # Faithful reference quirk: the per-hypothesis loop overwrites
            # trans_dict each iteration, so the LAST hypothesis's swap mask
            # feeds the ambiguity ratio (reference eval.py:135-136).
            trans_masks[ck] = tmask[:, -1]  # (B, K, 1)

            if mode == "best" and pred.shape[1] > 1:
                err3 = ((sw3d - kp_gt[:, None]) ** 2).sum(-1)  # (B, H, K)
                best = jnp.argmin(err3, axis=1)  # (B, K)
                sel3 = jnp.take_along_axis(
                    sw3d, best[:, None, :, None], axis=1
                )[:, 0]
                err2 = ((sw2d - kp_gt[:, None, :, :2]) ** 2).sum(-1)
                best2 = jnp.argmin(err2, axis=1)
                sel2 = jnp.take_along_axis(
                    sw2d, best2[:, None, :, None], axis=1
                )[:, 0]
            else:
                sel3 = sw3d[:, 0]
                sel2 = sw2d[:, 0]
            kp_pred[ck] = sel3
            kp_pred_2d[ck] = sel2

        kps_world_gt = G.convert_patch_to_world(
            batch["cam_0_joints"], batch, "cam_0", is_norm=False
        )
        tri = G.triangulation(kp_pred, batch, self.cam_id_list)
        per_cam_world = {
            f"cam_{c}": G.convert_patch_to_world(
                kp_pred[f"cam_{c}"], batch, f"cam_{c}", is_norm=True
            )
            for c in self.cam_id_list
        }
        gts_2d = {
            f"cam_{c}": self._norm_gt(batch[f"cam_{c}_joints"])
            for c in self.cam_id_list
        }
        return dict(
            kp_pred_2d=kp_pred_2d,
            gts_2d=gts_2d,
            trans_masks=trans_masks,
            kps_world_gt=kps_world_gt,
            tri=tri,
            per_cam_world=per_cam_world,
        )

    def _norm_gt(self, kp_gt):
        kp_gt = kp_gt.at[..., :2].set(
            kp_gt[..., :2] / (self.img_size - 1) * 2 - 1
        )
        return kp_gt.at[..., 2].set(kp_gt[..., 2] / (self.img_size - 1))

    # ---------------- host side ----------------

    def _update_3d(self, preds_list, gt, tables, counts, act_tags):
        vis = np.ones(gt.shape[:2], dtype=bool)
        for pred in preds_list:
            for metric, alignment in zip(
                ["mpjpe", "n-mpjpe", "p-mpjpe"], ["none", "scale", "procrustes"]
            ):
                err = MET.keypoint_mpjpe(pred, gt, vis, alignment).mean(axis=1)
                if self.cal_per_act:
                    EU.update_dict(tables[metric], counts[metric], err, act_tags)
                else:
                    tables[metric] += err.mean()
                    counts[metric] += 1
            if not self.cal_per_act:
                tables["pck"] += MET.keypoint_3d_pck(
                    pred / 1000.0, gt / 1000.0, vis
                ).mean()
                tables["auc"] += MET.keypoint_3d_auc(
                    pred / 1000.0, gt / 1000.0, vis
                )
                counts["pck"] += 1
                counts["auc"] += 1

    def eval(self, mode: str = "best", tb_log=None,
             tb_pair_ids=None, tb_parent_ids=None):
        (rec2d, cnt2d, rec3d, cnt3d, rec3dt, cnt3dt) = _new_tables(
            self.cal_per_act
        )
        ambiguity = 0.0
        if tb_pair_ids is None:
            tb_pair_ids = np.array(
                self.config["model_params"].get("flip_pairs", [])
            )
        if tb_parent_ids is None:
            tb_parent_ids = np.array(
                self.config["model_params"].get("parent_ids", [])
            )

        for b in self.my_batches:
            batch = self.dataset.batch(b * self.batch_size, self.batch_size)
            act_tags = batch.pop("act", ["act_02"] * self.batch_size)
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if not isinstance(v, list)}
            out = self._device_step(self.det_vars, dev, mode=mode)
            out = jax.device_get(out)

            if tb_log is not None:
                self._log_batch_images(
                    tb_log, b, batch, out, tb_pair_ids, tb_parent_ids
                )

            # 2D error per camera (reference eval.py:161-166).
            for cam_id in self.cam_id_list:
                ck = f"cam_{cam_id}"
                err2d = EU.per_act_mse(
                    out["kp_pred_2d"][ck], out["gts_2d"][ck][..., :2]
                )
                if self.cal_per_act:
                    EU.update_dict(rec2d, cnt2d, err2d, act_tags)
                else:
                    rec2d += err2d.mean()
                    cnt2d += 1

            # ambiguity ratio (reference eval.py:168-173).
            trans_val = sum(
                np.asarray(out["trans_masks"][f"cam_{c}"], dtype=np.float64)
                for c in self.cam_id_list
            )
            ambiguity += np.minimum(
                trans_val, len(self.cam_id_list) - trans_val
            ).mean()

            gt_world = np.asarray(out["kps_world_gt"])
            self._update_3d([np.asarray(out["tri"])], gt_world, rec3dt,
                            cnt3dt, act_tags)
            per_cam = [
                np.asarray(out["per_cam_world"][f"cam_{c}"])
                for c in self.cam_id_list
            ]
            self._update_3d(per_cam, gt_world, rec3d, cnt3d, act_tags)

        self._tables = (rec2d, cnt2d, rec3d, cnt3d, rec3dt, cnt3dt, ambiguity)
        return self._tables

    def _log_batch_images(self, tb_log, step, batch, out, pair_ids,
                          parent_ids):
        """Per-batch pred/GT pose panels + 3D plots, first sample only
        (reference: eval.py:152-158,178-199)."""
        mean = self.config["dataset_params"].get("dataiter", {}).get("mean")
        std = self.config["dataset_params"].get("dataiter", {}).get("std")
        if np.asarray(batch[f"cam_{self.cam_id_list[0]}_img"]).dtype == \
                np.uint8:
            mean, std = None, None  # uint8 feed is already display-ready
        gt_world = np.asarray(out["kps_world_gt"])
        tb_log.add_image(
            "testing_pose_3D/gt",
            vis.pose_vis_3d(gt_world[0], pair_ids, parent_ids), step,
        )
        tb_log.add_image(
            "testing_pose_3D/pred_tri",
            vis.pose_vis_3d(np.asarray(out["tri"])[0], pair_ids, parent_ids,
                            ref_keypoints=gt_world[0]), step,
        )
        for cam_id in self.cam_id_list:
            ck = f"cam_{cam_id}"
            img = np.asarray(batch[f"{ck}_img"][0])
            pred2d = np.asarray(out["kp_pred_2d"][ck])[0]
            gt2d = np.asarray(out["gts_2d"][ck])[0][:, :2]
            size = img.shape[:2]
            tb_log.add_image(
                f"testing_pred_pose/{ck}_pred_pose_v2",
                vis.pose_vis(pred2d, size, pair_ids, parent_ids, img=img,
                             mean=mean, std=std), step,
            )
            tb_log.add_image(
                f"testing_gt_pose/{ck}_gt_pose_v2",
                vis.pose_vis(gt2d, size, pair_ids, parent_ids, img=img,
                             mean=mean, std=std), step,
            )
            tb_log.add_image(
                f"testing_pose_3D/pred_{ck}",
                vis.pose_vis_3d(
                    np.asarray(out["per_cam_world"][ck])[0], pair_ids,
                    parent_ids, ref_keypoints=gt_world[0],
                ), step,
            )

    # ---------------- reporting ----------------

    def record(self, rec2d, cnt2d, rec3d, cnt3d, rec3dt, cnt3dt, ambiguity,
               reduce_hosts: bool = False):
        """Print + write eval/eval_result.txt in the reference's exact
        format (reference: eval.py:206-298). reduce_hosts=True averages the
        tables across processes (the reference reports rank-0's shard only,
        SURVEY §7.5; this is the documented opt-in deviation)."""
        # The ratio denominator must be reduced TOGETHER with the ambiguity
        # sum: mean(sum_p)/mean(count_p) == sum/sum, so the ratio stays
        # correct even when num_batches % process_count != 0 (unequal
        # shards would otherwise give every process a different number).
        batch_count = float(len(self.my_batches))
        if reduce_hosts:
            from ..parallel.collectives import cross_host_mean

            (rec2d, cnt2d, rec3d, cnt3d, rec3dt, cnt3dt, ambiguity,
             batch_count) = cross_host_mean(
                (rec2d, cnt2d, rec3d, cnt3d, rec3dt, cnt3dt, ambiguity,
                 batch_count)
            )
        eval_dir = os.path.join(self.log_dir, "eval")
        os.makedirs(eval_dir, exist_ok=True)
        path = os.path.join(eval_dir, "eval_result.txt")

        if self.cal_per_act:
            full, select = EU.cal_per_class_error(rec2d, cnt2d)
            full3, select3 = EU.cal_per_class_error(rec3d, cnt3d, multi=True)
            fullt, selectt = EU.cal_per_class_error(rec3dt, cnt3dt, multi=True)
            print("---2D-----")
            print(rec2d)
            print(f"2D MSE: {full} %")
            print(f"2D MSE: {select} %")
            print("---3D----")
            for tag, e in (("", full3), ("select ", select3)):
                for m in ("mpjpe", "n-mpjpe", "p-mpjpe"):
                    print(f"{tag}{m.upper()}: {e[m]}")
            with open(path, "w") as f:
                f.write(f"2D MSE: {full} %\n")
                f.write(f"MPJPE: {full3['mpjpe']} %\n")
                f.write(f"N-MPJPE: {full3['n-mpjpe']} %\n")
                f.write(f"P-MPJPE: {full3['p-mpjpe']} %\n")
                f.write(f"TRI MPJPE: {fullt['mpjpe']} %\n")
                f.write(f"TRI N-MPJPE: {fullt['n-mpjpe']} %\n")
                f.write(f"TRI P-MPJPE: {fullt['p-mpjpe']} %\n")
                f.write("--------select---------\n")
                f.write(f"2D MSE: {select} %\n")
                f.write(f"MPJPE: {select3['mpjpe']} %\n")
                f.write(f"N-MPJPE: {select3['n-mpjpe']} %\n")
                f.write(f"P-MPJPE: {select3['p-mpjpe']} %\n")
                f.write(f"TRI MPJPE: {selectt['mpjpe']} %\n")
                f.write(f"TRI N-MPJPE: {selectt['n-mpjpe']} %\n")
                f.write(f"TRI P-MPJPE: {selectt['p-mpjpe']} %\n")
        else:
            with open(path, "w") as f:
                f.write(f"2D MSE: {rec2d / cnt2d} %\n")
                f.write("---3D-----\n")
                for key, val in rec3d.items():
                    f.write(f"{key}: {val / cnt3d[key]}"
                            + (" %\n" if key in ("pck", "auc") else "\n"))
                f.write("---Tri3D-----\n")
                for key, val in rec3dt.items():
                    # Faithful reference quirk: denominator is cnt3d, not
                    # cnt3dt (reference eval.py:291).
                    denom = cnt3d[key] if key in ("pck", "auc") else cnt3dt[key]
                    f.write(f"{key}: {val / denom}"
                            + (" %\n" if key in ("pck", "auc") else "\n"))

        # per-process normalization, like the reference's per-rank loader
        # length (reference eval.py:336); under reduce_hosts both terms are
        # cross-host means, so the ratio is the global one.
        ratio = ambiguity / max(1.0, batch_count) / len(self.cam_id_list)
        self.last_ambiguity_ratio = float(ratio)
        print(f"Results saved in {path}")
        print(f"Ambiguity Ratio:{ratio}")
        return path
