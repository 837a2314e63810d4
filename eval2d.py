"""2D eval CLI (MPII PCKh path).

The reference's eval.sh dispatches MPII/TikTok configs to an eval2d.py not
shipped in its repo (reference: scripts/eval.sh:25-28); this is the live
equivalent: run the detector on MPII validation crops, map predictions and
GT back to original-image pixels through the inverse crop affine, apply
the L/R switch disambiguation, and report PCKh@0.5 using the dataset's
head sizes (x_as_supervision_tpu/train/metrics.py keypoint_pckh; metric
semantics per reference metrics.py:247-253).

Usage:
  python eval2d.py --config config/MPII_2D.yaml --checkpoint <ckpt_dir>
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

# MPII evaluation uses the H36M->MPII joint reordering
# (reference: human_utils/dataset/hm36.py:53) and the MPII 16-joint flip
# pairs for the L/R switch (reference: human_utils/dataset/mpii.py joint
# constants).
from x_as_supervision_tpu.data.hm36 import S_HM36_2_MPII_JT
from x_as_supervision_tpu.data.mpii import MPII_FLIP_PAIRS


def evaluate_pckh(dataset, forward_fn, patch: float, batch_size: int,
                  multi_hypo: str = "best") -> float:
    """Mean PCKh@0.5 over the dataset.

    forward_fn(imgs (B,S,S,3)) -> normalized kps (B, num_hypo, 18, 3) in
    [-1, 1] (the detector contract). Split out of main() so the protocol
    (joint reorder -> L/R switch -> hypothesis gather -> inverse-affine ->
    PCKh) is testable against a stub detector with known outputs
    (tests/test_eval2d_cli.py).
    """
    from x_as_supervision_tpu.train.eval_utils import switch_points
    from x_as_supervision_tpu.train.metrics import keypoint_pckh

    def _switch16(p, g):
        out, _ = switch_points(
            np.concatenate([p, np.zeros_like(p[..., :1])], -1),
            np.concatenate([g, np.zeros_like(g[..., :1])], -1),
            switch_list=MPII_FLIP_PAIRS,
        )
        return np.asarray(out)[..., :2]

    num_batches = max(1, len(dataset) // batch_size)
    pckh_sum, count = 0.0, 0
    for b in range(num_batches):
        batch = dataset.batch(b * batch_size, batch_size)
        kps = np.asarray(forward_fn(batch["cam_mono_img"]))  # (B,H,18,3)
        # normalized [-1,1] -> patch pixels
        pred = (kps[..., :2] + 1) / 2 * (patch - 1)

        gt = np.asarray(batch["cam_mono_joints"])[..., :2]

        # H36M 18-joint order -> MPII 16-joint order FIRST (the GT from
        # mpii_dataset is already MPII-16), THEN per-hypothesis L/R switch
        # with the MPII flip pairs — switch_points needs pred/gt in the
        # same joint indexing.
        gt16 = gt[:, S_HM36_2_MPII_JT] if gt.shape[1] == 18 else gt
        sw = np.stack(
            [_switch16(pred[:, h, S_HM36_2_MPII_JT], gt16)
             for h in range(pred.shape[1])], axis=1,
        )  # (B, H, 16, 2)
        if multi_hypo == "best" and sw.shape[1] > 1:
            # per-sample per-joint argmin vs GT, like the 3D evaluator's
            # 'best' gather (train/evaluator.py, reference eval.py:138-145)
            err = ((sw - gt16[:, None]) ** 2).sum(-1)  # (B, H, 16)
            best = err.argmin(axis=1)  # (B, 16)
            pred16 = np.take_along_axis(
                sw, best[:, None, :, None], axis=1
            )[:, 0]
        else:
            pred16 = sw[:, 0]

        # map back to original image pixels through the inverse affine
        trans = np.asarray(batch["cam_mono_trans_image"])
        inv = np.linalg.inv(
            np.concatenate(
                [trans, np.tile([[0, 0, 1]], (trans.shape[0], 1, 1))], axis=1
            )
        )[:, :2]

        def to_org(p):
            return np.einsum(
                "bij,bkj->bki", inv[:, :, :2], p
            ) + inv[:, None, :, 2]

        head = np.asarray(batch["cam_mono_head_size"])
        pckh = keypoint_pckh(to_org(pred16), to_org(gt16), head)
        pckh_sum += pckh.sum()
        count += pckh.shape[0]
    return float(pckh_sum / max(count, 1))


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--multi_hypo", default="best",
                        choices=["best", "confident"])
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu for smoke "
                             "runs; the sitecustomize default wins over "
                             "env vars)")
    opt = parser.parse_args()

    if opt.checkpoint is None:
        raise SystemExit("Must specify checkpoint path")
    log_dir = os.path.dirname(os.path.abspath(opt.checkpoint))

    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    from x_as_supervision_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from x_as_supervision_tpu.config import apply_overrides, load_config
    from x_as_supervision_tpu.data.dataloader_2d import mpii_dataset
    from x_as_supervision_tpu.data.mpii import mpii as mpii_imdb
    from x_as_supervision_tpu.train import checkpoint as ckpt
    from x_as_supervision_tpu.train.factory import build_gan_spec

    config = load_config(opt.config)
    config = apply_overrides(config, opt.batch_size, None)
    dp = config["dataset_params"]
    tp = config["train_params"]

    imdb = mpii_imdb(
        dp["dataset"].get("test_image_set", "valid"),
        dp["dataset"]["path"],
        dp["dataset"].get("mask_path", dp["dataset"]["path"]),
        tp["patch_width"], tp["patch_height"],
        dp["dataset"].get("extra_param", ""),
    )
    dataset = mpii_dataset(imdb, patch_size=int(tp["patch_width"]))

    spec = build_gan_spec(config, dtype=jnp.bfloat16)
    det_params, det_stats = ckpt.restore_detector(opt.checkpoint)
    det_vars = {"params": det_params, "batch_stats": det_stats}

    @jax.jit
    def forward(det_vars, imgs):
        return spec.detector.apply(det_vars, imgs, train=False).kps

    result = evaluate_pckh(
        dataset, lambda imgs: forward(det_vars, jnp.asarray(imgs)),
        float(tp["patch_width"]), int(tp["batch_size"]), opt.multi_hypo,
    )
    eval_dir = os.path.join(log_dir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    out = os.path.join(eval_dir, "eval2d_result.txt")
    with open(out, "w") as f:
        f.write(f"PCKh@0.5: {result}\n")
    print(f"PCKh@0.5: {result}")
    print(f"Results saved in {out}")


if __name__ == "__main__":
    main()
