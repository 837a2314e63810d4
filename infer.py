"""Inference CLI: run a trained detector over a directory of pre-cropped
patch images (+ optional masks for background removal) and write the
multi-hypothesis keypoints to JSON.

  python infer.py --config <yaml> --checkpoint <ckpt_dir> \
      --images <dir-of-pngs> [--masks <dir>] [--out poses.json]

The reference framework ships no deployment entry point; this is the
serving-path complement to train.py/eval.py (see
x_as_supervision_tpu/serve.py).
"""

from __future__ import annotations

import glob
import json
import os
from argparse import ArgumentParser

import numpy as np


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--images", required=True,
                        help="directory of pre-cropped patch images")
    parser.add_argument("--masks", default=None,
                        help="optional mask directory (rm_bg behavior)")
    parser.add_argument("--out", default="poses.json")
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--platform", default=None)
    opt = parser.parse_args()

    import cv2
    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    from x_as_supervision_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from x_as_supervision_tpu.config import load_config
    from x_as_supervision_tpu.serve import PoseEstimator

    config = load_config(opt.config)
    est = PoseEstimator(config, checkpoint_path=opt.checkpoint,
                        batch_size=opt.batch_size)

    paths = sorted(
        p for ext in ("png", "jpg", "jpeg")
        for p in glob.glob(os.path.join(opt.images, f"*.{ext}"))
    )
    if not paths:
        raise SystemExit(f"no images found under {opt.images}")

    size = est.patch
    imgs = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)[..., ::-1]
        if img.shape[:2] != (size, size):
            img = cv2.resize(img, (size, size))
        if opt.masks:
            mpath = os.path.join(opt.masks, os.path.basename(p))
            mask = cv2.imread(mpath, cv2.IMREAD_GRAYSCALE)
            if mask is not None:
                if mask.shape != img.shape[:2]:
                    mask = cv2.resize(mask, (size, size),
                                      interpolation=cv2.INTER_NEAREST)
                img = img * (mask[..., None] / 255.0)
        imgs.append(img.astype(np.float32))

    result = est(np.stack(imgs))
    out = {
        os.path.basename(p): {
            "kps_patch_norm": result.kps_patch[i].tolist(),
            "kps_pixels": result.kps_pixels[i].tolist(),
        }
        for i, p in enumerate(paths)
    }
    with open(opt.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(paths)} poses "
          f"({result.kps_patch.shape[1]} hypotheses each) to {opt.out}")


if __name__ == "__main__":
    main()
