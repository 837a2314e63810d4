"""Inference / serving path.

The reference has no deployment story (research scripts only); this module
provides one TPU-first: a `PoseEstimator` that loads a training checkpoint
(detector-only restore, reference eval.py:310-313 semantics), compiles a
fixed-batch jitted forward once, pads partial batches, and serves
multi-hypothesis 2D/3D keypoints — optionally lifted to camera/world
coordinates when calibration is supplied.

Throughput notes: the forward runs in bfloat16 on NHWC batches; fixed batch
size means one compilation; callers stream arbitrary numbers of images.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .models.detector import build_detector
from .ops import geometry as G


@dataclass
class PoseResult:
    kps_patch: np.ndarray  # (N, num_hypo, K, 3), normalized [-1, 1]
    kps_pixels: np.ndarray  # (N, num_hypo, K, 3), patch pixels + depth px


class PoseEstimator:
    def __init__(
        self,
        config: dict,
        checkpoint_path: str | None = None,
        det_vars: dict | None = None,
        batch_size: int = 8,
        dtype=jnp.bfloat16,
    ):
        self.config = config
        self.batch_size = batch_size
        tp = config["train_params"]
        self.patch = int(tp.get("patch_width", 256))
        dp = config.get("dataset_params", {})
        self.mean = dp.get("dataiter", {}).get("mean")
        self.std = dp.get("dataiter", {}).get("std")

        self.detector = build_detector(
            config["model_params"]["detector_params"], dtype=dtype
        )
        if det_vars is None:
            if checkpoint_path is None:
                raise ValueError("need checkpoint_path or det_vars")
            from .train import checkpoint as ckpt

            params, stats = ckpt.restore_detector(checkpoint_path)
            det_vars = {"params": params, "batch_stats": stats}
        self._det_vars = det_vars

        @jax.jit
        def _forward(det_vars, imgs):
            return self.detector.apply(det_vars, imgs, train=False).kps

        self._forward = _forward

    def preprocess(self, images: np.ndarray) -> np.ndarray:
        """(N, S, S, 3) RGB uint8/float -> normalized float32."""
        x = np.asarray(images, np.float32)
        if self.mean is not None and self.std is not None:
            x = (x - np.asarray(self.mean, np.float32)) / np.asarray(
                self.std, np.float32
            )
        return x

    def __call__(self, images: np.ndarray) -> PoseResult:
        """Run the detector over N pre-cropped patches (padding the last
        partial batch to the compiled batch size)."""
        x = self.preprocess(images)
        n = x.shape[0]
        outs = []
        for start in range(0, n, self.batch_size):
            chunk = x[start : start + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)]
                )
            kps = np.asarray(self._forward(self._det_vars, jnp.asarray(chunk)))
            outs.append(kps[: self.batch_size - pad])
        kps = np.concatenate(outs, axis=0)

        pixels = kps.copy()
        pixels[..., 0] = (pixels[..., 0] + 1) / 2 * (self.patch - 1)
        pixels[..., 1] = (pixels[..., 1] + 1) / 2 * (self.patch - 1)
        pixels[..., 2] = pixels[..., 2] * (self.patch - 1)
        return PoseResult(kps_patch=kps, kps_pixels=pixels)

    def lift_to_world(self, kps_patch: np.ndarray, cam: dict) -> np.ndarray:
        """Lift normalized patch keypoints to world mm given calibration
        {trans_image (N,2,3), pelvis (N,3), k_mat (N,3,3), rot_world (N,3,3),
        trans_world (N,3)} (reference patch->world chain,
        modules/util.py:128-152)."""
        n, h = kps_patch.shape[:2]
        flat = jnp.asarray(kps_patch.reshape(n * h, *kps_patch.shape[2:]))
        rep = lambda v: jnp.repeat(jnp.asarray(v), h, axis=0)
        params = {
            "cam_x_trans_image": rep(cam["trans_image"]),
            "cam_x_img": jnp.zeros((n * h, self.patch, self.patch, 3)),
            "cam_x_pelvis": rep(cam["pelvis"]),
            "cam_x_k_mat": rep(cam["k_mat"]),
            "cam_x_trans_world": rep(cam["trans_world"]),
            "cam_x_rot_world": rep(cam["rot_world"]),
        }
        world = G.convert_patch_to_world(flat, params, "cam_x", is_norm=True)
        return np.asarray(world).reshape(n, h, *kps_patch.shape[2:])
