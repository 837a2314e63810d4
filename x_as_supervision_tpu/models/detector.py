"""Integral keypoint detectors (single- and multi-hypothesis).

Thin flax wrappers that run the ResNet pose net and decode its heatmap
logits with the fused integral ops. Output keypoints are always
(B, num_hypo, K, 3) in [-1, 1] (single-hypothesis uses num_hypo == 1) plus
the z-marginal of batch element 0 for visualization.

Reference: modules/keypoint_detector_integral.py and
modules/keypoint_detector_integral_multi.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import integral
from .resnet import ResPoseNet


class KPDetector3D(nn.Module):
    """Single-hypothesis integral detector.
    Reference: modules/keypoint_detector_integral.py:6-65."""

    num_kp: int = 18
    depth_dim: int = 64
    num_layers: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = True):
        logits = ResPoseNet(
            self.num_kp, self.depth_dim, self.num_layers, dtype=self.dtype,
            name="net",
        )(img, train)
        return integral.decode_single(logits, self.num_kp)


class KPDetector3DMulti(nn.Module):
    """Multi-hypothesis integral detector: shared x/y soft-argmax, depth
    hypotheses from 1-D peak finding + windowed expectation.
    Reference: modules/keypoint_detector_integral_multi.py:6-88."""

    num_kp: int = 18
    depth_dim: int = 64
    num_hypo: int = 3
    neighbor_size: int = 15
    num_layers: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = True):
        logits = ResPoseNet(
            self.num_kp, self.depth_dim, self.num_layers, dtype=self.dtype,
            name="net",
        )(img, train)
        return integral.decode_multi(
            logits, self.num_kp, self.num_hypo, self.neighbor_size
        )


def build_detector(detector_params: dict, dtype=jnp.float32):
    """Factory keyed on config name, mirroring the reference's dispatch
    (reference: train.py:214-217)."""
    p = dict(detector_params)
    name = p.pop("name")
    p.pop("num_layers", None)
    if name == "resnet_multi":
        return KPDetector3DMulti(
            num_kp=p["num_kp"],
            depth_dim=p["depth_dim"],
            num_hypo=p["num_hypo"],
            neighbor_size=p["neighbor_size"],
            num_layers=detector_params.get("num_layers", 50),
            dtype=dtype,
        )
    return KPDetector3D(
        num_kp=p["num_kp"],
        depth_dim=p["depth_dim"],
        num_layers=detector_params.get("num_layers", 50),
        dtype=dtype,
    )
