"""Integral keypoint detectors (single- and multi-hypothesis).

Thin flax wrappers that run the ResNet pose net and decode its heatmap
logits with the fused integral ops. Output keypoints are always
(B, num_hypo, K, 3) in [-1, 1] (single-hypothesis uses num_hypo == 1) plus
the z-marginal of batch element 0 for visualization.

Reference: modules/keypoint_detector_integral.py and
modules/keypoint_detector_integral_multi.py.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import integral
from ..utils.platform import pallas_ok
from .resnet import ResPoseNet


class KPDetector3D(nn.Module):
    """Single-hypothesis integral detector.
    Reference: modules/keypoint_detector_integral.py:6-65.

    remat_decode: recompute the softmax-volume decode in the backward pass
    (selective rematerialization — the (B, H, W, K, D) volume dominates
    activation memory while the decode itself is ~2 ms; lets large batches
    keep full conv activations)."""

    num_kp: int = 18
    depth_dim: int = 64
    num_layers: int = 50
    dtype: Any = jnp.float32
    remat_decode: bool = False
    fp32_logits: bool = True
    use_pallas: bool | None = None
    bn_groups: int = 1
    fuse_bn: bool = False
    phase_head: bool = False

    @nn.compact
    def __call__(self, img, train: bool = True, stage: str = "all"):
        net = ResPoseNet(
            self.num_kp, self.depth_dim, self.num_layers, dtype=self.dtype,
            fp32_logits=self.fp32_logits, bn_groups=self.bn_groups,
            fuse_bn=self.fuse_bn, phase_head=self.phase_head,
            name="net",
        )
        if stage == "features":
            return net(img, train, stage="features")
        logits = net(img, train, stage="final" if stage == "tail" else "all")
        decode = functools.partial(integral.decode_single,
                                   num_joints=self.num_kp,
                                   use_pallas=self.use_pallas)
        if self.remat_decode:
            decode = jax.checkpoint(decode)
        return decode(logits)


class KPDetector3DMulti(nn.Module):
    """Multi-hypothesis integral detector: shared x/y soft-argmax, depth
    hypotheses from 1-D peak finding + windowed expectation.
    Reference: modules/keypoint_detector_integral_multi.py:6-88.

    remat_decode: see KPDetector3D."""

    num_kp: int = 18
    depth_dim: int = 64
    num_hypo: int = 3
    neighbor_size: int = 15
    num_layers: int = 50
    dtype: Any = jnp.float32
    remat_decode: bool = False
    fp32_logits: bool = True
    use_pallas: bool | None = None
    bn_groups: int = 1
    fuse_bn: bool = False
    phase_head: bool = False

    @nn.compact
    def __call__(self, img, train: bool = True, stage: str = "all"):
        """stage: 'all' (image -> decode) | 'features' (image -> deconv
        feature map) | 'tail' (feature map -> final conv -> decode). The
        features/tail split carries the 'head_decode' remat boundary (see
        models/composed.py:_detector_apply): recomputing final-conv+decode
        in the backward pass keeps the K*D-channel softmax volume out of
        saved activations."""
        net = ResPoseNet(
            self.num_kp, self.depth_dim, self.num_layers, dtype=self.dtype,
            fp32_logits=self.fp32_logits, bn_groups=self.bn_groups,
            fuse_bn=self.fuse_bn, phase_head=self.phase_head,
            name="net",
        )
        if stage == "features":
            return net(img, train, stage="features")
        logits = net(img, train, stage="final" if stage == "tail" else "all")
        decode = functools.partial(
            integral.decode_multi, num_joints=self.num_kp,
            num_hypo=self.num_hypo, neighbor_size=self.neighbor_size,
            use_pallas=self.use_pallas,
        )
        if self.remat_decode:
            decode = jax.checkpoint(decode)
        return decode(logits)


def build_detector(detector_params: dict, dtype=jnp.float32,
                   remat_decode: bool = False):
    """Factory keyed on config name, mirroring the reference's dispatch
    (reference: train.py:214-217)."""
    p = dict(detector_params)
    name = p.pop("name")
    common = dict(
        num_kp=p["num_kp"],
        depth_dim=p["depth_dim"],
        num_layers=detector_params.get("num_layers", 50),
        dtype=dtype,
        remat_decode=remat_decode,
        fp32_logits=detector_params.get("fp32_logits", True),
        # per-camera BN statistics (reference semantics); set by the
        # factory from model_params.per_camera_bn
        bn_groups=int(detector_params.get("bn_groups", 1)),
        # Same gate as the physique net's pallas flag (train/factory.py):
        # the decode kernels have no GSPMD partitioning rule, so a config-
        # enabled flag must not survive onto a multi-device mesh or a
        # non-TPU backend. None (= auto) passes through untouched.
        use_pallas=(detector_params.get("use_pallas") and pallas_ok())
        if detector_params.get("use_pallas") is not None else None,
        # fused BN+ReLU+conv3x3 Pallas links in the bottleneck stages
        # (models/resnet.py:Bottleneck.fuse_bn); same single-device-TPU
        # gate as the decode kernels.
        fuse_bn=bool(detector_params.get("fuse_bn", False)) and pallas_ok(),
        # phase-layout-propagated deconv head (models/deconv_phase.py);
        # exact + parameter-compatible, pure XLA (no device gate needed)
        phase_head=bool(detector_params.get("phase_head", False)),
    )
    if name == "resnet_multi":
        return KPDetector3DMulti(
            num_hypo=p["num_hypo"],
            neighbor_size=p["neighbor_size"],
            **common,
        )
    return KPDetector3D(**common)
