"""Integral (soft-argmax) heatmap decoding, single- and multi-hypothesis.

The detector head emits logits for a K x D x H x W volume; decoding is
softmax over (D, H, W) per joint, marginalization onto each axis, and either
a plain expectation (single hypothesis) or 1-D peak finding + windowed
expectation on the depth marginal (multi-hypothesis).

Semantics mirror the reference detectors
(reference: modules/keypoint_detector_integral.py:21-65 and
modules/keypoint_detector_integral_multi.py:24-88); layout here is NHWC
(TPU-native) and everything is a pure function so the whole decode fuses
under jit. A Pallas kernel that avoids materializing the softmax volume is
in ops/integral_pallas.py (used on TPU when enabled).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class IntegralDecode(NamedTuple):
    kps: Array  # (B, num_hypo, K, 3) in [-1, 1]
    depth_prob_map: Array  # (K, D) z-marginal of batch element 0 (for vis)


def _auto_pallas(use_pallas: bool | None) -> bool:
    # Measured on the v5e bench chip (value_and_grad, B=128, K=18, 64^3):
    #   v1 kernel (B,K)-grid + pre-transpose: 20.0 vs 9.6 ms XLA fwd (B=64).
    #   v2 kernel (streaming, online-softmax, no transpose, git history):
    #     fp32 logits: 22.5 vs 17.6 ms XLA; bf16 logits: 12.2 vs 9.5 ms XLA.
    # XLA's fused reductions win at every tried shape — the decode is
    # bandwidth-bound and XLA already reads the volume a near-minimal
    # number of times, while the kernel pays an extra logits read in its
    # backward. The kernel stays available for experimentation; default is
    # the XLA path. (In the full step even the fp32-vs-bf16 logits input
    # distinction vanishes: XLA fuses the upcast into the reductions —
    # PERF.md "decode" round-2 notes.)
    if use_pallas is None:
        return False
    return use_pallas


def heatmap_marginals(logits: Array, num_joints: int) -> tuple[Array, Array, Array]:
    """Softmax the (B, H, W, K*D) head output over each joint's D*H*W volume
    and return the three axis marginals accu_x (B,K,W), accu_y (B,K,H),
    accu_z (B,K,D).

    Reference: keypoint_detector_integral.py:45-53 (softmax + reshape) and
    :24-29 (marginalization).
    """
    b, h, w, c = logits.shape
    d = c // num_joints
    # bf16 logits are upcast here: the softmax sums (64^3 terms) need f32
    # accumulation. The Pallas kernel does the same cast per VMEM tile.
    vol = logits.reshape(b, h, w, num_joints, d).astype(jnp.float32)
    vol = vol - jax.lax.stop_gradient(
        vol.max(axis=(1, 2, 4), keepdims=True)
    )
    e = jnp.exp(vol)
    # Marginalize the UNNORMALIZED volume and divide the small marginals by
    # Z: sum(e)/Z == sum(e/Z) exactly, but the normalized (B, H, W, K, D)
    # volume is never materialized (one fewer full-volume elementwise pass
    # fwd+bwd, and one fewer full-volume residual).
    sx = e.sum(axis=(1, 4))  # (B, W, K)
    sy = e.sum(axis=(2, 4))  # (B, H, K)
    sz = e.sum(axis=(1, 2))  # (B, K, D)
    z = sz.sum(axis=-1)[:, None, :]  # (B, 1, K)

    accu_x = (sx / z).transpose(0, 2, 1)  # (B, K, W)
    accu_y = (sy / z).transpose(0, 2, 1)  # (B, K, H)
    accu_z = sz / z.transpose(0, 2, 1)  # (B, K, D)
    return accu_x, accu_y, accu_z


def _expectation(marginal: Array) -> Array:
    n = marginal.shape[-1]
    idx = jnp.arange(n, dtype=marginal.dtype)
    return (marginal * idx).sum(axis=-1)


def _marginals(logits: Array, num_joints: int, use_pallas: bool | None):
    """Dispatch: fused Pallas kernel on TPU (one HBM pass), XLA elsewhere."""
    if _auto_pallas(use_pallas):
        from .integral_pallas import heatmap_marginals_pallas

        return heatmap_marginals_pallas(logits, num_joints)
    return heatmap_marginals(logits, num_joints)


def decode_single(
    logits: Array, num_joints: int, use_pallas: bool | None = None
) -> IntegralDecode:
    """Single-hypothesis integral decode -> kps (B, 1, K, 3) in [-1, 1].

    Reference: keypoint_detector_integral.py:21-65. Note the reference
    normalizes x by H and y by W (identical when H == W == D, which all
    shipped configs use); we keep per-axis sizes.
    """
    accu_x, accu_y, accu_z = _marginals(logits, num_joints, use_pallas)
    h, w = logits.shape[1], logits.shape[2]
    d = logits.shape[3] // num_joints

    x = _expectation(accu_x) / h * 2.0 - 1.0
    y = _expectation(accu_y) / w * 2.0 - 1.0
    z = _expectation(accu_z) / d * 2.0 - 1.0
    kps = jnp.stack([x, y, z], axis=-1)[:, None]  # (B, 1, K, 3)
    return IntegralDecode(kps, accu_z[0])


def find_peaks(marginal: Array, num_hypo: int) -> Array:
    """Indices of the top-`num_hypo` 1-D local maxima of (B, K, D) marginals.

    A position i in [1, D-2] is a peak when m[i] >= m[i-1] and m[i] >= m[i+1];
    peaks are ranked by their marginal mass. Reference:
    keypoint_detector_integral_multi.py:24-34.
    """
    inner = marginal[..., 1:-1]
    is_peak = jnp.logical_and(
        inner >= marginal[..., :-2], inner >= marginal[..., 2:]
    )
    scores = jnp.where(is_peak, inner, 0.0)
    _, idx = jax.lax.top_k(scores, num_hypo)
    return idx + 1  # restore the original index offset


def _window_sums(x: Array, window: int) -> Array:
    """Sliding-window sums along the last axis with zero padding of
    window//2 on both sides (matches torch avg_pool1d(count_include_pad) up
    to the constant 1/window factor, which cancels in the ratio)."""
    pad = window // 2
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 1, window),
        window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad)),
    )


def decode_multi(
    logits: Array, num_joints: int, num_hypo: int, neighbor_size: int,
    use_pallas: bool | None = None,
) -> IntegralDecode:
    """Multi-hypothesis decode: shared x/y expectations, per-peak windowed
    z expectations -> kps (B, num_hypo, K, 3) where hypothesis 0 is the most
    confident peak. Reference: keypoint_detector_integral_multi.py:36-88.
    """
    accu_x, accu_y, accu_z = _marginals(logits, num_joints, use_pallas)
    h, w = logits.shape[1], logits.shape[2]
    d = logits.shape[3] // num_joints

    x = _expectation(accu_x) / h * 2.0 - 1.0  # (B, K)
    y = _expectation(accu_y) / w * 2.0 - 1.0

    peak_idx = find_peaks(accu_z, num_hypo)  # (B, K, num_hypo)
    weighted = accu_z * jnp.arange(d, dtype=accu_z.dtype)
    num = _window_sums(weighted, neighbor_size)
    den = _window_sums(accu_z, neighbor_size)
    z = jnp.take_along_axis(num, peak_idx, axis=-1) / jnp.take_along_axis(
        den, peak_idx, axis=-1
    )  # (B, K, num_hypo)
    z = z / d * 2.0 - 1.0

    xy = jnp.stack([x, y], axis=-1)[:, None]  # (B, 1, K, 2)
    xy = jnp.broadcast_to(xy, (x.shape[0], num_hypo, num_joints, 2))
    z = z.transpose(0, 2, 1)[..., None]  # (B, num_hypo, K, 1)
    kps = jnp.concatenate([xy, z], axis=-1)
    return IntegralDecode(kps, accu_z[0])
