"""Physique mask generator: conv encoder/decoder that inflates the rendered
skeleton-line mask into a body silhouette.

Two numerically equivalent execution paths sharing one parameter tree
(explicit module names; (C,)-shaped BN params are layout-agnostic):

  * NHWC (default): flax convs, BatchNorm on axis -1, bilinear resize.
    XLA's conv lowering puts Cout on the 128-wide MXU lane axis, which
    this net's small channel counts (1/32/64) can only fill 25-50% —
    measured ~35% of the FLOP roofline on v5e (PERF.md).
  * NHCW + Pallas (`use_pallas=True`): the whole chain runs (B, H, C, W)
    so the MXU lane axis carries pixels, with the small-channel convs
    computed by ops/conv_pallas.py (transposed-matmul form). The 1-channel
    entry/exit make the NHWC<->NHCW boundary a free reshape.

BatchNorm keeps global-batch statistics (SyncBN-equivalent under GSPMD).
Reference: modules/physique_network.py:4-59.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv_pallas import conv3x3_nhcw
from .resnet import _BN, _KAIMING


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Fixed 2x bilinear upsample (align_corners=False), NHWC.

    Equivalent to torch nn.Upsample(scale_factor=2, mode='bilinear')
    (reference: modules/physique_network.py:31) and to
    jax.image.resize(..., 'bilinear') at exactly 2x. Kept for reference /
    CPU paths; measured SLOWER than jax.image.resize on the v5e bench chip
    (90 vs 49 ms for the physique fwd+bwd at B=64) because the interleaving
    stack+reshape crosses sublane boundaries, so the production module uses
    jax.image.resize.
    """
    def up_axis(v, axis):
        lo = jnp.take(v, jnp.maximum(jnp.arange(v.shape[axis]) - 1, 0),
                      axis=axis)
        hi = jnp.take(
            v,
            jnp.minimum(jnp.arange(v.shape[axis]) + 1, v.shape[axis] - 1),
            axis=axis,
        )
        even = 0.25 * lo + 0.75 * v
        odd = 0.75 * v + 0.25 * hi
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] = v.shape[axis] * 2
        return stacked.reshape(new_shape)

    return up_axis(up_axis(x, 1), 2)


class _PallasConv(nn.Module):
    """3x3 SAME conv on NHCW activations via ops/conv_pallas.py, with the
    same parameter names/shapes as nn.Conv (kernel (3,3,Cin,Cout), bias)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[2]
        kernel = self.param(
            "kernel", _KAIMING, (3, 3, cin, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return conv3x3_nhcw(
            x.astype(self.dtype), kernel, bias, self.stride
        )


class PhysiqueMaskGenerator(nn.Module):
    num_features: Sequence[int]  # e.g. (32, 64, 128)
    num_parts: int = 1
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # per-camera BN statistics groups (reference per-camera forward
    # semantics; see models/resnet._BN). NHWC path only.
    bn_groups: int = 1

    def _stages(self):
        """Encoder: conv -> (conv + stride-2 down) per scale; decoder
        mirrors: conv -> bilinear x2 -> conv (reference:
        modules/physique_network.py:14-36)."""
        nf = list(self.num_features)
        ops = [("conv", nf[0], 1)]
        for i in range(1, len(nf)):
            ops += [("conv", nf[i - 1], 1), ("conv", nf[i], 2)]
        for i in range(len(nf) - 1, 0, -1):
            ops += [("conv", nf[i], 1), ("up",), ("conv", nf[i - 1], 1)]
        return ops

    @nn.compact
    def __call__(self, x, train: bool = True):
        nhcw = self.use_pallas
        if nhcw:
            b, h, w, c = x.shape
            # The NHWC -> NHCW boundary is a pure reshape ONLY for c == 1;
            # any other channel count would scramble channel/width data.
            if c != 1:
                raise ValueError(
                    f"physique pallas path requires a 1-channel input, got "
                    f"c={c}; use use_pallas=False for multi-part inputs"
                )
            x = x.reshape(b, h, c, w)

        idx = 0
        for op in self._stages():
            if op[0] == "up":
                s = x.shape
                if nhcw:
                    x = jax.image.resize(
                        x, (s[0], s[1] * 2, s[2], s[3] * 2), method="bilinear"
                    )
                else:
                    x = jax.image.resize(
                        x, (s[0], s[1] * 2, s[2] * 2, s[3]), method="bilinear"
                    )
                continue
            _, feats, stride = op
            if nhcw:
                x = _PallasConv(
                    feats, stride, dtype=self.dtype, name=f"Conv_{idx}"
                )(x)
                x = _BN(self.dtype, axis=2, name=f"_BN_{idx}")(x, train)
            else:
                x = nn.Conv(
                    feats, (3, 3), strides=(stride, stride), padding=1,
                    dtype=self.dtype, kernel_init=_KAIMING,
                    name=f"Conv_{idx}",
                )(x)
                x = _BN(self.dtype, groups=self.bn_groups,
                        name=f"_BN_{idx}")(x, train)
            x = nn.leaky_relu(x, negative_slope=0.01)
            idx += 1

        if nhcw:
            x = _PallasConv(1, 1, dtype=self.dtype, name=f"Conv_{idx}")(x)
            b, h, c, w = x.shape
            assert c == 1  # final conv is 1-feature: reshape == transpose
            x = x.reshape(b, h, w, c)
        else:
            x = nn.Conv(
                1, (3, 3), padding=1, dtype=self.dtype, kernel_init=_KAIMING,
                name=f"Conv_{idx}",
            )(x)
        return nn.sigmoid(x.astype(jnp.float32))
