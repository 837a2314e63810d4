"""Physique mask generator: conv encoder/decoder that inflates the rendered
skeleton-line mask into a body silhouette.

NHWC, BatchNorm with global-batch statistics (SyncBN-equivalent under GSPMD),
bilinear upsampling via jax.image.resize.
Reference: modules/physique_network.py:4-59.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

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


class PhysiqueMaskGenerator(nn.Module):
    num_features: Sequence[int]  # e.g. (32, 64, 128)
    num_parts: int = 1
    dtype: Any = jnp.float32

    def _conv(self, x, features, stride, train):
        x = nn.Conv(
            features, (3, 3), strides=(stride, stride), padding=1,
            dtype=self.dtype, kernel_init=_KAIMING,
        )(x)
        x = _BN(self.dtype)(x, train)
        return nn.leaky_relu(x, negative_slope=0.01)

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = list(self.num_features)
        # Encoder: conv -> (conv + stride-2 down) per scale.
        x = self._conv(x, nf[0], 1, train)
        for i in range(1, len(nf)):
            x = self._conv(x, nf[i - 1], 1, train)
            x = self._conv(x, nf[i], 2, train)
        # Decoder mirrors: conv -> bilinear x2 -> conv.
        for i in range(len(nf) - 1, 0, -1):
            x = self._conv(x, nf[i], 1, train)
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
            x = self._conv(x, nf[i - 1], 1, train)
        x = nn.Conv(
            1, (3, 3), padding=1, dtype=self.dtype, kernel_init=_KAIMING
        )(x)
        return nn.sigmoid(x.astype(jnp.float32))
