"""Fused BN-apply + ReLU + 3x3 conv + output-stats Pallas kernel.

The round-2 trace puts the composed step's BatchNorm reduce/normalize
passes at ~45 ms/step — pure HBM bandwidth over activations that XLA
schedules as separate fusions around each conv. This kernel fuses one
whole "BN -> ReLU -> conv -> (stats for the NEXT BN)" chain link so the
activation is read once and written once per link:

    y = conv3x3(relu(x * scale + shift), w)        # SAME, stride 1
    stats = (sum_pixels(y), sum_pixels(y^2))       # per Cout channel

scale/shift are the per-channel BN affine folded with the CURRENT batch
statistics of x (computed by the previous link's stats output), so
training semantics are preserved; y is emitted pre-activation, exactly
what the next link's BN consumes.

Kernel design (v5e, NHWC, bf16 in / fp32 accumulate):
  * grid over the batch; one image per step. The (H, W, C) block is
    flattened to (H*W, C) — C on lanes (128/256/512 all fill the MXU),
    pixels on sublanes.
  * the image is staged once into a zero-padded (H*W + 2*PAD, C) VMEM
    scratch with BN+ReLU applied during the store; each of the 9 taps is
    then a STATIC slice of that scratch (tap offset dy*W + dx), so there
    are no rolls, no transposes, and row over/underflow lands in the
    zero halo (dy case) for free.
  * the dx != 0 taps additionally mask the rows that wrapped across the
    image's right/left edge (row % W tests on a broadcasted iota).
  * each tap contributes one (H*W, C) @ (C, Cout) MXU matmul into an
    fp32 accumulator; the epilogue writes y (bf16) and the per-image
    (2, Cout) stat partials (summed over the batch outside — a (B, 2, C)
    array is trivially small).

Measured on hardware against XLA's conv+BN chain in PERF.md (round 3);
no reference counterpart (the reference's conv/BN is cuDNN's).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, w_ref, scale_ref, shift_ref, y_ref, stats_ref,
            staged_ref, acc_ref, *, h: int, w: int, c_in: int, c_out: int,
            pad: int):
    hw = h * w

    # Stage the BN+ReLU'd image once; halo rows stay zero.
    staged_ref[:] = jnp.zeros_like(staged_ref)
    x = x_ref[0].reshape(hw, c_in).astype(jnp.float32)
    x = jnp.maximum(x * scale_ref[:] + shift_ref[:], 0.0)
    staged_ref[pl.ds(pad, hw), :] = x.astype(staged_ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % w

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for tap in range(9):
        dy, dx = tap // 3 - 1, tap % 3 - 1
        view = staged_ref[pl.ds(pad + dy * w + dx, hw), :]
        if dx != 0:
            valid = (col + dx >= 0) & (col + dx < w)
            view = jnp.where(valid, view, jnp.zeros_like(view))
        acc_ref[:] += jnp.dot(
            view, w_ref[tap], preferred_element_type=jnp.float32
        )

    y = acc_ref[:]
    y_ref[0] = y.reshape(h, w, c_out).astype(y_ref.dtype)
    stats_ref[0, 0, :] = y.sum(axis=0)
    stats_ref[0, 1, :] = (y * y).sum(axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bn_relu_conv(x, w, scale, shift, interpret: bool | None = None):
    """y = conv3x3_same(relu(x * scale + shift), w), plus per-channel
    (sum, sumsq) of y over all pixels and the batch.

    x: (B, H, W, Cin) bf16/f32; w: (3, 3, Cin, Cout); scale/shift: (Cin,).
    Returns (y (B, H, W, Cout) in x.dtype, stats (2, Cout) f32).
    """
    if interpret is None:
        interpret = _use_interpret()
    b, h, ww, c_in = x.shape
    c_out = w.shape[-1]
    hw = h * ww
    pad = ww + 8

    w9 = w.reshape(9, c_in, c_out).astype(x.dtype)
    scale2 = scale.reshape(1, c_in).astype(jnp.float32)
    shift2 = shift.reshape(1, c_in).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, h=h, w=ww, c_in=c_in, c_out=c_out, pad=pad
    )
    y, stats = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, ww, c_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c_in, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, ww, c_out), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, ww, c_out), x.dtype),
            jax.ShapeDtypeStruct((b, 2, c_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hw + 2 * pad, c_in), x.dtype),
            pltpu.VMEM((hw, c_out), jnp.float32),
        ],
        interpret=interpret,
    )(x, w9, scale2, shift2)
    return y, stats.sum(axis=0)


@jax.custom_vjp
def fused_link(x, w, scale, shift):
    """Trainable fused chain link: the Pallas forward of
    `fused_bn_relu_conv` with a hand-written XLA backward, so the kernel
    can sit on the training path (the Pallas kernel itself has no VJP).

    Backward math (given cotangents gy for y and gs (2, Cout) for stats):
      g      = gy + gs[0] + 2*y*gs[1]          # stats are sum / sum-sq of y
      a      = relu(x*scale + shift)           # recomputed (elementwise)
      ga, gw = conv3x3-SAME VJP of (a, w) at g # XLA's native dgrad/wgrad
      gpre   = ga * 1[x*scale+shift > 0]
      gx     = gpre * scale
      gscale = sum_pixels(gpre * x);  gshift = sum_pixels(gpre)
    The conv VJP is taken through jax.vjp of the bilinear conv, whose
    unused primal XLA dead-code-eliminates; y (the kernel's own output)
    is kept as a residual so the stats cotangent needs no extra conv.
    """
    return fused_bn_relu_conv(x, w, scale, shift)


def _fused_link_fwd(x, w, scale, shift):
    y, stats = fused_bn_relu_conv(x, w, scale, shift)
    return (y, stats), (x, w, scale, shift, y)


def _fused_link_bwd(res, cots):
    x, w, scale, shift, y = res
    gy, gstats = cots
    f32 = jnp.float32
    cdt = x.dtype  # elementwise traffic stays in the compute dtype (the
    # unfused path's BN/ReLU backward runs in it too); only the channel
    # reduces accumulate fp32.
    g = (
        gy.astype(cdt)
        + gstats[0].reshape(1, 1, 1, -1).astype(cdt)
        + 2.0 * y * gstats[1].reshape(1, 1, 1, -1).astype(cdt)
    )
    sc = scale.reshape(1, 1, 1, -1).astype(cdt)
    sh = shift.reshape(1, 1, 1, -1).astype(cdt)
    pre = x * sc + sh
    a = jnp.maximum(pre, jnp.zeros((), cdt))

    # Uniform-dtype conv so its VJP (dgrad transpose-conv + wgrad conv)
    # accepts the cotangent; TPU accumulates bf16 matmuls in fp32 anyway.
    def conv(a_, w_):
        return jax.lax.conv_general_dilated(
            a_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, conv_vjp = jax.vjp(conv, a, w.astype(cdt))
    ga, gw = conv_vjp(g)
    gw = gw.astype(w.dtype)
    gpre = jnp.where(pre > 0, ga, jnp.zeros((), ga.dtype))
    gx = gpre * sc
    gpre32 = gpre.astype(f32)
    gscale = (gpre32 * x.astype(f32)).sum(axis=(0, 1, 2)).astype(scale.dtype)
    gshift = gpre32.sum(axis=(0, 1, 2)).astype(shift.dtype)
    return gx, gw, gscale, gshift


fused_link.defvjp(_fused_link_fwd, _fused_link_bwd)


def xla_bn_relu_conv(x, w, scale, shift):
    """XLA reference for the same chain link (verification + benchmark
    baseline)."""
    xn = jnp.maximum(
        x.astype(jnp.float32) * scale.reshape(1, 1, 1, -1)
        + shift.reshape(1, 1, 1, -1),
        0.0,
    ).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xn, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    stats = jnp.stack(
        [y.sum(axis=(0, 1, 2)), (y * y).sum(axis=(0, 1, 2))]
    )
    return y.astype(x.dtype), stats


def make_stats_fold(stats, gamma, beta, n: int, eps: float = 1e-5):
    """Turn a link's (sum, sumsq) output into the next link's
    (scale, shift): BN(x) * gamma + beta == x * scale + shift."""
    mean = stats[0] / n
    # one-pass sumsq/n - mean^2 can go (tiny) negative on a near-constant
    # channel via cancellation; rsqrt(var + eps) would NaN where the
    # two-pass unfused path cannot
    var = jnp.maximum(stats[1] / n - mean**2, 0.0)
    inv = gamma * jax.lax.rsqrt(var + eps)
    return inv, beta - mean * inv
