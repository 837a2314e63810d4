"""Pallas TPU kernel: fused softmax + axis marginalization for the
integral decode.

The XLA path (ops/integral.py heatmap_marginals) materializes the
(B, H, W, K, D) softmax volume in HBM several times (exp, normalize, three
marginal sums — ~1.2 GB per traversal at the flagship shape); the decode is
purely HBM-bandwidth bound. This kernel streams each (batch, joint) volume
through VMEM exactly once per pass:

  forward:  one (H, W, D) tile -> max -> exp -> sum -> the three axis
            marginals, normalized in-register; HBM traffic = one logits
            read (+ a layout transpose) + three tiny marginal writes.
  backward: recomputes p from the logits tile and applies the softmax JVP
            d logits = p * (g_x[w] + g_y[h] + g_z[d] - <p, g>) — one more
            logits read + one gradient write (the fwd saves no volume).

Layout: the (B, H, W, K, D) volume is transposed once to (B, K, H, W, D)
so each grid cell's block is (1, 1, H, W, D) — Mosaic requires the last
two block dims to be full (or 8x128-aligned), which rules out blocking the
joint axis in its NHWC position. Marginal outputs are written as
(B*K, 1, n) rows for the same reason and reshaped after the call.

Grid: (B, K); each cell owns one joint's 64^3 volume (1 MB f32 in VMEM).
Reference semantics: modules/keypoint_detector_integral.py:45-53 + :24-29.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(vol_ref, ax_ref, ay_ref, az_ref):
    # All intermediates stay >= 2-D (Mosaic cannot lay out 1-D vectors).
    x = vol_ref[0, 0].astype(jnp.float32)  # (H, W, D)
    m = jnp.max(x)
    e = jnp.exp(x - m)
    inv = 1.0 / jnp.sum(e)
    ax_ref[0] = jnp.sum(e, axis=(0,)).sum(axis=1, keepdims=True).T * inv
    ay_ref[0] = jnp.sum(e, axis=(1,)).sum(axis=1, keepdims=True).T * inv
    az_ref[0] = jnp.sum(e, axis=(0,)).sum(axis=0, keepdims=True) * inv


def _bwd_kernel(vol_ref, gx_ref, gy_ref, gz_ref, dvol_ref):
    x = vol_ref[0, 0].astype(jnp.float32)  # (H, W, D)
    m = jnp.max(x)
    e = jnp.exp(x - m)
    total = jnp.sum(e)
    p = e * (1.0 / total)

    h, w, d = x.shape
    # Build g_sum with Mosaic-friendly broadcasts (broadcast_in_dim from
    # 2-D operands; reshapes that move data across sublane/lane boundaries
    # crash the Mosaic layout pass).
    gy3 = jax.lax.broadcast_in_dim(gy_ref[0].T, (h, w, d), (0, 1))
    gx3 = jax.lax.broadcast_in_dim(gx_ref[0], (h, w, d), (0, 1))
    gz3 = jax.lax.broadcast_in_dim(gz_ref[0], (h, w, d), (1, 2))
    g_sum = gy3 + gx3 + gz3
    # <p, g_sum> decomposes onto the forward marginals: sum(p * g) =
    # gy . ay + gx . ax + gz . az.
    ax = jnp.sum(p, axis=(0,)).sum(axis=1, keepdims=True).T  # (1, W)
    ay = jnp.sum(p, axis=(1,)).sum(axis=1, keepdims=True).T  # (1, H)
    az = jnp.sum(p, axis=(0,)).sum(axis=0, keepdims=True)  # (1, D)
    inner = (
        jnp.sum(gx_ref[0] * ax) + jnp.sum(gy_ref[0] * ay)
        + jnp.sum(gz_ref[0] * az)
    )
    dvol_ref[0, 0] = (p * (g_sum - inner)).astype(dvol_ref.dtype)


def _row_spec(n):
    """(B*K, 1, n) output rows: block (1, 1, n) == the full trailing dims."""
    return pl.BlockSpec((1, 1, n), lambda i, j, _k=None: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def _marginals_fwd_impl(vol_t: jax.Array):
    b, k, h, w, d = vol_t.shape
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec((1, 1, h, w, d), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, 1, w), lambda i, j: (i * k + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda i, j: (i * k + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (i * k + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * k, 1, w), jnp.float32),
            jax.ShapeDtypeStruct((b * k, 1, h), jnp.float32),
            jax.ShapeDtypeStruct((b * k, 1, d), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(vol_t)
    ax, ay, az = out
    return (
        ax.reshape(b, k, w),
        ay.reshape(b, k, h),
        az.reshape(b, k, d),
    )


@jax.custom_vjp
def marginals_pallas(vol_t: jax.Array):
    """(B, K, H, W, D) logits -> softmax marginals
    (accu_x (B,K,W), accu_y (B,K,H), accu_z (B,K,D))."""
    return _marginals_fwd_impl(vol_t)


def _marginals_vjp_fwd(vol_t):
    return _marginals_fwd_impl(vol_t), vol_t


def _marginals_vjp_bwd(vol_t, grads):
    gx, gy, gz = grads
    b, k, h, w, d = vol_t.shape
    dvol = pl.pallas_call(
        _bwd_kernel,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec((1, 1, h, w, d), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w), lambda i, j: (i * k + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda i, j: (i * k + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (i * k + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, d), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(vol_t.shape, vol_t.dtype),
        interpret=_use_interpret(),
    )(
        vol_t,
        gx.astype(jnp.float32).reshape(b * k, 1, w),
        gy.astype(jnp.float32).reshape(b * k, 1, h),
        gz.astype(jnp.float32).reshape(b * k, 1, d),
    )
    return (dvol,)


marginals_pallas.defvjp(_marginals_vjp_fwd, _marginals_vjp_bwd)


def heatmap_marginals_pallas(logits: jax.Array, num_joints: int):
    """Drop-in for ops.integral.heatmap_marginals with the Pallas kernel."""
    b, h, w, c = logits.shape
    d = c // num_joints
    vol = logits.reshape(b, h, w, num_joints, d)
    vol_t = vol.transpose(0, 3, 1, 2, 4)  # (B, K, H, W, D)
    return marginals_pallas(vol_t)
