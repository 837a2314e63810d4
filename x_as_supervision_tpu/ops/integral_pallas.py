"""Pallas TPU kernel: fused softmax + axis marginalization for the
integral decode (v2 — streaming, no pre-transpose).

The XLA path (ops/integral.py heatmap_marginals) materializes the
unnormalized exp volume in HBM (~2.4 GB fp32 at the flagship shape
CB=128, K=18, 64^3) and reads it once per marginal; the decode is purely
HBM-bandwidth bound. This kernel streams the logits through VMEM exactly
once per pass in their NATIVE (B, H, W, K*D) layout:

  forward:  grid (B, H/Ht); each step loads one (Ht, W, K*D) row-tile,
            maintains per-joint online-softmax state (running max m_j,
            rescaled marginal accumulators) in VMEM scratch across the
            sequential H-tile steps, and writes the three normalized
            marginals plus (m_j, Z_j) at the last step. HBM traffic =
            one logits read + tiny marginal writes.
  backward: recomputes p = exp(x - m_j) / Z_j from the saved per-joint
            scalars (no second max pass, no saved volume) and applies the
            softmax JVP d logits = p * (gx[w] + gy[h] + gz[d] - <p, g>),
            where <p, g> per joint collapses onto the forward marginals
            and is computed outside the kernel. One more logits read +
            one gradient write.

v1 of this kernel (git history) pre-transposed the volume to
(B, K, H, W, D) and gridded over (B, K); the extra full-volume transpose
plus the 1 MB-tile pipeline made it SLOWER than XLA (20 vs 9.6 ms fwd at
B=64). v2 removes the transpose entirely.

Mosaic notes: per-joint segment reductions over the lane axis (K*D lanes,
joint j owns lanes [j*D, (j+1)*D)) are done with one-hot pooling matmuls
(MXU) built from broadcasted_iota — never with lane-splitting reshapes,
which Mosaic cannot lay out. All scratch state is >= 2-D.

Reference semantics: modules/keypoint_detector_integral.py:45-53 + :24-29.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

JP = 128  # joint-axis lane padding (K <= 128)
NEG = -1e30  # online-softmax "-inf"


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pool_mats(c: int, d: int):
    """P (c, JP): one-hot lane->joint pooling; PT (JP, c): its transpose
    (joint->lane expansion). Built from iota so nothing is carried in."""
    li = jax.lax.broadcasted_iota(jnp.int32, (c, JP), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (c, JP), 1)
    p = (li // d == ji).astype(jnp.float32)
    lit = jax.lax.broadcasted_iota(jnp.int32, (JP, c), 1)
    jit = jax.lax.broadcasted_iota(jnp.int32, (JP, c), 0)
    pt = (lit // d == jit).astype(jnp.float32)
    return p, pt


def _joint_row_max(xm: jnp.ndarray, k: int, d: int) -> jnp.ndarray:
    """(1, c) row -> (1, JP) per-joint max over each joint's d lanes.
    Static lane slices + lane concat (small, no reshape)."""
    pieces = [
        xm[:, j * d:(j + 1) * d].max(axis=1, keepdims=True) for j in range(k)
    ]
    row = jnp.concatenate(pieces, axis=1)  # (1, k)
    return jnp.pad(row, ((0, 0), (0, JP - k)), constant_values=NEG)


def _fwd_kernel(k, d, x_ref, ax_ref, ay_ref, az_ref, m_ref, z_ref,
                axs, ays, azs, ms):
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    ht = x_ref.shape[1]

    x = x_ref[0].astype(jnp.float32)  # (Ht, W, C)
    c = x.shape[-1]
    p_mat, pt_mat = _pool_mats(c, d)

    @pl.when(t == 0)
    def _():
        axs[:] = jnp.zeros_like(axs)
        ays[:] = jnp.zeros_like(ays)
        azs[:] = jnp.zeros_like(azs)
        ms[:] = jnp.full_like(ms, NEG)

    # Per-joint max of this tile, online max update + rescale factors.
    xm = x.max(axis=0).max(axis=0, keepdims=True)  # (1, C)
    mloc = _joint_row_max(xm, k, d)  # (1, JP)
    m_old = ms[0:1]
    m_new = jnp.maximum(m_old, mloc)
    f = jnp.exp(m_old - m_new)  # (1, JP); 0 at t==0 on live lanes
    f_c = jnp.dot(f, pt_mat, preferred_element_type=jnp.float32)  # (1, C)
    m_c = jnp.dot(m_new, pt_mat, preferred_element_type=jnp.float32)

    e = jnp.exp(x - m_c)  # (Ht, W, C)

    ew = e.sum(axis=0)  # (W, C)
    ez = ew.sum(axis=0, keepdims=True)  # (1, C)
    eh = e.sum(axis=1)  # (Ht, C)

    azs[0:1] = azs[0:1] * f_c + ez
    axs[:] = axs[:] * f + jnp.dot(ew, p_mat,
                                  preferred_element_type=jnp.float32)
    ays[:] = ays[:] * f
    ays[pl.ds(t * ht, ht), :] = ays[pl.ds(t * ht, ht), :] + jnp.dot(
        eh, p_mat, preferred_element_type=jnp.float32
    )
    ms[0:1] = m_new

    @pl.when(t == nt - 1)
    def _():
        z = jnp.dot(azs[0:1], p_mat, preferred_element_type=jnp.float32)
        zinv = 1.0 / jnp.where(z > 0.0, z, 1.0)  # pad lanes stay finite
        zinv_c = jnp.dot(zinv, pt_mat, preferred_element_type=jnp.float32)
        ax_ref[0] = axs[:] * zinv
        ay_ref[0] = ays[:] * zinv
        az_ref[0] = azs[0:1] * zinv_c
        m_ref[0] = ms[0:1]
        z_ref[0] = z


def _bwd_kernel(k, d, x_ref, m_ref, zinv_ref, inner_ref, gx_ref, gy_ref,
                gz_ref, dx_ref):
    x = x_ref[0].astype(jnp.float32)  # (Ht, W, C)
    ht, w, c = x.shape
    _, pt_mat = _pool_mats(c, d)

    m_c = jnp.dot(m_ref[0], pt_mat, preferred_element_type=jnp.float32)
    zi_c = jnp.dot(zinv_ref[0], pt_mat, preferred_element_type=jnp.float32)
    inner_c = jnp.dot(inner_ref[0], pt_mat,
                      preferred_element_type=jnp.float32)  # (1, C)

    p = jnp.exp(x - m_c) * zi_c  # (Ht, W, C)

    gx_c = jnp.dot(gx_ref[0], pt_mat,
                   preferred_element_type=jnp.float32)  # (W, C)
    gy_c = jnp.dot(gy_ref[0], pt_mat,
                   preferred_element_type=jnp.float32)  # (Ht, C)
    g = (
        jax.lax.broadcast_in_dim(gx_c, (ht, w, c), (1, 2))
        + jax.lax.broadcast_in_dim(gy_c, (ht, w, c), (0, 2))
        + jax.lax.broadcast_in_dim(gz_ref[0], (ht, w, c), (1, 2))
        - jax.lax.broadcast_in_dim(inner_c, (ht, w, c), (1, 2))
    )
    dx_ref[0] = (p * g).astype(dx_ref.dtype)


def _pick_ht(h: int) -> int:
    for ht in (8, 4, 2):
        if h % ht == 0:
            return ht
    return h


def _vmem(*shapes_dtypes):
    return [pltpu.VMEM(s, t) for s, t in shapes_dtypes]


def _marginals_fwd_impl(logits: jax.Array, k: int):
    b, h, w, c = logits.shape
    assert k <= JP, f"kernel packs joints into {JP} lanes; got K={k}"
    d = c // k
    ht = _pick_ht(h)
    nt = h // ht

    kern = functools.partial(_fwd_kernel, k, d)
    out = pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, ht, w, c), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, w, JP), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, JP), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, JP), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, JP), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, w, JP), jnp.float32),
            jax.ShapeDtypeStruct((b, h, JP), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, JP), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, JP), jnp.float32),
        ),
        scratch_shapes=_vmem(
            ((w, JP), jnp.float32),
            ((h, JP), jnp.float32),
            ((8, c), jnp.float32),
            ((8, JP), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(logits)
    ax_r, ay_r, az_r, m_r, z_r = out
    accu_x = ax_r[:, :, :k].transpose(0, 2, 1)  # (B, K, W)
    accu_y = ay_r[:, :, :k].transpose(0, 2, 1)  # (B, K, H)
    accu_z = az_r.reshape(b, k, d)
    return (accu_x, accu_y, accu_z), (m_r, z_r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def marginals_pallas(logits: jax.Array, num_joints: int):
    """(B, H, W, K*D) logits -> normalized softmax marginals
    (accu_x (B,K,W), accu_y (B,K,H), accu_z (B,K,D))."""
    (ax, ay, az), _ = _marginals_fwd_impl(logits, num_joints)
    return ax, ay, az


def _marginals_vjp_fwd(logits, k):
    (ax, ay, az), (m_r, z_r) = _marginals_fwd_impl(logits, k)
    return (ax, ay, az), (logits, m_r, z_r, ax, ay, az)


def _marginals_vjp_bwd(k, res, grads):
    logits, m_r, z_r, ax, ay, az = res
    gx, gy, gz = grads
    b, h, w, c = logits.shape
    d = c // k
    ht = _pick_ht(h)
    nt = h // ht

    gx = gx.astype(jnp.float32)
    gy = gy.astype(jnp.float32)
    gz = gz.astype(jnp.float32)
    # <p, g_sum> per joint collapses onto the forward marginals.
    inner = (
        (gx * ax).sum(-1) + (gy * ay).sum(-1) + (gz * az).sum(-1)
    )  # (B, K)
    pad = ((0, 0), (0, 0), (0, JP - k))
    inner_r = jnp.pad(inner[:, None, :], pad)
    zinv_r = jnp.pad(
        1.0 / jnp.where(z_r[:, :, :k] > 0.0, z_r[:, :, :k], 1.0), pad
    )
    gx_r = jnp.pad(gx.transpose(0, 2, 1), pad)  # (B, W, JP)
    gy_r = jnp.pad(gy.transpose(0, 2, 1), pad)  # (B, H, JP)
    gz_r = gz.reshape(b, 1, c)

    kern = functools.partial(_bwd_kernel, k, d)
    dx = pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, ht, w, c), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, JP), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, JP), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, JP), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, JP), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, JP), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w, c), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(logits.shape, logits.dtype),
        interpret=_use_interpret(),
    )(logits, m_r, zinv_r, inner_r, gx_r, gy_r, gz_r)
    return (dx,)


marginals_pallas.defvjp(_marginals_vjp_fwd, _marginals_vjp_bwd)


def heatmap_marginals_pallas(logits: jax.Array, num_joints: int):
    """Drop-in for ops.integral.heatmap_marginals with the Pallas kernel."""
    return marginals_pallas(logits, num_joints)
