"""Pallas TPU kernel: 3x3 convolution for small-channel layers, NCHW.

Why this exists: XLA:TPU convolutions put the OUTPUT channel axis on the
128-wide MXU lane dimension. The physique network's layers (Cout in
{1, 32, 64}) can therefore use at most 25-50% of every MXU tile — a
hardware shape limit XLA cannot lift in the NHWC form (measured ~35% of
roofline for the physique net, PERF.md). This kernel computes the conv in
the TRANSPOSED form

    out[co, h, w] = sum_{ky,kx,ci} W[co, (ky,kx,ci)] . x[ci, h+ky-1, w+kx-1]

i.e. an (Cout, 9*Cin) @ (9*Cin, W) matmul per output row, so the lane
dimension carries PIXELS (W = 256/128/64, always a full or half tile) and
the contraction carries 9*Cin (288 for Cin=32: 75% K-utilization) — the
small Cout becomes the streamed M dimension, which only affects pipeline
fill, not per-cycle utilization.

Layout contract: activations are NCHW (lanes = W). The physique module
keeps its whole conv chain in NCHW so no relayout ever happens between
layers (channel-count 1 at entry/exit makes the NHWC<->NCHW conversion a
free reshape).

Mechanics:
  * grid (B, H/Ht); block x (1, Cin, Ht, W). The 3x3 row halo cannot be
    expressed with non-overlapping BlockSpecs, so the two boundary rows of
    each tile are pre-gathered in XLA into a tiny (B, nt, Cin, 2, W) side
    input (2/Ht extra traffic) and stitched in VMEM scratch.
  * column taps are lane-rolls of the row with the wrapped lane zeroed
    (SAME padding); per-joint reshapes are never used.
  * stride 2 uses the same kernel on a 2x2 space-to-depth folding of the
    input (fold done by the caller in XLA): a 3x3/s2 conv over the fine
    grid is EXACTLY a 2x2/s1 conv over the folded grid with the kernel
    re-indexed K[d, r] = W[2d + r - 1] per axis (one zero tap), the same
    identity as models/resnet.py:SpaceToDepthStem.

Backward: custom VJP. dgrad(dx) is the same kernel with the transposed,
spatially-flipped kernel (a 3x3/s1 conv in Cout->Cin direction); wgrad is
delegated to XLA via jax.vjp on lax.conv_general_dilated (its (9Cin, Cout)
output shape is small; the contraction over pixels streams fine in XLA).

Reference semantics: modules/physique_network.py:14-36 (plain
torch.nn.Conv2d(3,3,padding=1) stacks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_ht(h: int) -> int:
    for ht in (32, 16, 8, 4, 2):
        if h % ht == 0:
            return ht
    return h


def _shift_cols(row: jnp.ndarray, s: int) -> jnp.ndarray:
    """row (Cin, W) -> row shifted so piece[:, w] = row[:, w + s], zero
    where w + s is out of range (SAME padding). s in {-1, 0, 1}."""
    if s == 0:
        return row
    w = row.shape[-1]
    if _use_interpret():
        rolled = jnp.roll(row, -s, axis=1)
    else:
        # pltpu.roll: shift must be non-negative ((-s) % w is equivalent)
        # and Mosaic only rotates 32-bit data — round-trip bf16 via f32.
        r32 = pltpu.roll(row.astype(jnp.float32), (-s) % w, 1)
        rolled = r32.astype(row.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    if s > 0:
        return jnp.where(lane >= w - s, jnp.zeros_like(rolled), rolled)
    return jnp.where(lane < -s, jnp.zeros_like(rolled), rolled)


def _conv_kernel(kh, kw, x_ref, halo_ref, w_ref, b_ref, out_ref, sx):
    ht = x_ref.shape[2]
    # Stitch the halo rows around the tile: sx rows [0, 1..Ht, Ht+1].
    sx[:, 1:ht + 1, :] = x_ref[0]
    sx[:, 0:1, :] = halo_ref[0, 0, :, 0:1, :]
    sx[:, ht + 1:ht + 2, :] = halo_ref[0, 0, :, 1:2, :]

    wm = w_ref[:]  # (Cout, kh*kw*Cin)
    bias = b_ref[:]  # (Cout, 1)
    for h in range(ht):
        pieces = []
        for dy in range(kh):
            row = sx[:, h + dy, :]  # (Cin, W)
            for dx in range(kw):
                pieces.append(_shift_cols(row, dx - (kw // 2)))
        patch = jnp.concatenate(pieces, axis=0)  # (kh*kw*Cin, W)
        acc = jax.lax.dot_general(
            wm, patch,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, h, :] = (acc + bias).astype(out_ref.dtype)


def _halo_rows(x: jnp.ndarray, ht: int, kh: int) -> jnp.ndarray:
    """(B, Cin, H, W) -> (B, nt, Cin, 2, W): the row above and below each
    Ht-tile (zeros at the image border, matching SAME padding). For kh == 2
    (folded stride-2) only the row below is consumed; the top slot is
    still produced to keep one kernel signature."""
    b, cin, h, w = x.shape
    nt = h // ht
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    idx_up = jnp.arange(nt) * ht  # xp row == x row t*Ht - 1
    idx_dn = jnp.arange(nt) * ht + ht + 1  # xp row == x row (t+1)*Ht
    up = xp[:, :, idx_up, :]  # (B, Cin, nt, W)
    dn = xp[:, :, idx_dn, :]
    halo = jnp.stack([up, dn], axis=3)  # (B, Cin, nt, 2, W)
    return halo.transpose(0, 2, 1, 3, 4)  # (B, nt, Cin, 2, W)


def _conv_call(x: jnp.ndarray, wm: jnp.ndarray, bias: jnp.ndarray,
               kh: int, kw: int) -> jnp.ndarray:
    """x (B, Cin, H, W), wm (Cout, kh*kw*Cin) -> (B, Cout, H, W).
    kh/kw in {(3,3) stride-1, (2,2) folded stride-2}."""
    b, cin, h, w = x.shape
    cout = wm.shape[0]
    ht = _pick_ht(h)
    nt = h // ht
    halo = _halo_rows(x, ht, kh)

    kern = functools.partial(_conv_kernel, kh, kw)
    return pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, cin, ht, w), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin, 2, w), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, kh * kw * cin), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, ht, w), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, h, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((cin, ht + 2, w), x.dtype)],
        interpret=_use_interpret(),
    )(x, halo, wm, bias)


def _wmat(w: jnp.ndarray) -> jnp.ndarray:
    """flax (kh, kw, Cin, Cout) kernel -> (Cout, kh*kw*Cin) matching the
    kernel's (dy, dx, ci) patch row order."""
    kh, kw, cin, cout = w.shape
    return w.transpose(3, 0, 1, 2).reshape(cout, kh * kw * cin)


def _fold2x2(x: jnp.ndarray) -> jnp.ndarray:
    """NCHW 2x2 space-to-depth: (B, C, H, W) -> (B, 4C, H/2, W/2) with
    channel order (ry, rx, c)."""
    b, c, h, w = x.shape
    xf = x.reshape(b, c, h // 2, 2, w // 2, 2)
    xf = xf.transpose(0, 3, 5, 1, 2, 4)  # (B, ry, rx, C, H/2, W/2)
    return xf.reshape(b, 4 * c, h // 2, w // 2)


def _fold_kernel_s2(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) stride-2 kernel -> (2, 2, 4*Cin, Cout) over the
    2x2-folded input: K[d, r] = W[2d + r - 1] per axis (zero at index -1),
    channel order (ry, rx, ci) matching _fold2x2."""
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # index -1 -> 0
    cin, cout = w.shape[2], w.shape[3]
    k = wp.reshape(2, 2, 2, 2, cin, cout)  # (dy, ry, dx, rx, ci, co)
    return k.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cin, cout)


def _conv_fwd(x, w, bias, stride):
    cout = w.shape[3]
    b2 = (jnp.zeros((cout,), jnp.float32) if bias is None else bias)
    b2 = b2.astype(jnp.float32).reshape(cout, 1)
    if stride == 1:
        return _conv_call(x, _wmat(w).astype(x.dtype), b2, 3, 3)
    assert stride == 2
    xf = _fold2x2(x)
    kf = _fold_kernel_s2(w)
    return _conv_call(xf, _wmat(kf).astype(x.dtype), b2, 2, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_nchw(x, w, bias, stride=1):
    """3x3 SAME conv, NCHW activations, flax-layout kernel (3,3,Cin,Cout),
    stride 1 or 2. bias (Cout,) or None."""
    return _conv_fwd(x, w, bias, stride)


def _xla_ref(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )


def _conv_vjp_fwd(x, w, bias, stride):
    return _conv_fwd(x, w, bias, stride), (x, w, bias is not None)


def _conv_vjp_bwd(stride, res, g):
    x, w, has_bias = res
    # dgrad: correlation of g with the flipped, Cin<->Cout-swapped kernel —
    # a stride-1 3x3 conv this kernel already handles. For stride 2, run it
    # on the folded-gradient formulation via XLA transpose of the fold.
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,Cout,Cin)
    if stride == 1:
        zeros = jnp.zeros((w.shape[2],), jnp.float32)
        dx = conv3x3_nchw(g, wt, zeros, 1)
    else:
        # d/dx of (fold -> 2x2 conv): XLA transposed conv (the stride-2
        # layers carry ~10% of physique FLOPs; see module docstring).
        dx = jax.vjp(lambda x_: _xla_ref(x_, w, 2), x)[1](g.astype(x.dtype))[0]
    # wgrad via XLA: (9Cin, Cout) output is tiny; pixel contraction
    # streams at XLA's native efficiency.
    dw = jax.vjp(lambda w_: _xla_ref(x, w_, stride), w)[1](
        g.astype(x.dtype)
    )[0].astype(w.dtype)
    db = g.astype(jnp.float32).sum(axis=(0, 2, 3)) if has_bias else None
    return dx.astype(x.dtype), dw, db


conv3x3_nchw.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)
