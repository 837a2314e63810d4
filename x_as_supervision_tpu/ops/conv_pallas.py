"""Pallas TPU kernel: 3x3 convolution for small-channel layers, NHCW.

Why this exists: XLA:TPU convolutions put the OUTPUT channel axis on the
128-wide MXU lane dimension. The physique network's layers (Cout in
{1, 32, 64}) can therefore use at most 25-50% of every MXU tile — a
hardware shape limit XLA cannot lift in the NHWC form (measured ~35% of
roofline for the physique net, PERF.md). This kernel computes the conv in
the TRANSPOSED form

    out[h][co, w] = W[co, (ky,kx,ci)] @ patch_h[(ky,kx,ci), w]

i.e. one (Cout, 9*Cin) x (9*Cin, W) matmul per output row, so the lane
dimension carries PIXELS (W = 256/128/64, full or half tiles) and the
contraction carries 9*Cin (288 for Cin=32: 75% K-utilization) — the small
Cout becomes the streamed M dimension, which only affects pipeline fill,
not per-cycle utilization.

Layout contract: activations are (B, H, C, W) — "NHCW". The row slice
x[b, h] is then a perfectly-tiled (C sublanes, W lanes) 2-D block and
every in-kernel access is a LEADING-dim index, which Mosaic lowers to
plain offsets. (A first NCHW version needed `out[0, :, h, :]` stores —
Mosaic rejects the implied 2D->4D shape cast; git history.) The physique
module keeps its whole conv chain in NHCW so no relayout happens between
layers; the 1-channel entry/exit makes the NHWC<->NHCW boundary a free
reshape.

Mechanics:
  * grid (B, H/Ht); block x (1, Ht, Cin, W). The 3x3 row halo cannot be
    expressed with non-overlapping BlockSpecs, so the boundary rows of
    each tile are pre-gathered in XLA into a tiny (B, nt, 2, Cin, W) side
    input and stitched in VMEM scratch.
  * column taps are lane-rolls of the (Cin, W) row with the wrapped lane
    zeroed (SAME padding); rolls round-trip through f32 (Mosaic cannot
    rotate non-32-bit vectors).
  * stride 2 uses the same kernel on a 2x2 space-to-depth folding of the
    input (fold done by the caller in XLA): a 3x3/s2 conv over the fine
    grid is EXACTLY a 2x2/s1 conv over the folded grid with the kernel
    re-indexed K[d, r] = W[2d + r - 1] per axis (one zero tap), the same
    identity as models/resnet.py:SpaceToDepthStem.

Backward: custom VJP. dgrad is the same kernel with the transposed,
spatially-flipped kernel (a 3x3/s1 conv in Cout->Cin direction); wgrad is
delegated to XLA via jax.vjp on lax.conv_general_dilated with NHCW
dimension numbers (its (3,3,Cin,Cout) output is small; the pixel
contraction streams at XLA's native efficiency).

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


def _shift_block(block: jnp.ndarray, s: int) -> jnp.ndarray:
    """Whole-scratch column shift: out[:, w] = block[:, w + s], zeros out
    of range. One roll per tile instead of one per (row, tap)."""
    if s == 0:
        return block
    w = block.shape[-1]
    if _use_interpret():
        rolled = jnp.roll(block, -s, axis=1)
    else:
        # pltpu.roll: shift must be non-negative; Mosaic only rotates
        # 32-bit data — round-trip bf16 via f32.
        r32 = pltpu.roll(block.astype(jnp.float32), (-s) % w, 1)
        rolled = r32.astype(block.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    if s > 0:
        return jnp.where(lane >= w - s, jnp.zeros_like(rolled), rolled)
    return jnp.where(lane < -s, jnp.zeros_like(rolled), rolled)


def _conv_kernel(kh, kw, x_ref, halo_ref, w_ref, b_ref, out_ref, *scr):
    """Per-tile conv. Staging: one flat ((Ht+2)*Cin, W) scratch per column
    tap (kw of them), filled once per tile; each output row then needs only
    kw ZERO-COPY contiguous (kh*Cin, W) slices and kw MXU dots accumulated
    in f32 (taps grouped by dx; the weight matrix is laid out (dx, dy, ci)
    so each group is a static slice). A first version staged a fresh
    (kh*kw*Cin, W) patch per row — 9x the copies, VPU-bound (PERF.md)."""
    ht = x_ref.shape[1]
    cin = x_ref.shape[2]
    sc = scr[kw // 2]  # center scratch
    # Stitch tile + halo rows: flat rows [0, 1..Ht, Ht+1] * Cin.
    for r in range(ht):
        sc[(r + 1) * cin:(r + 2) * cin] = x_ref[0, r]
    sc[0:cin] = halo_ref[0, 0, 0]
    sc[(ht + 1) * cin:(ht + 2) * cin] = halo_ref[0, 0, 1]
    for dx in range(kw):
        s = dx - (kw // 2)
        if s != 0:
            scr[dx][:] = _shift_block(sc[:], s)

    wm = w_ref[:]  # (Cout, kw*kh*Cin), tap order (dx, dy, ci)
    bias = b_ref[:]  # (Cout, 1)
    kc = kh * cin
    for h in range(ht):
        acc = bias
        for dx in range(kw):
            acc = acc + jax.lax.dot_general(
                wm[:, dx * kc:(dx + 1) * kc],
                scr[dx][h * cin:(h + kh) * cin],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, h] = acc.astype(out_ref.dtype)


def _halo_rows(x: jnp.ndarray, ht: int) -> jnp.ndarray:
    """(B, H, Cin, W) -> (B, nt, 2, Cin, W): the row above and below each
    Ht-tile (zeros at the image border, matching SAME padding)."""
    b, h, cin, w = x.shape
    nt = h // ht
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    idx_up = jnp.arange(nt) * ht  # xp row == x row t*Ht - 1
    idx_dn = jnp.arange(nt) * ht + ht + 1  # xp row == x row (t+1)*Ht
    up = xp[:, idx_up]  # (B, nt, Cin, W)
    dn = xp[:, idx_dn]
    return jnp.stack([up, dn], axis=2)  # (B, nt, 2, Cin, W)


def _conv_call(x: jnp.ndarray, wm: jnp.ndarray, bias: jnp.ndarray,
               kh: int, kw: int) -> jnp.ndarray:
    """x (B, H, Cin, W), wm (Cout, kh*kw*Cin) -> (B, H, Cout, W)."""
    b, h, cin, w = x.shape
    cout = wm.shape[0]
    ht = _pick_ht(h)
    nt = h // ht
    halo = _halo_rows(x, ht)

    kern = functools.partial(_conv_kernel, kh, kw)
    return pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, ht, cin, w), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, cin, w), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, kh * kw * cin), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, cout, w), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, cout, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((ht + 2) * cin, w), x.dtype) for _ in range(kw)
        ],
        interpret=_use_interpret(),
    )(x, halo, wm, bias)


def _wmat(w: jnp.ndarray) -> jnp.ndarray:
    """flax (kh, kw, Cin, Cout) kernel -> (Cout, kw*kh*Cin) in the
    kernel's (dx, dy, ci) tap order (columns grouped so each dx group is a
    static slice)."""
    kh, kw, cin, cout = w.shape
    return w.transpose(3, 1, 0, 2).reshape(cout, kw * kh * cin)


def _fold2x2(x: jnp.ndarray) -> jnp.ndarray:
    """NHCW 2x2 space-to-depth: (B, H, C, W) -> (B, H/2, 4C, W/2) with
    channel order (ry, rx, c)."""
    b, h, c, w = x.shape
    xf = x.reshape(b, h // 2, 2, c, w // 2, 2)
    xf = xf.transpose(0, 1, 2, 5, 3, 4)  # (B, H/2, ry, rx, C, W/2)
    return xf.reshape(b, h // 2, 4 * c, w // 2)


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
def conv3x3_nhcw(x, w, bias, stride=1):
    """3x3 SAME conv, NHCW activations (B, H, C, W), flax-layout kernel
    (3, 3, Cin, Cout), stride 1 or 2. bias (Cout,) or None."""
    return _conv_fwd(x, w, bias, stride)


def _xla_ref(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHCW", "HWIO", "NHCW"),
    )


def _conv_vjp_fwd(x, w, bias, stride):
    return _conv_fwd(x, w, bias, stride), (x, w, bias is not None)


def _conv_vjp_bwd(stride, res, g):
    x, w, has_bias = res
    # dgrad: correlation of g with the flipped, Cin<->Cout-swapped kernel —
    # a stride-1 3x3 conv this kernel already handles. For stride 2, the
    # transposed conv goes through XLA (the stride-2 layers carry ~10% of
    # physique FLOPs; see module docstring).
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,Cout,Cin)
    if stride == 1:
        zeros = jnp.zeros((w.shape[2],), jnp.float32)
        dx = conv3x3_nhcw(g, wt, zeros, 1)
    else:
        dx = jax.vjp(lambda x_: _xla_ref(x_, w, 2), x)[1](g.astype(x.dtype))[0]
    # wgrad via XLA: the (3,3,Cin,Cout) output is tiny; the pixel
    # contraction streams at XLA's native efficiency.
    dw = jax.vjp(lambda w_: _xla_ref(x, w_, stride), w)[1](
        g.astype(x.dtype)
    )[0].astype(w.dtype)
    db = g.astype(jnp.float32).sum(axis=(0, 1, 3)) if has_bias else None
    return dx.astype(x.dtype), dw, db


conv3x3_nhcw.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)
