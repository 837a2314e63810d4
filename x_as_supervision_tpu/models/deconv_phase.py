"""Phase-layout-propagated deconv head (the round-4 layout experiment).

The dilated lowering of ConvTranspose(k4, s2) executes 4x redundant MACs
on zeros (PERF.md round 2: ~16 of 50 GFLOP/img are zero-MACs; reference
head semantics at modules/integral_base_modules/deconv_head.py:24-40).
Round 2's per-layer phase decomposition (SubpixelConvTranspose,
models/resnet.py) removed the waste but lost on the bench chip because
every layer paid a phase->space interleave that crosses sublane tiles.

This module propagates the PHASE LAYOUT through the whole head instead:

  * activations live as [B, Py, Px, Hb, Wb, C] with the 8x8 base grid
    innermost and the phase grid outermost (effectively batch);
  * each deconv layer maps P -> 4P phases with 16 exact channel matmuls
    over logically-shifted views. A logical shift by delta in {-1,0,+1}
    is a phase-index select plus a base-grid shift on the single wrapped
    phase — all outer-axis block copies, no sublane crossings;
  * BatchNorm/ReLU see the phase axes folded into batch ([B*P, Hb, Wb, C]
    — identical statistics to the interleaved layout, since BN reduces
    over all logical pixels either way);
  * ONE interleave at the very end, on the 256-channel feature map
    (a single transpose; the following 1x1 projection and the decode then
    run on the standard [B, 64, 64, .] layout).

Derivation (1D, verified numerically against flax ConvTranspose in
tests/test_phase_head.py): with logical input x and kernel F (transposed-
conv orientation, 'SAME' padding),

    out[2r + q] = sum_{d in {0,1}} x[r + q + d - 1] . F[q + 2d]

and a logical index r = P*u + f decomposes into base u, phase f, so the
shift r -> r+delta touches only the phase index except at the wrap, which
rolls the base grid (zero-padded at the true boundary). New phases stack
as the minor phase bit: f_new = 2f + q.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .resnet import _KAIMING


def _logical_shift(x, delta: int, phase_axis: int, base_axis: int):
    """x indexed [.., P, .., Hb, ..] -> view reading logical index r+delta
    (zero beyond the boundary)."""
    if delta == 0:
        return x
    p = x.shape[phase_axis]
    hb = x.shape[base_axis]

    def take(axis, lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return idx

    def base_shift(t, d):
        # t has ONE phase entry; read base u+d with zero padding
        pad = [(0, 0)] * x.ndim
        if d == 1:
            out = t[tuple(take(base_axis, 1, hb))]
            pad[base_axis] = (0, 1)
        else:
            out = t[tuple(take(base_axis, 0, hb - 1))]
            pad[base_axis] = (1, 0)
        return jnp.pad(out, pad)

    if delta == 1:
        main = x[tuple(take(phase_axis, 1, p))]      # phases 1..P-1
        wrap = x[tuple(take(phase_axis, 0, 1))]      # phase 0 @ base u+1
        return jnp.concatenate([main, base_shift(wrap, 1)], axis=phase_axis)
    # delta == -1
    main = x[tuple(take(phase_axis, 0, p - 1))]      # phases 0..P-2
    wrap = x[tuple(take(phase_axis, p - 1, p))]      # phase P-1 @ base u-1
    return jnp.concatenate([base_shift(wrap, -1), main], axis=phase_axis)


def phase_deconv_apply(x, kernel):
    """One transposed-conv layer in phase layout.

    x: [B, Py, Px, Hb, Wb, Cin]; kernel: (4, 4, Cin, Cout) — the SAME
    parameter nn.ConvTranspose holds, so checkpoints are interchangeable.
    Returns [B, 2*Py, 2*Px, Hb, Wb, Cout].
    """
    b, py, px, hb, wb, _ = x.shape
    qrows = []
    for qy in (0, 1):
        qcols = []
        for qx in (0, 1):
            # one MXU matmul per out-phase: the 4 taps concatenated on the
            # channel axis against the stacked 4C x Cout kernel
            taps, ks = [], []
            for dy in (0, 1):
                for dx in (0, 1):
                    xs = _logical_shift(x, qy + dy - 1, 1, 3)
                    taps.append(_logical_shift(xs, qx + dx - 1, 2, 4))
                    ks.append(kernel[qy + 2 * dy, qx + 2 * dx])
            qcols.append(jnp.einsum(
                "bypqwc,cd->bypqwd",
                jnp.concatenate(taps, axis=-1),
                jnp.concatenate(ks, axis=0),
            ))
        qrows.append(qcols)
    # new minor phase bit: f_new = 2 f + q (q stacked just inside each old
    # phase axis, so the reshape merges (Py, qy) and (Px, qx) in order)
    y = jnp.stack(
        [jnp.stack([qrows[0][0], qrows[0][1]], axis=3),
         jnp.stack([qrows[1][0], qrows[1][1]], axis=3)],
        axis=2,
    )  # [B, Py, 2(qy), Px, 2(qx), Hb, Wb, C]
    return y.reshape(b, 2 * py, 2 * px, hb, wb, -1)


def phase_interleave(x):
    """[B, Py, Px, Hb, Wb, C] -> the standard interleaved [B, H, W, C]
    (logical index r = P*u + f: base-major, phase-minor). The head's ONE
    layout-crossing op."""
    b, py, px, hb, wb, c = x.shape
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, hb * py, wb * px, c)


class PhaseConvTranspose(nn.Module):
    """Drop-in ConvTranspose(k4, s2, 'SAME', no bias) on phase layout —
    same 'kernel' parameter as nn.ConvTranspose (shape (4,4,Cin,Cout))."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", _KAIMING, (4, 4, cin, self.features), jnp.float32
        ).astype(self.dtype)
        return phase_deconv_apply(x.astype(self.dtype), kernel)
