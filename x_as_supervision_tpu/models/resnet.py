"""ResNet backbone + deconvolution head for the integral pose detector.

TPU-native design notes:
  * NHWC layout throughout (XLA:TPU's preferred conv layout).
  * Parameters and BatchNorm statistics live in float32; compute (conv /
    matmul activations) can run in bfloat16 via `dtype` for MXU throughput.
  * BatchNorm uses the *global* batch statistics: under jit + GSPMD the mean
    and variance reductions run over the full sharded batch axis, so XLA
    inserts the cross-replica collective automatically. This reproduces the
    reference's `nn.SyncBatchNorm` (reference:
    modules/integral_base_modules/resnet.py:18,30,40) without a hand-written
    comm layer.

Reference architecture: modules/integral_base_modules/resnet.py (backbone),
deconv_head.py (head), network.py (assembly + model-zoo init). ImageNet
initialization is done offline via tools/convert_torch_resnet.py (no
network access at train time); otherwise Kaiming fan-out init is used, like
the reference's fallback.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import conv_bn_pallas

# {depth: (block, layer counts, channels)} — channels are post-expansion.
RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2), (64, 64, 128, 256, 512)),
    34: ("basic", (3, 4, 6, 3), (64, 64, 128, 256, 512)),
    50: ("bottleneck", (3, 4, 6, 3), (64, 256, 512, 1024, 2048)),
    101: ("bottleneck", (3, 4, 23, 3), (64, 256, 512, 1024, 2048)),
    152: ("bottleneck", (3, 8, 36, 3), (64, 256, 512, 1024, 2048)),
}

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _GroupedBN(nn.Module):
    """BatchNorm whose TRAIN statistics are computed per leading-axis
    group (the reference's per-camera SyncBN semantics when the camera
    axis is folded into the batch camera-major; reference
    modules/model.py:62-69 loops cameras, so each camera's forward sees
    its own batch statistics). Parameter/variable names and shapes match
    nn.BatchNorm exactly ('scale'/'bias' params, 'mean'/'var' batch
    stats), so checkpoints are interchangeable with the pooled path;
    running stats store the across-group mean."""

    groups: int
    dtype: Any = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        g = self.groups
        assert x.shape[0] % g == 0, (
            f"bn_groups={g} must divide the (camera-major) batch "
            f"{x.shape[0]}"
        )
        xg = x.astype(jnp.float32).reshape((g, x.shape[0] // g) + x.shape[1:])
        red = tuple(range(1, xg.ndim - 1))
        mean = xg.mean(red)  # (g, c)
        var = ((xg - mean.reshape(g, *([1] * (xg.ndim - 2)), c)) ** 2).mean(
            red
        )
        bshape = (g,) + (1,) * (xg.ndim - 2) + (c,)
        y = (xg - mean.reshape(bshape)) * jax.lax.rsqrt(
            var.reshape(bshape) + self.epsilon
        )
        y = y * scale + bias
        if not self.is_initializing():
            # The reference runs one forward per camera, so its running
            # stats receive g SEQUENTIAL momentum updates per step
            # (effective decay momentum**g), not one update with the
            # across-camera mean (reference: modules/model.py:62-69 +
            # torch BN momentum semantics). Unrolled fold over the group
            # stats in camera order — exact reference time constant.
            new_mean, new_var = ra_mean.value, ra_var.value
            for i in range(g):
                new_mean = (
                    self.momentum * new_mean + (1 - self.momentum) * mean[i]
                )
                new_var = (
                    self.momentum * new_var + (1 - self.momentum) * var[i]
                )
            ra_mean.value = new_mean
            ra_var.value = new_var
        return y.reshape(x.shape).astype(self.dtype)


class _StatsBN(nn.Module):
    """BatchNorm core for the fused conv+BN Pallas path. Two modes:

      'fold':  input x -> (scale, shift) s.t. BN(x)*gamma+beta ==
               x*scale + shift, folding gamma/beta with x's batch
               statistics (train) or the running statistics (eval).
               The reduce over x is the only memory pass left; the
               normalize+ReLU itself happens inside the fused kernel.
      'apply': normalize x with EXTERNAL batch statistics
               (sum, sumsq) / n — the fused kernel's stats output for
               the conv it just produced — so no reduce over x runs.

    Parameter / batch-stats names and shapes match nn.BatchNorm
    ('scale'/'bias', 'mean'/'var'), so checkpoints are interchangeable
    with the unfused path."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mode: str, train: bool, stats=None, n=None):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train and not self.is_initializing():
            if mode == "fold":
                xf = x.astype(jnp.float32)
                red = tuple(range(x.ndim - 1))
                mean = xf.mean(red)
                var = ((xf - mean) ** 2).mean(red)
            else:
                mean = stats[0] / n
                # clamp: one-pass variance can cancel slightly negative on
                # a near-constant channel, and rsqrt would NaN
                var = jnp.maximum(stats[1] / n - mean**2, 0.0)
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mean
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var
            )
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = gamma * jax.lax.rsqrt(var + self.epsilon)
        shift = beta - mean * inv
        if mode == "fold":
            return inv, shift
        return x.astype(jnp.float32) * inv + shift


class _BN(nn.Module):
    """BatchNorm with fp32 statistics regardless of compute dtype.

    axis: the feature axis (-1 for NHWC, 2 for the physique net's NHCW
    (B, H, C, W) Pallas path); the (C,) parameter shapes are identical
    either way, so checkpoints are layout-agnostic.

    groups > 1 (train only, axis -1): statistics per leading-axis group —
    the reference's per-camera BN semantics for camera-major folded
    batches (see _GroupedBN). Inference always uses the running stats, so
    eval is identical either way.

    mode != 'self' dispatches to _StatsBN for the fused conv+BN Pallas
    path ('fold' returns folded (scale, shift); 'apply' normalizes with
    external stats); the variable tree is identical in every mode."""

    dtype: Any = jnp.float32
    axis: int = -1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool, mode: str = "self", stats=None,
                 n=None):
        if mode != "self":
            assert self.groups == 1 and self.axis == -1
            out = _StatsBN(name="BatchNorm_0")(x, mode, train, stats, n)
            if mode == "fold":
                return out
            return out.astype(self.dtype)
        if train and self.groups > 1 and not self.is_initializing():
            assert self.axis in (-1, x.ndim - 1), (
                "grouped BN stats only supported on the trailing feature "
                "axis"
            )
            return _GroupedBN(
                self.groups, dtype=self.dtype, name="BatchNorm_0"
            )(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis=self.axis,
            name="BatchNorm_0",
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, kernel_init=_KAIMING,
        )(x)
        y = _BN(self.dtype, groups=self.bn_groups)(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            kernel_init=_KAIMING,
        )(y)
        y = _BN(self.dtype, groups=self.bn_groups)(y, train)
        if self.downsample:
            x = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, kernel_init=_KAIMING,
            )(x)
            x = _BN(self.dtype, groups=self.bn_groups)(x, train)
        return nn.relu(x + y)


class _ConvKernel(nn.Module):
    """Declares a conv 'kernel' parameter (same name/shape/init as
    nn.Conv's) and returns it raw — the fused conv+BN path consumes the
    weight inside a Pallas kernel instead of calling nn.Conv, but the
    checkpoint tree must not change."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", _KAIMING, self.shape, jnp.float32)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with BN+ReLU between convs.

    fuse_bn: route the BN -> ReLU -> conv3x3 -> next-BN-stats chain link
    through the fused Pallas kernel (ops/conv_bn_pallas.py) on stride-1
    blocks with planes >= 256 — the measured win region (PERF.md round 3:
    1.16-1.20x over XLA at stages 3/4; XLA keeps the smaller stages).
    Exact same math: _BN_0 folds its batch stats to (scale, shift), the
    kernel applies normalize+ReLU while staging and emits the conv plus
    its (sum, sumsq), which _BN_1 consumes instead of re-reducing.
    Checkpoint tree is identical (explicit names pin the auto-naming)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4
    bn_groups: int = 1
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        fuse = (
            self.fuse_bn and self.stride == 1 and self.bn_groups == 1
            and self.planes >= 256
        )
        y = nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=_KAIMING, name="Conv_0",
        )(x)
        bn0 = _BN(self.dtype, groups=self.bn_groups, name="_BN_0")
        bn1 = _BN(self.dtype, groups=self.bn_groups, name="_BN_1")
        if fuse:
            w3 = _ConvKernel(
                (3, 3, self.planes, self.planes), name="Conv_1"
            )()
            scale, shift = bn0(y, train, mode="fold")
            y, stats = conv_bn_pallas.fused_link(
                y, w3.astype(self.dtype), scale, shift
            )
            n = y.shape[0] * y.shape[1] * y.shape[2]
            y = bn1(y, train, mode="apply", stats=stats, n=n)
        else:
            y = bn0(y, train)
            y = nn.relu(y)
            y = nn.Conv(
                self.planes, (3, 3), strides=(self.stride, self.stride),
                padding=1, use_bias=False, dtype=self.dtype,
                kernel_init=_KAIMING, name="Conv_1",
            )(y)
            y = bn1(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False,
            dtype=self.dtype, kernel_init=_KAIMING, name="Conv_2",
        )(y)
        y = _BN(self.dtype, groups=self.bn_groups, name="_BN_2")(y, train)
        if self.downsample:
            x = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype, kernel_init=_KAIMING, name="Conv_3",
            )(x)
            x = _BN(self.dtype, groups=self.bn_groups, name="_BN_3")(x, train)
        return nn.relu(x + y)


class SpaceToDepthStem(nn.Module):
    """Exact 7x7 stride-2 stem conv computed on a 2x2 space-to-depth input.

    Folding 2x2 pixel blocks into channels makes the input
    (B, S/2, S/2, 12), and because the stride is also 2 the outputs land
    exactly ON the coarse grid — no phase interleave (unlike
    SubpixelConvTranspose). The folded kernel is the 7x7 kernel re-indexed:
    K[d, r] = W[2d + r - 1] (one zero tap), i.e.

        out[i] = sum_{u=0..6} x_fine[2i + u - 3] . W[u]
               = sum_{d=0..3, r=0,1} x_coarse[i - 2 + d, r] . W[2d + r - 1]

    per axis (the classic MLPerf-ResNet stem optimization). The parameter
    keeps nn.Conv's (7, 7, 3, features) 'kernel' name/shape, so checkpoints
    and the torch converter are unaffected.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, _, cin = x.shape
        w = self.param(
            "kernel", _KAIMING, (7, 7, cin, self.features), jnp.float32
        ).astype(self.dtype)
        # fold pixels: (B, S/2, 2, S/2, 2, C) -> (B, S/2, S/2, 2, 2, C)
        h = s // 2
        xf = x.astype(self.dtype).reshape(b, h, 2, h, 2, cin)
        xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, h, 4 * cin)
        # folded kernel: K[dy, ry, dx, rx] = W[2dy+ry-1, 2dx+rx-1] (0 if <0)
        wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # index -1 -> 0
        k = wp.reshape(4, 2, 4, 2, cin, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin,
                                                  self.features)
        xp = jnp.pad(xf, ((0, 0), (2, 1), (2, 1), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNetBackbone(nn.Module):
    """7x7 stem -> maxpool -> 4 stages; input (B, 256, 256, 3) -> (B, 8, 8, C).

    Reference: modules/integral_base_modules/resnet.py:11-61.
    """

    num_layers: int = 50
    dtype: Any = jnp.float32
    # per-camera BN statistics groups (see _BN.groups); 1 = pooled.
    bn_groups: int = 1
    # fused BN+ReLU+conv3x3+stats Pallas links (see Bottleneck.fuse_bn).
    fuse_bn: bool = False
    # space-to-depth stem (see SpaceToDepthStem): exact + weight-compatible,
    # but measured NEUTRAL on the v5e bench chip (8.43 vs 8.74 ms standalone
    # stem fwd+bwd at CB=128; full step unchanged) — the stem block's time
    # is BN + maxpool-backward + wgrad, not conv input-padding. Off by
    # default; kept for wider-image regimes.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_kind, counts, _ = RESNET_SPEC[self.num_layers]
        block = BasicBlock if block_kind == "basic" else Bottleneck

        if self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = SpaceToDepthStem(64, dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                dtype=self.dtype, kernel_init=_KAIMING, name="Conv_0",
            )(x)
        x = _BN(self.dtype, groups=self.bn_groups)(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, blocks in enumerate(counts):
            planes = 64 * (2**stage)
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                expansion = 1 if block_kind == "basic" else 4
                in_ch = x.shape[-1]
                needs_down = stride != 1 or in_ch != planes * expansion
                extra = (
                    {"fuse_bn": True}
                    if self.fuse_bn and block_kind == "bottleneck" else {}
                )
                x = block(
                    planes, stride=stride, downsample=needs_down,
                    dtype=self.dtype, bn_groups=self.bn_groups, **extra,
                )(x, train)
        return x


class SubpixelConvTranspose(nn.Module):
    """Exact ConvTranspose(k4, s2, 'SAME', no bias) via phase decomposition.

    XLA lowers a stride-2 transposed conv to a conv over the zero-dilated
    input, executing 4x redundant MACs on zeros (and the TPU pays them: the
    deconv head measures ~4x its useful-FLOP roofline). Decomposing by
    output phase removes the waste exactly:

        out[2i+a, 2j+b] = sum_{dy,dx in {0,1}}
            xpad[i+a+dy, j+b+dx] . F[a+2dy, b+2dx]

    (derived + verified numerically against nn.ConvTranspose), i.e. ONE
    dense 2x2 conv producing 4*Cout channels followed by a phase interleave.
    The parameter is the same (4, 4, Cin, Cout) 'kernel' as nn.ConvTranspose
    so checkpoints and the torch converter are unaffected.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        cout = self.features
        kernel = self.param(
            "kernel", _KAIMING, (4, 4, cin, cout), jnp.float32
        ).astype(self.dtype)
        # F[ky, kx] with ky = 2*dy + a, kx = 2*dx + b
        f4 = kernel.reshape(2, 2, 2, 2, cin, cout)  # (dy, a, dx, b, ci, co)
        k2 = f4.transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, cin, 4 * cout)

        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H+1, W+1, 4*cout)
        y = y.reshape(b, h + 1, w + 1, 2, 2, cout)
        rows = []
        for a in (0, 1):
            cols = [y[:, a:a + h, bb:bb + w, a, bb] for bb in (0, 1)]
            rows.append(jnp.stack(cols, axis=3))  # (B, H, W, 2, C)
        grid = jnp.stack(rows, axis=2)  # (B, H, 2, W, 2, C)
        return grid.reshape(b, 2 * h, 2 * w, cout)


class DeconvHead(nn.Module):
    """num_layers x (ConvTranspose stride-2 + BN + ReLU) + 1x1 projection to
    num_joints * depth_dim channels. (B, 8, 8, C) -> (B, 64, 64, K*D).

    Reference: modules/integral_base_modules/deconv_head.py:24-58.
    """

    num_joints: int
    depth_dim: int
    num_deconv_layers: int = 3
    num_filters: int = 256
    kernel_size: int = 4
    final_conv_kernel: int = 1
    dtype: Any = jnp.float32
    bn_groups: int = 1
    # fp32_logits: cast the head output to fp32 (reference semantics; the
    # 64^3-way softmax is precision-sensitive). False keeps the compute
    # dtype (bf16): exact softmax math is preserved by fp32 accumulation in
    # the decode (ops/integral*.py); what changes is logit rounding —
    # measured as the difference between writing a 2.4 GB vs 1.2 GB volume
    # to HBM at the flagship shape (plus its backward-pass residual).
    fp32_logits: bool = True
    # phase-decomposed transposed conv (see SubpixelConvTranspose): exact
    # and parameter-compatible, 4x fewer MACs than the dilated lowering —
    # but MEASURED SLOWER in the full step on the v5e bench chip (344.8 vs
    # 313.1 ms at b32): the per-layer phase interleave reshape crosses
    # sublane tiles, the same penalty that rejected the stencil upsample
    # (PERF.md). Kept as an opt-in for future layout-propagation work.
    subpixel: bool = False
    # the round-4 layout-propagation experiment (models/deconv_phase.py):
    # phase layout carried through ALL deconv layers (zero wasted MACs,
    # outer-axis shifts only) with ONE interleave on the feature map at
    # the end. Exact and parameter-compatible; measured on hardware —
    # see PERF.md round 4.
    phase: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, stage: str = "all"):
        """stage: 'all' | 'features' (deconv stack only, returns the
        num_filters-channel map) | 'final' (the 1x1 projection only).

        The split exists for the 'head_decode' rematerialization mode: the
        K*D-channel logits ARE the softmax volume (tens of MB per image),
        so a checkpoint region that starts before this projection keeps
        only the small feature map alive across the backward pass.
        Auto-naming is stable across stages (flax counters are per module
        type, and each stage creates its types in the same order)."""
        if stage in ("all", "features") and self.phase:
            assert self.kernel_size == 4, "phase head requires k4"
            from .deconv_phase import PhaseConvTranspose, phase_interleave

            b, hb, wb, _ = x.shape
            x = x[:, None, None]  # [B, Py=1, Px=1, Hb, Wb, C]
            for i in range(self.num_deconv_layers):
                x = PhaseConvTranspose(
                    self.num_filters, dtype=self.dtype,
                    name=f"ConvTranspose_{i}",
                )(x)
                # BN/ReLU on the phase-folded view: statistics over
                # (B, P, Hb, Wb) == the interleaved layout's (B, H, W)
                py, px = x.shape[1], x.shape[2]
                xf = x.reshape(b * py * px, hb, wb, self.num_filters)
                xf = _BN(self.dtype, groups=self.bn_groups)(xf, train)
                xf = nn.relu(xf)
                x = xf.reshape(b, py, px, hb, wb, self.num_filters)
            x = phase_interleave(x)  # the head's single layout crossing
            if stage == "features":
                return x
        elif stage in ("all", "features"):
            for i in range(self.num_deconv_layers):
                if self.subpixel and self.kernel_size == 4:
                    x = SubpixelConvTranspose(
                        self.num_filters, dtype=self.dtype,
                        name=f"ConvTranspose_{i}",
                    )(x)
                else:
                    x = nn.ConvTranspose(
                        self.num_filters,
                        (self.kernel_size, self.kernel_size),
                        strides=(2, 2),
                        padding="SAME",
                        use_bias=False,
                        dtype=self.dtype,
                        kernel_init=_KAIMING,
                        name=f"ConvTranspose_{i}",
                    )(x)
                x = _BN(self.dtype, groups=self.bn_groups)(x, train)
                x = nn.relu(x)
            if stage == "features":
                return x
        pad = 0 if self.final_conv_kernel == 1 else 1
        x = nn.Conv(
            self.num_joints * self.depth_dim,
            (self.final_conv_kernel, self.final_conv_kernel),
            padding=pad,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=_KAIMING,
        )(x)
        return x.astype(jnp.float32) if self.fp32_logits else x


class ResPoseNet(nn.Module):
    """Backbone + head. Reference: modules/integral_base_modules/network.py:10-19."""

    num_joints: int
    depth_dim: int
    num_layers: int = 50
    dtype: Any = jnp.float32
    fp32_logits: bool = True
    bn_groups: int = 1
    fuse_bn: bool = False
    phase_head: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, stage: str = "all"):
        """stage: 'all' | 'features' (backbone + deconv stack) | 'final'
        (head projection only; `x` is then the feature map)."""
        head = DeconvHead(
            self.num_joints, self.depth_dim, dtype=self.dtype,
            fp32_logits=self.fp32_logits, bn_groups=self.bn_groups,
            phase=self.phase_head, name="head",
        )
        if stage == "final":
            return head(x, train, stage="final")
        x = ResNetBackbone(
            self.num_layers, dtype=self.dtype, bn_groups=self.bn_groups,
            fuse_bn=self.fuse_bn, name="backbone",
        )(x, train)
        return head(x, train, stage="features" if stage == "features" else "all")


class AvgPoolHead(nn.Module):
    """Global-average-pool + FC head (unused by the shipped entry points but
    part of the reference's head menu).
    Reference: modules/integral_base_modules/avg_pool_head.py:3-12."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.out_channels, dtype=self.dtype)(x).astype(
            jnp.float32
        )
