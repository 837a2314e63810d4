"""Fused BN+ReLU+conv3x3+stats kernel vs the XLA chain (interpret mode).

Covers the production candidate shapes (ResNet stage 2/3/4 3x3 convs at
the bench stream size scaled down), odd batch, non-square feature maps,
bf16 inputs, chained two-link usage through make_stats_fold, and edge
correctness (SAME zero padding on all four borders).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_as_supervision_tpu.ops.conv_bn_pallas import (
    fused_bn_relu_conv,
    make_stats_fold,
    xla_bn_relu_conv,
)


def _case(b, h, w, c, co, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
    wt = jnp.asarray(rng.normal(size=(3, 3, c, co)) * 0.05, dtype)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    shift = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
    return x, wt, scale, shift


@pytest.mark.parametrize(
    "b,h,w,c,co",
    [
        (2, 8, 8, 128, 128),    # stage-4-like
        (2, 16, 16, 128, 128),  # stage-3-like (C scaled to fit CPU time)
        (3, 8, 16, 128, 128),   # non-square
        (1, 8, 8, 128, 256),    # widening link
    ],
)
def test_matches_xla_chain(b, h, w, c, co):
    x, wt, scale, shift = _case(b, h, w, c, co)
    y1, s1 = fused_bn_relu_conv(x, wt, scale, shift)
    y0, s0 = xla_bn_relu_conv(x, wt, scale, shift)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-4, atol=1e-2)


def test_bf16_inputs():
    x, wt, scale, shift = _case(2, 8, 8, 128, 128, dtype=jnp.bfloat16)
    y1, s1 = fused_bn_relu_conv(x, wt, scale, shift)
    y0, s0 = xla_bn_relu_conv(x, wt, scale, shift)
    assert y1.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y1, np.float32), np.asarray(y0, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=5e-2, atol=2.0)


def test_border_zero_padding_exact():
    """An all-ones input makes border effects visible: interior pixels sum
    9 taps, corners 4, edges 6 (after BN fold scale=1 shift=0)."""
    c = 128
    x = jnp.ones((1, 8, 8, c), jnp.float32)
    wt = jnp.zeros((3, 3, c, c), jnp.float32)
    # one active tap pair to probe the halo: center tap + top-left tap
    wt = wt.at[1, 1, 0, 0].set(1.0)
    wt = wt.at[0, 0, 0, 0].set(1.0)
    y, _ = fused_bn_relu_conv(x, wt, jnp.ones(c), jnp.zeros(c))
    out = np.asarray(y)[0, :, :, 0]
    assert out[0, 0] == 1.0  # top-left: no top-left neighbor
    assert out[1, 1] == 2.0  # interior: center + top-left neighbor
    assert out[0, 3] == 1.0  # top edge
    assert out[3, 0] == 1.0  # left edge


def test_two_link_chain_matches_reference_bn_semantics():
    """stats -> make_stats_fold -> next link == explicit batch-norm chain."""
    b, h, w, c = 2, 8, 8, 128
    x, w1, scale, shift = _case(b, h, w, c, c, seed=3)
    w2 = jnp.asarray(
        np.random.default_rng(4).normal(size=(3, 3, c, c)) * 0.05,
        jnp.float32,
    )
    gamma = jnp.asarray(np.random.default_rng(5).uniform(0.5, 1.5, c),
                        jnp.float32)
    beta = jnp.asarray(np.random.default_rng(6).normal(size=c) * 0.1,
                       jnp.float32)

    y1, stats1 = fused_bn_relu_conv(x, w1, scale, shift)
    n = b * h * w
    sc2, sh2 = make_stats_fold(stats1, gamma, beta, n)
    y2, _ = fused_bn_relu_conv(y1, w2, sc2, sh2)

    # explicit reference: BN(y1) with batch stats, affine, relu, conv
    y1f = np.asarray(y1, np.float64)
    mean = y1f.mean(axis=(0, 1, 2))
    var = y1f.var(axis=(0, 1, 2))
    xn = (y1f - mean) / np.sqrt(var + 1e-5) * np.asarray(gamma) + np.asarray(
        beta
    )
    xn = np.maximum(xn, 0.0)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xn, jnp.float32), w2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref),
                               rtol=5e-4, atol=5e-3)


def test_fused_link_gradients_match_xla_chain():
    """fused_link (Pallas forward + hand-written XLA backward) must match
    the XLA chain's value AND gradients wrt all four inputs, including
    the stats cotangent path."""
    x, wt, scale, shift = _case(2, 8, 8, 128, 128, seed=3)
    from x_as_supervision_tpu.ops.conv_bn_pallas import fused_link

    rng = np.random.default_rng(7)
    cy = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
    cs = jnp.asarray(rng.normal(size=(2, 128)), jnp.float32)

    def loss(fn, *args):
        y, s = fn(*args)
        return (y.astype(jnp.float32) * cy).sum() + (s * cs).sum()

    got = jax.grad(lambda *a: loss(fused_link, *a), argnums=(0, 1, 2, 3))(
        x, wt, scale, shift
    )
    want = jax.grad(
        lambda *a: loss(xla_bn_relu_conv, *a), argnums=(0, 1, 2, 3)
    )(x, wt, scale, shift)
    for g1, g0, tol in zip(got, want, (1e-3, 1e-2, 1e-2, 1e-3)):
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g0), rtol=1e-4, atol=tol
        )


def test_bottleneck_fuse_bn_equivalent():
    """Bottleneck(fuse_bn=True) == Bottleneck(fuse_bn=False): identical
    variable tree, matching outputs, parameter/input gradients, and
    batch-stats updates, in train and eval."""
    import flax
    from x_as_supervision_tpu.models.resnet import Bottleneck

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 1024)), jnp.float32)
    base = Bottleneck(256, stride=1, downsample=False)
    fused = Bottleneck(256, stride=1, downsample=False, fuse_bn=True)
    variables = base.init(jax.random.PRNGKey(0), x, True)
    vf = fused.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(vf)
    )

    for train in (True, False):
        outs = {}
        for name, mod in (("base", base), ("fused", fused)):
            y, upd = mod.apply(
                variables, x, train, mutable=["batch_stats"]
            )
            outs[name] = (y, upd)
        np.testing.assert_allclose(
            np.asarray(outs["base"][0]), np.asarray(outs["fused"][0]),
            rtol=1e-4, atol=2e-4,
        )
        for (pa, a), (pb, bvals) in zip(
            flax.traverse_util.flatten_dict(outs["base"][1]).items(),
            flax.traverse_util.flatten_dict(outs["fused"][1]).items(),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bvals), rtol=1e-4, atol=1e-4,
                err_msg=str(pa),
            )

    def loss(mod, params, xin):
        y, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xin, True, mutable=["batch_stats"],
        )
        return (y.astype(jnp.float32) ** 2).sum()

    gb = jax.grad(lambda p, xi: loss(base, p, xi), argnums=(0, 1))(
        variables["params"], x
    )
    gf = jax.grad(lambda p, xi: loss(fused, p, xi), argnums=(0, 1))(
        variables["params"], x
    )
    for (pa, a), (pb, bvals) in zip(
        flax.traverse_util.flatten_dict(gb[0]).items(),
        flax.traverse_util.flatten_dict(gf[0]).items(),
    ):
        assert pa == pb
        scale_ref = max(1.0, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bvals),
            rtol=1e-4, atol=2e-4 * scale_ref, err_msg=str(pa),
        )
    np.testing.assert_allclose(
        np.asarray(gb[1]), np.asarray(gf[1]), rtol=1e-4, atol=2e-3
    )


def test_fused_link_bf16_gradients_finite():
    """bf16 inputs through fused_link's backward (the flagship compute
    dtype): shapes/dtypes line up and gradients stay finite and close to
    the fp32 chain's."""
    from x_as_supervision_tpu.ops.conv_bn_pallas import fused_link

    x, wt, scale, shift = _case(2, 8, 8, 128, 128, seed=5,
                                dtype=jnp.bfloat16)

    def loss(fn, *args):
        y, s = fn(*args)
        return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 1e-3

    got = jax.grad(lambda *a: loss(fused_link, *a), argnums=(0, 1, 2, 3))(
        x, wt, scale, shift
    )
    want = jax.grad(
        lambda *a: loss(xla_bn_relu_conv, *a), argnums=(0, 1, 2, 3)
    )(
        x.astype(jnp.float32), wt.astype(jnp.float32), scale, shift
    )
    assert got[0].dtype == jnp.bfloat16 and got[1].dtype == jnp.bfloat16
    for g1, g0 in zip(got, want):
        g1 = np.asarray(g1, np.float32)
        g0 = np.asarray(g0, np.float32)
        assert np.all(np.isfinite(g1))
        denom = max(1.0, float(np.abs(g0).max()))
        # the backward's elementwise passes run in the compute dtype
        # (bf16 here, like the unfused path's BN/ReLU backward), so the
        # bound is bf16 rounding noise, not fp32 agreement
        assert float(np.abs(g1 - g0).max()) / denom < 0.12


def test_factory_gates_fuse_bn_off_mesh():
    """detector_params.fuse_bn must not survive build_detector on a
    non-TPU / multi-device backend (same gate as the decode kernels):
    the pallas_call has no GSPMD partitioning rule."""
    from x_as_supervision_tpu.models.detector import build_detector

    det = build_detector(
        {"name": "resnet_multi", "num_kp": 4, "depth_dim": 8,
         "num_hypo": 2, "neighbor_size": 3, "num_layers": 50,
         "fuse_bn": True}
    )
    assert det.fuse_bn is False  # CPU test backend -> gated off
