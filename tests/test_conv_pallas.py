"""Pallas small-channel conv kernel vs lax.conv_general_dilated
(interpret mode on CPU; the same code compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from x_as_supervision_tpu.ops.conv_pallas import conv3x3_nhcw

RNG = np.random.default_rng(7)


def _xla(x, w, b, stride):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHCW", "HWIO", "NHCW"),
    )
    if b is not None:
        y = y + b[None, None, :, None]
    return y


def _case(b=2, cin=3, cout=5, s=8, stride=1, bias=True):
    x = jnp.asarray(RNG.normal(size=(b, s, cin, s)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(3, 3, cin, cout)).astype(np.float32))
    bb = (
        jnp.asarray(RNG.normal(size=(cout,)).astype(np.float32))
        if bias else None
    )
    return x, w, bb, stride


def test_conv_s1_matches_xla():
    x, w, b, _ = _case()
    np.testing.assert_allclose(
        np.asarray(conv3x3_nhcw(x, w, b, 1)), np.asarray(_xla(x, w, b, 1)),
        atol=1e-4,
    )


def test_conv_s1_single_channel_edges():
    x, w, b, _ = _case(b=1, cin=1, cout=4, s=16)
    np.testing.assert_allclose(
        np.asarray(conv3x3_nhcw(x, w, b, 1)), np.asarray(_xla(x, w, b, 1)),
        atol=1e-4,
    )


def test_conv_s2_matches_xla():
    x, w, b, _ = _case(b=2, cin=4, cout=6, s=16, stride=2)
    np.testing.assert_allclose(
        np.asarray(conv3x3_nhcw(x, w, b, 2)), np.asarray(_xla(x, w, b, 2)),
        atol=1e-4,
    )


def test_conv_gradients_match_xla():
    x, w, b, _ = _case(b=1, cin=2, cout=3, s=8)

    def loss_p(x, w, b):
        y = conv3x3_nhcw(x, w, b, 1)
        return (y * jnp.cos(y * 0.1)).sum()

    def loss_x(x, w, b):
        y = _xla(x, w, b, 1)
        return (y * jnp.cos(y * 0.1)).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_conv_s2_gradients_match_xla():
    x, w, b, _ = _case(b=1, cin=2, cout=3, s=8, stride=2)
    gp = jax.grad(lambda *a: conv3x3_nhcw(*a, 2).sum(), argnums=(0, 1, 2))(
        x, w, b
    )
    gx = jax.grad(lambda *a: _xla(*a, 2).sum(), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_conv_bf16_roundtrip():
    x, w, b, _ = _case(b=1, cin=2, cout=3, s=8)
    y = conv3x3_nhcw(x.astype(jnp.bfloat16), w, b, 1)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y).astype(np.float32), np.asarray(_xla(x, w, b, 1)),
        atol=0.15,
    )
