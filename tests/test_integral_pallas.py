"""Pallas integral-decode kernel vs the XLA reference implementation
(interpret mode on CPU; the same code compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from x_as_supervision_tpu.ops import integral as I
from x_as_supervision_tpu.ops.integral_pallas import heatmap_marginals_pallas

RNG = np.random.default_rng(11)


def _logits(b=2, h=8, w=8, k=3, d=8):
    return jnp.asarray(RNG.normal(size=(b, h, w, k * d)).astype(np.float32) * 2)


def test_pallas_marginals_match_xla():
    logits = _logits()
    ax_p, ay_p, az_p = heatmap_marginals_pallas(logits, 3)
    ax, ay, az = I.heatmap_marginals(logits, 3)
    np.testing.assert_allclose(np.asarray(ax_p), np.asarray(ax), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ay_p), np.asarray(ay), atol=1e-6)
    np.testing.assert_allclose(np.asarray(az_p), np.asarray(az), atol=1e-6)


def test_pallas_marginals_gradient_matches_xla():
    logits = _logits()

    def loss_pallas(l):
        ax, ay, az = heatmap_marginals_pallas(l, 3)
        idx = jnp.arange(ax.shape[-1], dtype=jnp.float32)
        return ((ax * idx).sum() + (ay * idx).sum() * 0.5
                + (az * idx**2).sum() * 0.1)

    def loss_xla(l):
        ax, ay, az = I.heatmap_marginals(l, 3)
        idx = jnp.arange(ax.shape[-1], dtype=jnp.float32)
        return ((ax * idx).sum() + (ay * idx).sum() * 0.5
                + (az * idx**2).sum() * 0.1)

    g_p = jax.grad(loss_pallas)(logits)
    g_x = jax.grad(loss_xla)(logits)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-5)


def test_pallas_marginals_bf16_logits():
    """bf16 logits stream through the kernel with f32 accumulation; the
    gradient comes back in bf16."""
    logits = _logits(b=1, h=16, w=8, k=2, d=16).astype(jnp.bfloat16)
    ax_p, ay_p, az_p = heatmap_marginals_pallas(logits, 2)
    ax, ay, az = I.heatmap_marginals(logits.astype(jnp.float32), 2)
    np.testing.assert_allclose(np.asarray(ax_p), np.asarray(ax), atol=2e-3)
    np.testing.assert_allclose(np.asarray(az_p), np.asarray(az), atol=2e-3)

    g = jax.grad(
        lambda l: heatmap_marginals_pallas(l, 2)[2].sum(axis=(1, 2)).prod()
    )(logits)
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(
        lambda l: I.heatmap_marginals(l, 2)[2].sum(axis=(1, 2)).prod()
    )(logits.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(g).astype(np.float32), np.asarray(g_ref), atol=2e-3
    )


def test_decode_multi_with_pallas_backend():
    logits = _logits()
    out_p = I.decode_multi(logits, 3, 2, 3, use_pallas=True)
    out_x = I.decode_multi(logits, 3, 2, 3, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(out_p.kps), np.asarray(out_x.kps), atol=1e-5
    )
