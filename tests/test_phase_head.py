"""Exactness of the phase-layout-propagated deconv head
(models/deconv_phase.py) against the standard XLA ConvTranspose head —
identical parameter tree, identical outputs (fp32), identical gradients.
Reference head semantics: modules/integral_base_modules/deconv_head.py:24-58.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_as_supervision_tpu.models.deconv_phase import (
    phase_deconv_apply, phase_interleave,
)
from x_as_supervision_tpu.models.resnet import DeconvHead


def test_single_layer_matches_conv_transpose():
    """phase_deconv_apply == flax ConvTranspose(k4, s2, SAME) at P=1."""
    import flax.linen as nn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(4, 4, 16, 24)).astype(np.float32))

    ref = nn.ConvTranspose(24, (4, 4), strides=(2, 2), padding="SAME",
                           use_bias=False)
    want = ref.apply({"params": {"kernel": kernel}}, x)

    got = phase_interleave(phase_deconv_apply(x[:, None, None], kernel))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_two_chained_layers_match():
    """Phase layout propagated across two layers (P=1 -> 4 -> 16) with the
    single final interleave equals two interleaved ConvTransposes."""
    import flax.linen as nn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(size=(4, 4, 12, 10)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(4, 4, 10, 6)).astype(np.float32))

    ct = lambda k, feats, v: nn.ConvTranspose(  # noqa: E731
        feats, (4, 4), strides=(2, 2), padding="SAME", use_bias=False
    ).apply({"params": {"kernel": k}}, v)
    want = ct(k2, 6, ct(k1, 10, x))

    ph = phase_deconv_apply(phase_deconv_apply(x[:, None, None], k1), k2)
    np.testing.assert_allclose(phase_interleave(ph), want, atol=2e-4,
                               rtol=1e-5)


@pytest.mark.parametrize("bn_groups", [1, 2])
def test_full_head_exact_and_checkpoint_compatible(bn_groups):
    """DeconvHead(phase=True) == DeconvHead(phase=False) on the SAME
    variables (train mode incl. BN stat updates, and eval mode)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 32)).astype(np.float32))

    std = DeconvHead(num_joints=3, depth_dim=4, num_filters=16,
                     bn_groups=bn_groups)
    ph = DeconvHead(num_joints=3, depth_dim=4, num_filters=16,
                    bn_groups=bn_groups, phase=True)

    variables = std.init(jax.random.PRNGKey(0), x, train=False)
    # identical tree -> checkpoints interchangeable
    v2 = ph.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    for train in (True, False):
        want, w_mut = std.apply(variables, x, train=train,
                                mutable=["batch_stats"])
        got, g_mut = ph.apply(variables, x, train=train,
                              mutable=["batch_stats"])
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(w_mut), jax.tree.leaves(g_mut)):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_full_head_gradients_match():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    std = DeconvHead(num_joints=2, depth_dim=4, num_filters=8)
    ph = DeconvHead(num_joints=2, depth_dim=4, num_filters=8, phase=True)
    variables = std.init(jax.random.PRNGKey(0), x, train=False)

    def loss(mod, params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out * out)

    g_std = jax.grad(lambda p: loss(std, p))(variables["params"])
    g_ph = jax.grad(lambda p: loss(ph, p))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_ph)):
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-4)


def test_detector_with_phase_head_runs():
    """config knob detector_params.phase_head plumbs through the factory
    and produces the same decode as the standard head on shared weights."""
    from x_as_supervision_tpu.models.detector import build_detector

    p = dict(name="resnet_multi", num_kp=4, depth_dim=8, num_hypo=2,
             neighbor_size=3, num_layers=18)
    det_std = build_detector(p)
    det_ph = build_detector(dict(p, phase_head=True))

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = det_std.init(jax.random.PRNGKey(0), img, train=False)
    out_std = det_std.apply(variables, img, train=False)
    out_ph = det_ph.apply(variables, img, train=False)
    np.testing.assert_allclose(out_ph.kps, out_std.kps, atol=1e-4,
                               rtol=1e-4)
