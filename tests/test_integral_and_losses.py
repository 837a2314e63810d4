import numpy as np
import jax
import jax.numpy as jnp

from x_as_supervision_tpu.ops import integral as I
from x_as_supervision_tpu.ops import losses as L
import oracles

RNG = np.random.default_rng(7)


def test_decode_multi_matches_naive():
    b, hgt, wid, k, d = 2, 8, 8, 3, 8
    num_hypo, neighbor = 2, 3
    logits = RNG.normal(size=(b, hgt, wid, k * d)).astype(np.float32) * 3
    got = I.decode_multi(jnp.asarray(logits), k, num_hypo, neighbor)
    want = oracles.integral_decode_multi_naive(logits, k, num_hypo, neighbor)
    np.testing.assert_allclose(np.asarray(got.kps), want, rtol=1e-3, atol=1e-4)
    assert got.depth_prob_map.shape == (k, d)


def test_decode_single_expectation():
    b, s, k, d = 1, 6, 2, 6
    logits = np.full((b, s, s, k * d), -1e9, dtype=np.float32)
    # put all mass on one voxel per joint
    vol = logits.reshape(b, s, s, k, d)
    vol[0, 2, 3, 0, 4] = 0.0  # joint 0: y=2 (row), x=3 (col), z=4
    vol[0, 5, 1, 1, 0] = 0.0
    out = I.decode_single(jnp.asarray(logits), k)
    kps = np.asarray(out.kps)[0, 0]
    np.testing.assert_allclose(kps[0], [3 / s * 2 - 1, 2 / s * 2 - 1, 4 / d * 2 - 1], atol=1e-5)
    np.testing.assert_allclose(kps[1], [1 / s * 2 - 1, 5 / s * 2 - 1, 0 / d * 2 - 1], atol=1e-5)


def test_find_peaks_ranks_by_mass():
    m = np.zeros((1, 1, 10), dtype=np.float32)
    m[0, 0, 2] = 0.5
    m[0, 0, 6] = 0.3
    m[0, 0, 4] = 0.1
    idx = np.asarray(I.find_peaks(jnp.asarray(m), 3))
    assert idx[0, 0, 0] == 2
    assert idx[0, 0, 1] == 6
    assert idx[0, 0, 2] == 4


def test_mask_reconstruction_loss_modes():
    mask = jnp.asarray(RNG.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32))
    gt = jnp.asarray(RNG.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32))
    w = jnp.ones_like(mask) * 2.0
    plain = float(L.compute_mask_reconstruction_loss(mask, gt))
    np.testing.assert_allclose(plain, np.mean((np.asarray(mask) - np.asarray(gt)) ** 2), rtol=1e-6)
    weighted = float(L.compute_mask_reconstruction_loss(mask, gt, weight=w))
    np.testing.assert_allclose(weighted, plain * 2.0, rtol=1e-6)
    # use_clip with weight=None: the reference reduces the MSE to a scalar
    # FIRST, so after the trainer's final mean the loss is
    # mean((m-g)^2) * mean(m > 0.1) (reference loss_func.py:4-16 +
    # train.py:182), NOT a masked MSE.
    clipped = float(L.compute_mask_reconstruction_loss(mask, gt, use_clip=True))
    m, g = np.asarray(mask), np.asarray(gt)
    np.testing.assert_allclose(
        clipped, np.mean((m - g) ** 2) * np.mean(m > 0.1), rtol=1e-6
    )
    # use_clip with a weight map: elementwise filter applies before the mean.
    clipped_w = float(
        L.compute_mask_reconstruction_loss(mask, gt, weight=w, use_clip=True)
    )
    np.testing.assert_allclose(
        clipped_w, np.mean(((m - g) ** 2) * (m > 0.1) * 2.0), rtol=1e-6
    )
    # gradient of the weightless use_clip branch: plain-MSE gradient scaled
    # by the active-pixel fraction (the filter is non-differentiable).
    grad = jax.grad(
        lambda mm: L.compute_mask_reconstruction_loss(mm, gt, use_clip=True)
    )(mask)
    expected = 2.0 * (m - g) / m.size * np.mean(m > 0.1)
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-5, atol=1e-8)


def test_bone_sym_loss_zero_for_equal_bone_lengths():
    # the loss pairs consecutive bones (wrist-elbow vs elbow-shoulder etc.,
    # reference loss_func.py:18-25); equal-length bones must zero it.
    kps = np.zeros((1, 18, 3), dtype=np.float32)
    for c, p in [(15, 14), (16, 15), (12, 11), (13, 12), (2, 1), (3, 2), (5, 4), (6, 5)]:
        v = RNG.normal(size=3)
        v = v / np.linalg.norm(v) * 250.0  # same length, arbitrary direction
        kps[0, c] = kps[0, p] + v
    assert float(L.compute_bone_sym_loss(jnp.asarray(kps))) < 1e-10


def test_bone_sym_loss_nonzero_for_unequal_pairs():
    kps = np.zeros((1, 18, 3), dtype=np.float32)
    kps[0, 16] = kps[0, 15] + [100.0, 0, 0]
    kps[0, 15] = kps[0, 14] + [300.0, 0, 0]
    assert float(L.compute_bone_sym_loss(jnp.asarray(kps))) > 1e-4


def test_disc_loss_min_over_hypotheses():
    pred = jnp.asarray(np.array([[[0.2], [0.9]]], dtype=np.float32))  # (1,2,1)
    gen = float(L.compute_disc_loss(pred, None))
    np.testing.assert_allclose(gen, min((0.2 - 1) ** 2, (0.9 - 1) ** 2), rtol=1e-6)
    gt = jnp.asarray(np.array([[0.8]], dtype=np.float32))
    disc = float(L.compute_disc_loss(pred, gt))
    np.testing.assert_allclose(
        disc, 0.5 * (0.8 - 1) ** 2 + 0.5 * min(0.2**2, 0.9**2), rtol=1e-6
    )


def test_generate_joint_location_label():
    joints = jnp.asarray(np.array([[[64.0, 128.0, 32.0]]], dtype=np.float32))
    out = np.asarray(L.generate_joint_location_label(256.0, 256.0, joints))
    np.testing.assert_allclose(out[0], [64 / 256 - 0.5, 128 / 256 - 0.5, 32 / 256], rtol=1e-6)
