import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from x_as_supervision_tpu.models import smpl as S
from x_as_supervision_tpu.models.detector import KPDetector3DMulti, KPDetector3D
from x_as_supervision_tpu.models.discriminator import (
    GCNDiscriminator,
    GCNDiscriminatorDecouple,
    GCNSAGEDiscriminator,
)
from x_as_supervision_tpu.models.physique import PhysiqueMaskGenerator

RNG = np.random.default_rng(3)

# cal_links(extension=False) edges for the 18-joint H36M skeleton
PARENTS18 = [0, 0, 1, 2, 0, 4, 5, 0, 17, 8, 9, 17, 11, 12, 17, 14, 15, 7]
EDGE_PARENTS = PARENTS18[1:]
EDGE_CHILDREN = list(range(1, 18))


def test_rodrigues_matches_scipy():
    v = RNG.normal(size=(5, 3)) * 1.5
    got = np.asarray(S.batch_rodrigues(jnp.asarray(v)))
    want = Rotation.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_smpl_zero_pose_is_rest_shape():
    model = S.random_smpl_model(jax.random.PRNGKey(0))
    b = 2
    pose = jnp.zeros((b, 72))
    betas = jnp.zeros((b, 10))
    verts, joints = S.smpl_forward(model, pose, betas)
    rest = np.asarray(model.v_template)[None].repeat(b, 0)
    rest_joints = np.asarray(model.j_regressor) @ np.asarray(model.v_template)
    center = rest_joints[0]
    np.testing.assert_allclose(np.asarray(verts), rest - center, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(joints), rest_joints[None].repeat(b, 0) - center, atol=1e-4
    )


def test_smpl_global_rotation_rotates_joints():
    model = S.random_smpl_model(jax.random.PRNGKey(1))
    rotvec = np.array([0.3, -0.2, 0.5])
    pose = np.zeros((1, 72), np.float32)
    pose[0, :3] = rotvec
    _, joints = S.smpl_forward(model, jnp.asarray(pose), jnp.zeros((1, 10)))
    _, joints0 = S.smpl_forward(model, jnp.zeros((1, 72)), jnp.zeros((1, 10)))
    r = Rotation.from_rotvec(rotvec).as_matrix()
    want = (r @ np.asarray(joints0)[0].T).T
    np.testing.assert_allclose(np.asarray(joints)[0], want, atol=1e-4)


def test_multi_detector_shapes_tiny():
    det = KPDetector3DMulti(num_kp=4, depth_dim=8, num_hypo=2, neighbor_size=3, num_layers=18)
    img = jnp.zeros((2, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), img, train=False)
    out, _ = det.apply(variables, img, train=False, mutable=["batch_stats"])
    assert out.kps.shape == (2, 2, 4, 3)
    assert out.depth_prob_map.shape == (4, 8)
    assert np.all(np.abs(np.asarray(out.kps)) <= 1.0 + 1e-5)


def test_single_detector_shapes_tiny():
    det = KPDetector3D(num_kp=4, depth_dim=8, num_layers=18)
    img = jnp.zeros((2, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), img, train=False)
    out, _ = det.apply(variables, img, train=False, mutable=["batch_stats"])
    assert out.kps.shape == (2, 1, 4, 3)


def _disc_kps(b=4):
    return jnp.asarray(RNG.normal(size=(b, 18, 3)).astype(np.float32))


def test_discriminator_variants_forward_and_grad():
    kps = _disc_kps()
    for cls, kw in [
        (GCNDiscriminatorDecouple, dict(use_pe=True)),
        (GCNSAGEDiscriminator, dict(use_pe=False)),
        (GCNDiscriminator, dict(variant="res_gcn")),
        (GCNDiscriminator, dict(variant="simple_gcn")),
    ]:
        disc = cls(parent_ids=tuple(EDGE_PARENTS), child_ids=tuple(EDGE_CHILDREN), **kw)
        variables = disc.init(jax.random.PRNGKey(0), kps, train=False)
        logits = disc.apply(variables, kps, train=False)
        assert logits.shape == (4, 1)

        def loss_fn(params):
            out = disc.apply({"params": params}, kps, train=False)
            return (out**2).mean()

        grads = jax.grad(loss_fn)(variables["params"])
        total = sum(
            float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)
        )
        assert np.isfinite(total) and total > 0


def test_physique_preserves_spatial_shape():
    net = PhysiqueMaskGenerator(num_features=(8, 16))
    x = jnp.zeros((2, 32, 32, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = net.apply(variables, x, train=False, mutable=["batch_stats"])
    assert y.shape == (2, 32, 32, 1)
    assert np.all(np.asarray(y) >= 0) and np.all(np.asarray(y) <= 1)


def test_exact_conv_rewrites_match_reference_modules():
    """SpaceToDepthStem == Conv(7x7, s2, p3); SubpixelConvTranspose ==
    ConvTranspose(4x4, s2, 'SAME') — exact, weight-compatible rewrites
    (both ship off by default; see PERF.md round-2 measurements)."""
    import flax.linen as nn
    import numpy as np

    from x_as_supervision_tpu.models.resnet import (
        SpaceToDepthStem,
        SubpixelConvTranspose,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    conv = nn.Conv(16, (7, 7), strides=(2, 2), padding=3, use_bias=False)
    cv = conv.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(SpaceToDepthStem(16).apply(
            {"params": {"kernel": cv["params"]["kernel"]}}, x)),
        np.asarray(conv.apply(cv, x)), atol=2e-5,
    )

    y = jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    ct = nn.ConvTranspose(10, (4, 4), strides=(2, 2), padding="SAME",
                          use_bias=False)
    tv = ct.init(jax.random.PRNGKey(1), y)
    np.testing.assert_allclose(
        np.asarray(SubpixelConvTranspose(10).apply(
            {"params": {"kernel": tv["params"]["kernel"]}}, y)),
        np.asarray(ct.apply(tv, y)), atol=2e-5,
    )


def test_avg_pool_head_shapes_and_grad():
    """Global-avg-pool + FC head (reference avg_pool_head.py:3-12):
    pooling over the spatial axes, Dense to out_channels, fp32 output
    regardless of compute dtype, and nonzero gradients."""
    from x_as_supervision_tpu.models.resnet import AvgPoolHead

    head = AvgPoolHead(out_channels=54, dtype=jnp.bfloat16)
    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 32)), jnp.bfloat16)
    variables = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(variables, x)
    assert out.shape == (2, 54) and out.dtype == jnp.float32

    # pooling semantics: a spatially-constant input equals a 1x1 input
    const = jnp.broadcast_to(x[:, :1, :1], x.shape)
    np.testing.assert_allclose(
        np.asarray(head.apply(variables, const)),
        np.asarray(head.apply(variables, const[:, :1, :1])),
        rtol=1e-3,
    )

    g = jax.grad(
        lambda v: jnp.sum(head.apply(v, x) ** 2)
    )(variables)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
