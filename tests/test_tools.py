import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from x_as_supervision_tpu.tools import smpl_pkl_to_npz as PK
from x_as_supervision_tpu.tools import surreal_constructor as SC
from x_as_supervision_tpu.tools import convert_torch_resnet as TR
from x_as_supervision_tpu.models import smpl as smpl_mod
from x_as_supervision_tpu.models.detector import KPDetector3DMulti


class FakeCh:
    """Stands in for chumpy.Ch in a pickle stream."""

    def __init__(self, arr):
        self.x = np.asarray(arr)

    def __reduce__(self):
        return (_make_fake, (self.x,))


def _make_fake(arr):
    f = FakeCh.__new__(FakeCh)
    f.__setstate__({"x": arr})
    return f


def test_smpl_pkl_converter_roundtrip(tmp_path, monkeypatch):
    # Build a fake SMPL pickle whose "chumpy" entries come from a module
    # named 'chumpy_fake' that the stub unpickler maps away.
    rng = np.random.default_rng(0)
    v = rng.normal(size=(32, 3))
    data = {
        "v_template": v,
        "shapedirs": rng.normal(size=(32, 3, 10)),
        "posedirs": rng.normal(size=(32, 3, 207)),
        "J_regressor": rng.uniform(0, 1, (24, 32)),
        "weights": rng.uniform(0, 1, (32, 24)),
        "kintree_table": np.stack(
            [np.arange(24), np.arange(24)], axis=0
        ),
        "f": np.zeros((4, 3), np.int64),
    }
    pkl = tmp_path / "fake_smpl.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(data, f)
    out = tmp_path / "smpl.npz"
    res = PK.convert(str(pkl), str(out))
    assert res["v_template"].shape == (32, 3)
    model = smpl_mod.load_smpl_npz(str(out))
    assert model.weights.shape == (32, 24)


def test_surreal_intrinsic_and_rotate_body():
    k = SC.get_intrinsic(320, 240)
    # fx = 60 * 320 / 32 = 600; fy = 60 * 240 / 24 = 600
    np.testing.assert_allclose(k[0, 0], 600.0)
    np.testing.assert_allclose(k[1, 1], 600.0)
    np.testing.assert_allclose(k[0, 2], 160.0)

    # rotate_body == axangle(R90 @ Rz @ Rpelvis)
    rng = np.random.default_rng(1)
    pelvis = rng.normal(size=3)
    zrot = 0.7
    rz = Rotation.from_euler("z", zrot).as_matrix()
    got = SC.rotate_body(rz, pelvis)
    want_mat = (
        Rotation.from_euler("x", np.pi / 2).as_matrix()
        @ rz
        @ Rotation.from_rotvec(pelvis).as_matrix()
    )
    np.testing.assert_allclose(
        Rotation.from_rotvec(got).as_matrix(), want_mat, atol=1e-6
    )


def test_surreal_extrinsic_maps_camera_location_to_origin_depth():
    cam_loc = np.array([8.0, -1.0, 0.0])
    rt, r, t = SC.get_extrinsic(cam_loc)
    cam_pt = r @ cam_loc.reshape(3, 1) + t
    np.testing.assert_allclose(cam_pt, 0.0, atol=1e-10)


def _fake_resnet18_sd(rng):
    sd = {}
    sd["conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    for tag, c in [("bn1", 64)]:
        sd[f"{tag}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{tag}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{tag}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{tag}.running_var"] = rng.uniform(0.5, 2, (c,)).astype(np.float32)
    chans = [64, 128, 256, 512]
    in_c = 64
    for stage, c in enumerate(chans):
        for i in range(2):
            t = f"layer{stage + 1}.{i}"
            c_in = in_c if i == 0 else c
            sd[f"{t}.conv1.weight"] = rng.normal(size=(c, c_in, 3, 3)).astype(np.float32)
            sd[f"{t}.conv2.weight"] = rng.normal(size=(c, c, 3, 3)).astype(np.float32)
            for b in ("bn1", "bn2"):
                sd[f"{t}.{b}.weight"] = rng.normal(size=(c,)).astype(np.float32)
                sd[f"{t}.{b}.bias"] = rng.normal(size=(c,)).astype(np.float32)
                sd[f"{t}.{b}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
                sd[f"{t}.{b}.running_var"] = rng.uniform(0.5, 2, (c,)).astype(np.float32)
            if i == 0 and (stage > 0):
                sd[f"{t}.downsample.0.weight"] = rng.normal(
                    size=(c, in_c, 1, 1)
                ).astype(np.float32)
                for key, val in [
                    ("weight", rng.normal(size=(c,))),
                    ("bias", rng.normal(size=(c,))),
                    ("running_mean", rng.normal(size=(c,))),
                    ("running_var", rng.uniform(0.5, 2, (c,))),
                ]:
                    sd[f"{t}.downsample.1.{key}"] = val.astype(np.float32)
        in_c = c
    return sd


def test_torch_resnet_conversion_grafts_into_flax_tree():
    rng = np.random.default_rng(2)
    sd = _fake_resnet18_sd(rng)
    params, stats = TR.convert_state_dict(sd, 18)

    det = KPDetector3DMulti(num_kp=4, depth_dim=8, num_hypo=2,
                            neighbor_size=3, num_layers=18)
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)

    # every converted param path must exist in the flax tree with the same
    # shape (under net/backbone)
    backbone = variables["params"]["net"]["backbone"]

    def walk(conv, flax, path=()):
        for k, v in conv.items():
            assert k in flax, (path, k, list(flax.keys()))
            if isinstance(v, dict):
                walk(v, flax[k], path + (k,))
            else:
                assert v.shape == flax[k].shape, (path + (k,), v.shape,
                                                  flax[k].shape)

    walk(params, backbone)
    walk(stats, variables["batch_stats"]["net"]["backbone"])


def test_backbone_graft_replaces_values():
    rng = np.random.default_rng(7)
    sd = _fake_resnet18_sd(rng)
    det = KPDetector3DMulti(num_kp=4, depth_dim=8, num_hypo=2,
                            neighbor_size=3, num_layers=18)
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)

    import tempfile, os, subprocess, sys
    from x_as_supervision_tpu.tools.convert_torch_resnet import (
        convert_state_dict, load_npz_into_variables,
    )

    params, stats = convert_state_dict(sd, 18)
    with tempfile.TemporaryDirectory() as d:
        flat = {}

        def flatten(tree, prefix, tag):
            for k, v in tree.items():
                if isinstance(v, dict):
                    flatten(v, prefix + (k,), tag)
                else:
                    flat[tag + "/" + "/".join(prefix + (k,))] = v

        flatten(params, (), "params")
        flatten(stats, (), "batch_stats")
        path = os.path.join(d, "bb.npz")
        np.savez(path, **flat)

        out = load_npz_into_variables(path, variables)

    stem = np.asarray(out["params"]["net"]["backbone"]["Conv_0"]["kernel"])
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(stem, want, atol=1e-6)
    bn_mean = np.asarray(
        out["batch_stats"]["net"]["backbone"]["_BN_0"]["BatchNorm_0"]["mean"]
    )
    np.testing.assert_allclose(bn_mean, sd["bn1.running_mean"], atol=1e-6)
    # head params untouched
    head_before = jax.tree.leaves(variables["params"]["net"]["head"])
    head_after = jax.tree.leaves(out["params"]["net"]["head"])
    for a, b in zip(head_before, head_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv_transpose_weight_equivalence():
    """flax ConvTranspose(k4, s2, SAME) with flipped-HWIO weights ==
    torch ConvTranspose2d(k4, s2, p1)."""
    import torch
    import flax.linen as nn

    rng = np.random.default_rng(0)
    cin, cout, s = 5, 7, 8
    x = rng.normal(size=(2, s, s, cin)).astype(np.float32)
    w_t = rng.normal(size=(cin, cout, 4, 4)).astype(np.float32)

    t_out = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(w_t), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(cout, (4, 4), strides=(2, 2),
                                    padding="SAME", use_bias=False)(x)

    from x_as_supervision_tpu.tools.convert_torch_resnet import _conv_transpose

    m = M()
    out = m.apply(
        {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(_conv_transpose(w_t))}}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-4)


def test_full_detector_conversion_tree_matches():
    rng = np.random.default_rng(3)
    sd = {f"net.backbone.{k}": v for k, v in _fake_resnet18_sd(rng).items()}
    # head: 3 x (ConvT + BN) + final conv, shapes for num_kp=4, depth=8
    cin = 512
    for i, idx in enumerate((0, 3, 6)):
        c_in = cin if i == 0 else 256
        sd[f"net.head.features.{idx}.weight"] = rng.normal(
            size=(c_in, 256, 4, 4)).astype(np.float32)
        for key, val in (("weight", rng.normal(size=(256,))),
                         ("bias", rng.normal(size=(256,))),
                         ("running_mean", rng.normal(size=(256,))),
                         ("running_var", rng.uniform(0.5, 2, (256,)))):
            sd[f"net.head.features.{idx + 1}.{key}"] = val.astype(np.float32)
    sd["net.head.features.9.weight"] = rng.normal(
        size=(32, 256, 1, 1)).astype(np.float32)
    sd["net.head.features.9.bias"] = rng.normal(size=(32,)).astype(np.float32)

    from x_as_supervision_tpu.tools.convert_torch_resnet import (
        convert_full_detector,
    )

    params, stats = convert_full_detector(sd, depth=18)
    det = KPDetector3DMulti(num_kp=4, depth_dim=8, num_hypo=2,
                            neighbor_size=3, num_layers=18)
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)

    def walk(conv, flax, path=()):
        for k, v in conv.items():
            assert k in flax, (path, k, sorted(flax.keys()))
            if isinstance(v, dict):
                walk(v, flax[k], path + (k,))
            else:
                assert v.shape == flax[k].shape, (path + (k,), v.shape,
                                                  flax[k].shape)

    walk(params, variables["params"])
    walk(stats, variables["batch_stats"])
