"""Offline torchvision-ResNet -> flax params converter.

The reference initializes its backbone from the torchvision model zoo at
construction time (reference: modules/integral_base_modules/network.py:46-54).
This environment has no network egress, so ImageNet initialization becomes
an offline step: download a torchvision checkpoint elsewhere, then convert
it here into the flax parameter tree our ResNetBackbone uses.

Layout conversions: conv OIHW -> HWIO; BN (weight, bias, running_mean,
running_var) -> (scale, bias) params + (mean, var) batch_stats.

Usage:
  python -m x_as_supervision_tpu.tools.convert_torch_resnet \
      --torch_ckpt resnet50.pth --depth 50 --out resnet50_imagenet.npz
Then point train.py at it with --backbone_init (or place it at
data/pretrained/resnet<depth>_imagenet.npz).
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

from ..models.resnet import RESNET_SPEC


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_state_dict(sd: dict, depth: int):
    """torchvision state_dict -> (params, batch_stats) nested dicts matching
    ResNetBackbone's module naming (models/resnet.py)."""
    block_kind, counts, _ = RESNET_SPEC[depth]
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    def bn(prefix, path_mod):
        put(params, path_mod + ("BatchNorm_0", "scale"),
            np.asarray(sd[prefix + ".weight"]))
        put(params, path_mod + ("BatchNorm_0", "bias"),
            np.asarray(sd[prefix + ".bias"]))
        put(stats, path_mod + ("BatchNorm_0", "mean"),
            np.asarray(sd[prefix + ".running_mean"]))
        put(stats, path_mod + ("BatchNorm_0", "var"),
            np.asarray(sd[prefix + ".running_var"]))

    # stem
    put(params, ("Conv_0", "kernel"), _conv(sd["conv1.weight"]))
    bn("bn1", ("_BN_0",))

    # stages: flax auto-names blocks Bottleneck_0..N / BasicBlock_0..N in
    # declaration order across the whole backbone
    block_name = "BasicBlock" if block_kind == "basic" else "Bottleneck"
    flax_block = 0
    for stage, blocks in enumerate(counts):
        for i in range(blocks):
            t = f"layer{stage + 1}.{i}"
            mod = (f"{block_name}_{flax_block}",)
            n_convs = 2 if block_kind == "basic" else 3
            for c in range(n_convs):
                put(params, mod + (f"Conv_{c}", "kernel"),
                    _conv(sd[f"{t}.conv{c + 1}.weight"]))
                bn(f"{t}.bn{c + 1}", mod + (f"_BN_{c}",))
            if f"{t}.downsample.0.weight" in sd:
                put(params, mod + (f"Conv_{n_convs}", "kernel"),
                    _conv(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", mod + (f"_BN_{n_convs}",))
            flax_block += 1
    return params, stats


def load_torch_checkpoint(path: str) -> dict:
    try:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    except ImportError:
        with open(path, "rb") as f:
            return pickle.load(f)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    sd = load_torch_checkpoint(args.torch_ckpt)
    sd.pop("fc.weight", None)
    sd.pop("fc.bias", None)
    params, stats = convert_state_dict(sd, args.depth)

    flat = {}

    def flatten(tree, prefix, tag):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten(v, prefix + (k,), tag)
            else:
                flat[tag + "/" + "/".join(prefix + (k,))] = v

    flatten(params, (), "params")
    flatten(stats, (), "batch_stats")
    np.savez(args.out, **flat)
    print(f"wrote {args.out} with {len(flat)} arrays")


def load_npz_into_variables(npz_path: str, det_vars: dict) -> dict:
    """Graft a converted ImageNet backbone into detector variables
    (params + batch_stats under net/backbone/...)."""
    data = np.load(npz_path)
    out = {
        "params": _graft(det_vars["params"], data, "params"),
        "batch_stats": _graft(
            det_vars.get("batch_stats", {}), data, "batch_stats"
        ),
    }
    return out


def _graft(tree, data, tag):
    import jax

    flat = dict(data)

    def visit(node, path):
        if isinstance(node, dict):
            return {k: visit(v, path + (k,)) for k, v in node.items()}
        # backbone params live under net/backbone/<converted path>
        if len(path) >= 2 and path[0] == "net" and path[1] == "backbone":
            key = tag + "/" + "/".join(path[2:])
            if key in flat:
                src = flat[key]
                assert src.shape == node.shape, (path, src.shape, node.shape)
                return jax.numpy.asarray(src, node.dtype)
        return node

    return visit(tree, ())
