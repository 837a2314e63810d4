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


def _conv_transpose(w):
    """torch ConvTranspose2d (Cin, Cout, kh, kw) -> flax ConvTranspose
    HWIO kernel. Verified numerically: flax ConvTranspose(k4, s2, 'SAME')
    with the spatially flipped kernel reproduces torch
    ConvTranspose2d(k4, s2, p1) exactly (tests/test_tools.py)."""
    k = np.transpose(np.asarray(w), (2, 3, 0, 1))
    return np.ascontiguousarray(k[::-1, ::-1])


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


def convert_head(sd: dict, prefix: str = "head") -> tuple[dict, dict]:
    """Deconv-head weights (reference deconv_head.py: ModuleList of
    [ConvT, BN, ReLU] x num_layers + final Conv) -> flax DeconvHead tree."""
    params: dict = {}
    stats: dict = {}
    i = 0
    layer = 0
    while f"{prefix}.features.{i}.weight" in sd:
        w = sd[f"{prefix}.features.{i}.weight"]
        w = np.asarray(w)
        if f"{prefix}.features.{i + 1}.running_mean" in sd:
            # ConvTranspose + BN block
            params[f"ConvTranspose_{layer}"] = {"kernel": _conv_transpose(w)}
            bnp = f"{prefix}.features.{i + 1}"
            params[f"_BN_{layer}"] = {"BatchNorm_0": {
                "scale": np.asarray(sd[bnp + ".weight"]),
                "bias": np.asarray(sd[bnp + ".bias"]),
            }}
            stats[f"_BN_{layer}"] = {"BatchNorm_0": {
                "mean": np.asarray(sd[bnp + ".running_mean"]),
                "var": np.asarray(sd[bnp + ".running_var"]),
            }}
            layer += 1
            i += 3  # ConvT, BN, ReLU
        else:
            # final Conv (with bias)
            params["Conv_0"] = {"kernel": _conv(w)}
            if f"{prefix}.features.{i}.bias" in sd:
                params["Conv_0"]["bias"] = np.asarray(
                    sd[f"{prefix}.features.{i}.bias"]
                )
            i += 1
    return params, stats


def convert_full_detector(sd: dict, depth: int = 50) -> tuple[dict, dict]:
    """Full detector state dict (keys net.backbone.* / net.head.*, i.e. a
    reference checkpoint after the 'regressor.' prefix strip,
    reference eval.py:310-313) -> flax {net: {backbone, head}} trees."""
    bb_sd = {
        k[len("net.backbone."):]: v for k, v in sd.items()
        if k.startswith("net.backbone.")
    }
    head_sd = {
        k[len("net."):]: v for k, v in sd.items() if k.startswith("net.head.")
    }
    bb_params, bb_stats = convert_state_dict(bb_sd, depth)
    h_params, h_stats = convert_head(head_sd)
    return (
        {"net": {"backbone": bb_params, "head": h_params}},
        {"net": {"backbone": bb_stats, "head": h_stats}},
    )


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
    _flatten_into(flat, params, (), "params")
    _flatten_into(flat, stats, (), "batch_stats")
    np.savez(args.out, **flat)
    print(f"wrote {args.out} with {len(flat)} arrays")


DEFAULT_PRETRAINED_DIR = "data/pretrained"


def resolve_backbone_init(spec: str | None, depth: int) -> str | None:
    """Resolve a backbone-init spec to a ready-to-load npz.

    The reference builds models with ImageNet weights loaded inline by
    default (reference network.py:46-54). Offline equivalent:

      * ``None``: auto-detect ``data/pretrained/resnet<depth>_imagenet.npz``
        (or a ``.pth`` there, auto-converted); returns None when absent —
        fresh init, with no error (the offline default).
      * ``*.npz``: used as-is; missing file is a clear error.
      * ``*.pth`` / ``*.pt`` / ``*.pth.tar``: a torchvision checkpoint —
        converted on the fly and cached as ``<stem>_r<depth>.npz`` beside
        it (re-converted when the .pth is newer than the cache).
    """
    import os

    if spec is None:
        base = os.path.join(
            DEFAULT_PRETRAINED_DIR, f"resnet{depth}_imagenet"
        )
        if os.path.isfile(base + ".npz"):
            return base + ".npz"
        for ext in (".pth", ".pt"):
            if os.path.isfile(base + ext):
                return _convert_pth(base + ext, depth)
        return None
    if spec.endswith(".npz"):
        if not os.path.isfile(spec):
            raise FileNotFoundError(
                f"backbone_init npz not found: {spec} — convert a "
                "torchvision checkpoint with tools/convert_torch_resnet "
                "or pass the .pth directly for auto-conversion"
            )
        return spec
    if spec.endswith((".pth", ".pt", ".pth.tar")):
        if not os.path.isfile(spec):
            raise FileNotFoundError(
                f"backbone_init torch checkpoint not found: {spec}"
            )
        return _convert_pth(spec, depth)
    raise ValueError(
        f"backbone_init must be a .npz or torch .pth/.pt checkpoint, "
        f"got: {spec}"
    )


def _convert_pth(pth_path: str, depth: int) -> str:
    """Convert (and cache) a torchvision ResNet checkpoint to our npz."""
    import os

    stem = pth_path
    for ext in (".pth.tar", ".pth", ".pt"):
        if stem.endswith(ext):
            stem = stem[: -len(ext)]
            break
    out = f"{stem}_r{depth}.npz"
    if os.path.isfile(out) and os.path.getmtime(out) >= os.path.getmtime(
        pth_path
    ):
        return out
    sd = load_torch_checkpoint(pth_path)
    sd.pop("fc.weight", None)
    sd.pop("fc.bias", None)
    params, stats = convert_state_dict(sd, depth)
    flat = {}
    _flatten_into(flat, params, (), "params")
    _flatten_into(flat, stats, (), "batch_stats")
    # atomic publish: concurrent ranks (launch_train.sh local fan-out) must
    # never np.load a half-written cache
    # np.savez appends '.npz' to names missing it — keep the suffix
    tmp = f"{out[:-len('.npz')]}.tmp{os.getpid()}.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, out)
    print(f"auto-converted {pth_path} -> {out} ({len(flat)} arrays)")
    return out


def _flatten_into(flat: dict, tree: dict, prefix: tuple, tag: str) -> None:
    for k, v in tree.items():
        if isinstance(v, dict):
            _flatten_into(flat, v, prefix + (k,), tag)
        else:
            flat[tag + "/" + "/".join(prefix + (k,))] = v


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
