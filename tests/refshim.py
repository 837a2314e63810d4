"""Loader for the reference torch implementation at /root/reference.

The parity tests (test_reference_parity*.py) feed identical inputs through
the reference's torch modules and this repo's JAX rebuild and assert value
(and where relevant gradient) agreement. The reference is imported
READ-ONLY; nothing from it is executed outside the test process.

Third-party packages the reference imports but this environment lacks are
stubbed here with minimal implementations of exactly the APIs the reference
touches:

  * easydict.EasyDict  — attribute-style dict.
  * skfmm              — never called by the code paths under test; the stub
                         raises if used.
  * torchvision        — BasicBlock / Bottleneck (the standard public ResNet
                         block architecture, written from its well-known
                         definition) and models.resnet{N}() builders. The
                         model-zoo builders return a freshly constructed
                         (randomly initialized) backbone: the reference only
                         uses them as a state-dict source for ImageNet init
                         (reference network.py:46-54), and parity tests care
                         about architecture, not the pretrained values.
  * torch_geometric    — GCNConv / SAGEConv / norm.LayerNorm implementing
                         the library's documented message-passing semantics
                         (sym-normalized weighted adjacency with optional
                         appended self loops; mean-aggregated SAGE with
                         lin_l(aggr)+lin_r(root); graph-mode LayerNorm over
                         the whole tensor when no batch vector is given).

Stubs are only installed for modules that genuinely fail to import, so a
future environment with the real packages wins automatically.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from types import SimpleNamespace

REF = "/root/reference"


def _easydict_module():
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            if d:
                for k, v in d.items():
                    self[k] = v
            for k, v in kwargs.items():
                self[k] = v

        def __setattr__(self, name, value):
            self[name] = value

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:
                raise AttributeError(name) from e

    mod.EasyDict = EasyDict
    return mod


def _skfmm_module():
    mod = types.ModuleType("skfmm")

    def distance(*a, **k):  # pragma: no cover - guard
        raise RuntimeError("skfmm stub: geodesic paths are not under test")

    mod.distance = distance
    return mod


def _torchvision_module():
    import torch.nn as nn

    def conv3x3(inp, out, stride=1):
        return nn.Conv2d(inp, out, 3, stride=stride, padding=1, bias=False)

    def conv1x1(inp, out, stride=1):
        return nn.Conv2d(inp, out, 1, stride=stride, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv1x1(inplanes, planes)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = conv3x3(planes, planes, stride)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = conv1x1(planes, planes * self.expansion)
            self.bn3 = nn.BatchNorm2d(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    resnet = types.ModuleType("torchvision.models.resnet")
    resnet.BasicBlock = BasicBlock
    resnet.Bottleneck = Bottleneck

    def _zoo_builder(depth):
        def build(weights=None, **kwargs):
            # Lazy import: modules.* is only importable once REF is on
            # sys.path, and itself imports this shim's block classes.
            from modules.integral_base_modules.resnet import (
                ResNetBackbone,
                resnet_spec,
            )

            block, layers, _, _ = resnet_spec[depth]
            return ResNetBackbone(block, layers, 3)

        return build

    for depth in (18, 34, 50, 101, 152):
        setattr(models, f"resnet{depth}", _zoo_builder(depth))
    models.resnet = resnet
    tv.models = models
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet
    return tv


def _torch_geometric_module():
    import torch
    import torch.nn as nn

    def scatter_sum(src, index, dim_size):
        out = torch.zeros(dim_size, *src.shape[1:], dtype=src.dtype)
        return out.index_add_(0, index, src)

    class GCNConv(nn.Module):
        def __init__(self, in_channels, out_channels, add_self_loops=True,
                     bias=True):
            super().__init__()
            self.add_self_loops = add_self_loops
            self.lin = nn.Linear(in_channels, out_channels, bias=False)
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

        def forward(self, x, edge_index, edge_weight=None):
            n = x.size(0)
            row, col = edge_index[0], edge_index[1]
            if edge_weight is None:
                edge_weight = torch.ones(row.numel(), dtype=x.dtype)
            edge_weight = edge_weight.to(x.dtype)
            if self.add_self_loops:
                loop = torch.arange(n)
                row = torch.cat([row, loop])
                col = torch.cat([col, loop])
                edge_weight = torch.cat(
                    [edge_weight, torch.ones(n, dtype=x.dtype)]
                )
            deg = scatter_sum(edge_weight, col, n)
            dinv = deg.pow(-0.5)
            dinv[torch.isinf(dinv)] = 0.0
            norm = dinv[row] * edge_weight * dinv[col]
            h = self.lin(x)
            out = scatter_sum(norm.unsqueeze(-1) * h[row], col, n)
            if self.bias is not None:
                out = out + self.bias
            return out

    class SAGEConv(nn.Module):
        def __init__(self, in_channels, out_channels, aggr="mean"):
            super().__init__()
            assert aggr == "mean"
            self.lin_l = nn.Linear(in_channels, out_channels, bias=True)
            self.lin_r = nn.Linear(in_channels, out_channels, bias=False)

        def forward(self, x, edge_index):
            n = x.size(0)
            row, col = edge_index[0], edge_index[1]
            s = scatter_sum(x[row], col, n)
            cnt = scatter_sum(torch.ones(row.numel(), dtype=x.dtype), col, n)
            mean = s / cnt.clamp(min=1.0).unsqueeze(-1)
            return self.lin_l(mean) + self.lin_r(x)

    class LayerNorm(nn.Module):
        """PyG norm.LayerNorm, mode='graph', called without a batch vector:
        normalizes over ALL nodes and channels of the input tensor."""

        def __init__(self, in_channels, eps=1e-5, affine=True, mode="graph"):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(in_channels))
            self.bias = nn.Parameter(torch.zeros(in_channels))

        def forward(self, x):
            y = x - x.mean()
            out = y / (y.std(unbiased=False) + self.eps)
            return out * self.weight + self.bias

    tg = types.ModuleType("torch_geometric")
    tgnn = types.ModuleType("torch_geometric.nn")
    normmod = types.ModuleType("torch_geometric.nn.norm")
    normmod.LayerNorm = LayerNorm
    tgnn.GCNConv = GCNConv
    tgnn.SAGEConv = SAGEConv
    tgnn.norm = normmod
    tg.nn = tgnn
    sys.modules["torch_geometric.nn"] = tgnn
    sys.modules["torch_geometric.nn.norm"] = normmod
    return tg


def _chumpy_module():
    """Just enough chumpy for the reference's SMPL deserialization
    (reference modules/smplpytorch/native/webuser/serialization.py:1-39
    and posemapper.py): plain-numpy pkls wrapped in `.r`-bearing arrays.
    The chumpy GRAPH mode (Ch instances with dterms) is never entered —
    `pose` stays an ndarray so posemapper.lrotmin takes its numpy path."""
    import numpy as np

    class ChArray(np.ndarray):
        @property
        def r(self):
            return np.asarray(self)

    def _array(x):
        return np.asarray(x).view(ChArray)

    class Ch:
        # subclassed by posemapper.Rodrigues at import time; instances are
        # only created on the chumpy-graph path the stub never takes
        dterms = ()

        def __init__(self, *a, **k):  # pragma: no cover - guard
            raise NotImplementedError(
                "chumpy stub: graph mode unsupported (numpy path only)"
            )

    mod = types.ModuleType("chumpy")
    mod.Ch = Ch
    mod.array = _array
    mod.vstack = lambda arrs: _array(np.vstack([np.asarray(a)
                                                for a in arrs]))
    mod.concatenate = np.concatenate
    mod.eye = np.eye
    chmod = types.ModuleType("chumpy.ch")
    chmod.MatVecMult = lambda mtx, vec: _array(mtx.dot(np.asarray(vec)))
    mod.ch = chmod
    sys.modules["chumpy.ch"] = chmod
    return mod


_STUBS = {
    "easydict": _easydict_module,
    "skfmm": _skfmm_module,
    "torchvision": _torchvision_module,
    "torch_geometric": _torch_geometric_module,
    "chumpy": _chumpy_module,
}

_cache: dict = {}


def load_reference() -> SimpleNamespace:
    """Install stubs for missing deps, put /root/reference on sys.path, and
    import the reference modules the parity tests exercise."""
    if _cache:
        return _cache["ns"]

    import matplotlib

    matplotlib.use("Agg")

    for name, factory in _STUBS.items():
        if name in sys.modules:
            continue
        try:
            importlib.import_module(name)
        except ImportError:
            sys.modules[name] = factory()

    if REF not in sys.path:
        sys.path.append(REF)

    import metrics as ref_metrics  # noqa: E402
    import modules.discriminator as ref_discriminator  # noqa: E402
    import modules.gcn as ref_gcn  # noqa: E402
    import modules.keypoint_detector_integral as ref_kpd  # noqa: E402
    import modules.keypoint_detector_integral_multi as ref_kpd_multi  # noqa: E402
    import modules.model as ref_model  # noqa: E402
    import modules.util as ref_util  # noqa: E402
    from modules.base_losses import integral as ref_integral  # noqa: E402
    from modules.base_losses import loss_func as ref_loss  # noqa: E402

    # eval.py / eval_utils.py clash with nothing, but repo-root eval.py
    # shadows the name when the repo root is on sys.path — import the
    # reference one explicitly by file location.
    import eval_utils as ref_eval_utils  # noqa: E402
    import human_utils.common.imglib.affine as ref_affine  # noqa: E402
    import human_utils.common.imglib.format as ref_format  # noqa: E402
    import human_utils.common.utility.augment as ref_augment  # noqa: E402
    import human_utils.dataloader.dataloader as ref_dataloader  # noqa: E402

    spec = importlib.util.spec_from_file_location("ref_eval", REF + "/eval.py")
    ref_eval = importlib.util.module_from_spec(spec)
    sys.modules["ref_eval"] = ref_eval
    spec.loader.exec_module(ref_eval)

    ns = SimpleNamespace(
        util=ref_util,
        model=ref_model,
        loss=ref_loss,
        integral=ref_integral,
        kpd=ref_kpd,
        kpd_multi=ref_kpd_multi,
        gcn=ref_gcn,
        discriminator=ref_discriminator,
        metrics=ref_metrics,
        eval_utils=ref_eval_utils,
        eval=ref_eval,
        affine=ref_affine,
        format=ref_format,
        augment=ref_augment,
        dataloader=ref_dataloader,
    )
    _cache["ns"] = ns
    return ns
