"""GCN pose discriminators, rebuilt as dense adjacency matmuls.

The reference uses torch_geometric sparse kernels (GCNConv / SAGEConv,
reference: modules/gcn.py, modules/discriminator.py). The skeleton graph is
tiny and fixed (18 nodes, ~17 bones), so sparse scatter kernels are strictly
slower than a batched dense (B, 18, 18) @ (B, 18, C) einsum on TPU — the
whole stack maps onto the MXU. Semantics preserved:

  * SAGEConv(aggr='mean'): x' = x @ W_root + rownorm(A) @ x @ W_neigh + b,
    where A = skeleton adjacency (+ I when use_self_loop).
  * GCNConv: x' = D^-1/2 A_w D^-1/2 x @ W + b, with A_w carrying
    1/bone-length edge weights; when self-loops are enabled the reference
    adds the identity twice (once into the weight matrix, once inside
    GCNConv), which we reproduce (A_w + 2I).
  * PyG LayerNorm in its default 'graph' mode normalizes over all nodes and
    channels. The reference feeds a flattened batch with no batch vector, so
    its normalization span silently depends on the per-GPU batch; we
    normalize per sample (nodes x channels of one skeleton), which is the
    world-size-invariant reading of the same semantics.

Three variants + the decoupled joint/bone default, mirroring
modules/discriminator.py:80-238.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_DENSE_KERNEL_INIT = nn.initializers.lecun_normal()


def skeleton_adjacency(
    parent_ids: Sequence[int],
    child_ids: Sequence[int],
    num_nodes: int,
    self_loop_weight: float = 0.0,
) -> np.ndarray:
    """Symmetric 0/1 bone adjacency (+ weighted self loops). Static."""
    a = np.zeros((num_nodes, num_nodes), dtype=np.float32)
    for p, c in zip(parent_ids, child_ids):
        a[p, c] = 1.0
        a[c, p] = 1.0
    a += self_loop_weight * np.eye(num_nodes, dtype=np.float32)
    return a


def positional_encoding(num_nodes: int, channels: int) -> np.ndarray:
    """Sinusoidal PE over joint index; matches the reference's layout
    (reference: modules/discriminator.py:42-51)."""
    pe = np.zeros((num_nodes, channels), dtype=np.float32)
    for i in range(num_nodes):
        for j in range(channels):
            arg = i / 10000 ** (2 * j / channels)
            pe[i, j] = math.sin(arg) if j % 2 == 0 else math.cos(arg)
    return pe


class DenseSAGE(nn.Module):
    """SAGEConv(aggr='mean') on a fixed dense adjacency."""

    features: int

    @nn.compact
    def __call__(self, x, adj_rownorm):
        # adj_rownorm: (N, N) row-normalized neighbor matrix (static).
        neigh = jnp.einsum("ij,bjc->bic", adj_rownorm, x)
        out = nn.Dense(self.features, use_bias=True, name="lin_neigh")(neigh)
        out = out + nn.Dense(self.features, use_bias=False, name="lin_root")(x)
        return out


class GraphLayerNorm(nn.Module):
    """LayerNorm over (nodes, channels) of each sample, per-channel affine."""

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(-2, -1), keepdims=True)
        var = ((x - mean) ** 2).mean(axis=(-2, -1), keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        w = self.param("scale", nn.initializers.ones, (self.channels,))
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        return y * w + b


class SAGEResidualBlock(nn.Module):
    """Two SAGE+LN+ReLU layers with a skip, or a single terminal layer.
    Reference: modules/gcn.py:79-110."""

    hidden_dim: int
    output_dim: int
    single_layer: bool = False

    @nn.compact
    def __call__(self, x, adj_rownorm):
        if self.single_layer:
            y = DenseSAGE(self.output_dim)(x, adj_rownorm)
            y = GraphLayerNorm(self.output_dim)(y)
            return nn.relu(y)
        res = x
        y = DenseSAGE(self.hidden_dim)(x, adj_rownorm)
        y = GraphLayerNorm(self.hidden_dim)(y)
        y = nn.relu(y)
        y = DenseSAGE(self.output_dim)(y, adj_rownorm)
        y = GraphLayerNorm(self.output_dim)(y)
        y = nn.relu(y)
        return y + res


class DenseGCNLayer(nn.Module):
    """GCNConv on a per-sample weighted dense adjacency (already
    sym-normalized). The bias is added AFTER aggregation (PyG GCNConv
    computes out = A_norm @ (x W) + b; adding it before would scale it by
    the adjacency rows)."""

    features: int

    @nn.compact
    def __call__(self, x, adj_norm):
        y = nn.Dense(self.features, use_bias=False)(x)
        y = jnp.einsum("bij,bjc->bic", adj_norm, y)
        return y + self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )


def sym_normalize(adj: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """D^-1/2 A D^-1/2 per batch element."""
    deg = adj.sum(axis=-1)
    inv_sqrt = jnp.where(deg > eps, 1.0 / jnp.sqrt(jnp.maximum(deg, eps)), 0.0)
    return adj * inv_sqrt[..., :, None] * inv_sqrt[..., None, :]


class _StatelessBN(nn.Module):
    """Per-channel batch normalization over (batch, node) with learned
    affine and no running statistics (see GCNDiscriminator.maybe_bn)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(0, 1), keepdims=True)
        var = ((x - mean) ** 2).mean(axis=(0, 1), keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        c = x.shape[-1]
        return y * self.param(
            "scale", nn.initializers.ones, (c,)
        ) + self.param("bias", nn.initializers.zeros, (c,))


class FFNHeader(nn.Module):
    """Linear -> ReLU -> Dropout -> Linear(1).
    Reference: modules/discriminator.py:8-21."""

    hidden: int = 512
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        return nn.Dense(1)(x)


class GCNDiscriminatorDecouple(nn.Module):
    """Default discriminator: parallel SAGE streams over joint positions and
    root-padded bone vectors, concatenated into an FFN header.
    Reference: modules/discriminator.py:180-238."""

    parent_ids: Sequence[int]
    child_ids: Sequence[int]
    input_dim: int = 128
    hidden_dim: int = 128
    output_dim: int = 128
    num_nodes: int = 18
    disc_sup_dim: int = 3
    num_layers: int = 2
    use_self_loop: bool = True
    use_pe: bool = True
    name_tag: str = "ResGCNDecouple"

    @nn.compact
    def __call__(self, keypoints, train: bool = True):
        b, n, c = keypoints.shape
        adj = skeleton_adjacency(
            self.parent_ids, self.child_ids, self.num_nodes,
            1.0 if self.use_self_loop else 0.0,
        )
        rownorm = jnp.asarray(adj / adj.sum(axis=1, keepdims=True).clip(1e-12))

        start = keypoints[:, jnp.asarray(self.child_ids), :]
        end = keypoints[:, jnp.asarray(self.parent_ids), :]
        bone = jnp.concatenate(
            [jnp.zeros((b, 1, c), keypoints.dtype), end - start], axis=1
        )

        if self.use_pe:
            pe = jnp.asarray(positional_encoding(self.num_nodes, c))
            kp_in = jnp.concatenate(
                [keypoints, jnp.broadcast_to(pe, keypoints.shape)], axis=-1
            )
            bone_in = jnp.concatenate(
                [bone, jnp.broadcast_to(pe, bone.shape)], axis=-1
            )
        else:
            kp_in, bone_in = keypoints, bone

        def stream(x, tag):
            x = nn.Dense(self.input_dim, name=f"{tag}_input")(x)
            for i in range(self.num_layers):
                x = SAGEResidualBlock(
                    self.hidden_dim, self.hidden_dim, name=f"{tag}_block{i}"
                )(x, rownorm)
            x = SAGEResidualBlock(
                self.hidden_dim, self.output_dim, single_layer=True,
                name=f"{tag}_final",
            )(x, rownorm)
            return x.reshape(b, -1)

        feats = jnp.concatenate(
            [stream(kp_in, "joint"), stream(bone_in, "bone")], axis=-1
        )
        return FFNHeader(512, name="header")(feats, train)


class GCNSAGEDiscriminator(nn.Module):
    """Residual SAGE stack + linear header.
    Reference: modules/discriminator.py:142-177."""

    parent_ids: Sequence[int]
    child_ids: Sequence[int]
    input_dim: int = 128
    hidden_dim: int = 128
    output_dim: int = 128
    num_nodes: int = 18
    disc_sup_dim: int = 3
    num_layers: int = 2
    use_self_loop: bool = True
    use_pe: bool = False
    name_tag: str = "ResSAGEGCN"

    @nn.compact
    def __call__(self, keypoints, train: bool = True):
        b, n, c = keypoints.shape
        adj = skeleton_adjacency(
            self.parent_ids, self.child_ids, self.num_nodes,
            1.0 if self.use_self_loop else 0.0,
        )
        rownorm = jnp.asarray(adj / adj.sum(axis=1, keepdims=True).clip(1e-12))

        x = keypoints
        if self.use_pe:
            pe = jnp.asarray(positional_encoding(self.num_nodes, c))
            x = jnp.concatenate([x, jnp.broadcast_to(pe, x.shape)], axis=-1)
        x = nn.Dense(self.input_dim, name="input")(x)
        for i in range(self.num_layers):
            x = SAGEResidualBlock(
                self.hidden_dim, self.hidden_dim, name=f"block{i}"
            )(x, rownorm)
        x = SAGEResidualBlock(
            self.hidden_dim, self.output_dim, single_layer=True, name="final"
        )(x, rownorm)
        return nn.Dense(1, name="header")(x.reshape(b, -1))


class GCNDiscriminator(nn.Module):
    """'simple_gcn' / 'res_gcn' with 1/bone-length edge weights.
    Reference: modules/discriminator.py:80-139, modules/gcn.py:40-77."""

    parent_ids: Sequence[int]
    child_ids: Sequence[int]
    variant: str = "res_gcn"  # or 'simple_gcn'
    input_dim: int = 128
    hidden_dim: int = 128
    output_dim: int = 128
    num_nodes: int = 18
    disc_sup_dim: int = 3
    num_layers: int = 2
    use_self_loop: bool = True
    use_bn: bool = False
    p_dropout: float = 0.5
    name_tag: str = "ResGCN"

    def _adjacency(self, keypoints):
        """Per-sample weighted adjacency: 1/bone-length on skeleton edges;
        identity added twice under use_self_loop (the reference adds it in
        the weight matrix AND inside GCNConv)."""
        b = keypoints.shape[0]
        parents = jnp.asarray(self.parent_ids)
        children = jnp.asarray(self.child_ids)
        diff = keypoints[:, parents, :] - keypoints[:, children, :]
        inv_len = 1.0 / jnp.sqrt((diff**2).sum(-1) + 1e-12)
        adj = jnp.zeros((b, self.num_nodes, self.num_nodes), keypoints.dtype)
        adj = adj.at[:, parents, children].set(inv_len)
        adj = adj.at[:, children, parents].set(inv_len)
        if self.use_self_loop:
            adj = adj + 2.0 * jnp.eye(self.num_nodes, dtype=keypoints.dtype)
        return sym_normalize(adj)

    @nn.compact
    def __call__(self, keypoints, train: bool = True):
        b = keypoints.shape[0]
        adj_norm = self._adjacency(keypoints)
        x = nn.Dense(self.input_dim, name="input")(keypoints)

        def maybe_bn(y):
            # reference: SyncBatchNorm over node features when use_bn
            # (modules/gcn.py:57-59, 66-75). Implemented statelessly
            # (batch statistics + learned affine, no running averages): the
            # discriminator never runs at eval time, and stateless batch
            # stats under GSPMD are exactly the cross-replica statistics.
            if not self.use_bn:
                return y
            return _StatelessBN()(y)

        if self.variant == "simple_gcn":
            x = nn.relu(DenseGCNLayer(self.hidden_dim)(x, adj_norm))
            x = nn.relu(DenseGCNLayer(self.hidden_dim)(x, adj_norm))
        elif self.variant == "res_gcn":
            x = nn.relu(DenseGCNLayer(self.hidden_dim)(x, adj_norm))
            for _ in range(self.num_layers):
                res = x
                y = DenseGCNLayer(self.hidden_dim)(x, adj_norm)
                y = nn.relu(maybe_bn(y))
                y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
                y = DenseGCNLayer(self.hidden_dim)(y, adj_norm)
                y = nn.relu(maybe_bn(y))
                y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
                x = y + res
            x = nn.relu(DenseGCNLayer(self.output_dim)(x, adj_norm))
        else:
            raise NotImplementedError(self.variant)
        return nn.Dense(1, name="header")(x.reshape(b, -1))


def build_discriminator(disc_params: dict, parent_ids, child_ids):
    """Factory mirroring the reference's substring dispatch
    (reference: train.py:219-228) with the cal_links(extension=False) edges
    wired in (reference: modules/model.py:202-210)."""
    name = disc_params["name"]
    common = dict(
        parent_ids=tuple(parent_ids),
        child_ids=tuple(child_ids),
        input_dim=disc_params["input_dim"],
        hidden_dim=disc_params["hidden_dim"],
        output_dim=disc_params["output_dim"],
        num_nodes=disc_params["num_node"],
        disc_sup_dim=disc_params.get("disc_sup_dim", 3),
        num_layers=disc_params.get("num_layers", 2),
        use_self_loop=disc_params.get("use_self_loop", True),
    )
    if "gcn" not in name:
        raise NotImplementedError(name)
    if "decouple" in name:
        return GCNDiscriminatorDecouple(
            use_pe=disc_params.get("use_pe", False), **common
        )
    if "sage" in name:
        return GCNSAGEDiscriminator(
            use_pe=disc_params.get("use_pe", False), **common
        )
    return GCNDiscriminator(
        variant=name, use_bn=disc_params.get("use_bn", False), **common
    )
