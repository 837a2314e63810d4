"""Formula-level pins for the refshim torch_geometric stubs.

The GCN discriminator parity tests (test_reference_parity_models.py) run
the reference code against refshim's hand-written GCNConv / SAGEConv /
LayerNorm stand-ins, because real torch_geometric (CUDA scatter kernels)
cannot be installed here. That makes the discriminator parity evidence
only as good as the stubs — so these tests pin the stubs themselves
against PyG's documented message-passing semantics, hand-computed with
explicit dense matrices and numpy (no code shared with either the stubs
or models/discriminator.py):

  * GCNConv: X' = D^-1/2 (A + I) D^-1/2 X W^T + b with edge weights,
    degrees accumulated at the TARGET (col) endpoint, self-loop weight 1
    (PyG gcn_norm with add_self_loops=True, improved=False).
  * directed edges flow source->target only (asymmetric graph case).
  * isolated node with add_self_loops=False -> zero row (deg^-1/2 = 0
    guard).
  * SAGEConv(aggr='mean'): x'_i = W_l mean_{j->i} x_j + W_r x_i, bias on
    the aggregated term; empty neighborhoods contribute zero.
  * PyG norm.LayerNorm(mode='graph') without a batch vector: centers and
    scales over ALL nodes AND channels, eps added to the BIASED std (not
    the variance).
"""

import numpy as np
import pytest

import refshim

refshim.load_reference()  # installs the stubs into sys.modules

import torch  # noqa: E402
from torch_geometric.nn import GCNConv, SAGEConv  # noqa: E402
from torch_geometric.nn.norm import LayerNorm  # noqa: E402


def _np(t):
    return t.detach().numpy()


def _gcn_dense(x, edges, weights, w_lin, bias, self_loops=True):
    """Hand-rolled dense D^-1/2 (A+I) D^-1/2 X W^T + b (PyG gcn_norm)."""
    n = x.shape[0]
    a = np.zeros((n, n))
    for (r, c), w in zip(edges, weights):
        a[c, r] += w  # message r -> c lands in row c
    if self_loops:
        a += np.eye(n)
    deg = a.sum(axis=1)  # weighted in-degree at the target
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    m = dinv[:, None] * a * dinv[None, :]
    return m @ x @ w_lin.T + bias


def test_gcnconv_matches_hand_symnorm():
    torch.manual_seed(0)
    n, cin, cout = 5, 3, 4
    conv = GCNConv(cin, cout)
    torch.nn.init.normal_(conv.lin.weight)
    torch.nn.init.normal_(conv.bias)

    x = torch.randn(n, cin, dtype=torch.float64)
    conv = conv.double()
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (3, 4), (4, 3), (0, 3), (3, 0)]
    weights = [1.0, 1.0, 0.5, 0.5, 2.0, 2.0, 0.25, 0.25]
    edge_index = torch.tensor(np.array(edges).T)
    out = conv(x, edge_index, torch.tensor(weights, dtype=torch.float64))

    expect = _gcn_dense(
        _np(x), edges, weights, _np(conv.lin.weight), _np(conv.bias)
    )
    np.testing.assert_allclose(_np(out), expect, rtol=1e-10, atol=1e-12)


def test_gcnconv_directed_edge_flows_source_to_target():
    """One directed edge 0->1: node 1 receives node 0's message, node 0
    receives only its self-loop."""
    conv = GCNConv(2, 2).double()
    with torch.no_grad():
        conv.lin.weight.copy_(torch.eye(2, dtype=torch.float64))
        conv.bias.zero_()
    x = torch.tensor([[1.0, 0.0], [0.0, 2.0], [4.0, 4.0]],
                     dtype=torch.float64)
    out = conv(x, torch.tensor([[0], [1]]))
    # deg: node0 = 1 (self), node1 = 2 (self + edge), node2 = 1 (self)
    # out0 = 1/sqrt(1*1) * x0 ; out2 = x2
    np.testing.assert_allclose(_np(out)[0], [1.0, 0.0])
    np.testing.assert_allclose(_np(out)[2], [4.0, 4.0])
    # out1 = d1^-.5 * 1 * d0^-.5 * x0 + d1^-1 * x1 with d0=1, d1=2
    expect1 = np.array([1.0, 0.0]) / np.sqrt(2.0) + np.array([0.0, 2.0]) / 2.0
    np.testing.assert_allclose(_np(out)[1], expect1, rtol=1e-12)


def test_gcnconv_isolated_node_without_self_loops_is_zero():
    conv = GCNConv(2, 2, add_self_loops=False, bias=False).double()
    with torch.no_grad():
        conv.lin.weight.copy_(torch.eye(2, dtype=torch.float64))
    x = torch.tensor([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]],
                     dtype=torch.float64)
    out = conv(x, torch.tensor([[0], [1]]))
    # node 2 has no edges at all: deg 0 -> the deg^-1/2 inf guard must
    # produce an exact zero row, not nan
    np.testing.assert_allclose(_np(out)[2], [0.0, 0.0])
    assert np.isfinite(_np(out)).all()


def test_sageconv_mean_matches_hand_formula():
    torch.manual_seed(1)
    n, cin, cout = 4, 3, 2
    conv = SAGEConv(cin, cout).double()
    x = torch.randn(n, cin, dtype=torch.float64)
    # in-neighbors: node0 <- {1, 2}; node1 <- {0}; nodes 2, 3 isolated
    edges = [(1, 0), (2, 0), (0, 1)]
    out = conv(x, torch.tensor(np.array(edges).T))

    wl, bl = _np(conv.lin_l.weight), _np(conv.lin_l.bias)
    wr = _np(conv.lin_r.weight)
    xn = _np(x)
    mean = np.zeros_like(xn)
    mean[0] = (xn[1] + xn[2]) / 2.0
    mean[1] = xn[0]
    expect = mean @ wl.T + bl + xn @ wr.T
    np.testing.assert_allclose(_np(out), expect, rtol=1e-10, atol=1e-12)


def test_pyg_graph_layernorm_normalizes_over_all_nodes_and_channels():
    ln = LayerNorm(3).double()
    with torch.no_grad():
        ln.weight.copy_(torch.tensor([1.0, 2.0, 3.0], dtype=torch.float64))
        ln.bias.copy_(torch.tensor([0.5, 0.0, -0.5], dtype=torch.float64))
    x = torch.tensor(
        [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 100.0]],
        dtype=torch.float64,
    )
    out = ln(x)

    xn = _np(x)
    centered = xn - xn.mean()  # ONE mean over the whole tensor
    std = np.sqrt(((xn - xn.mean()) ** 2).mean())  # biased, over everything
    expect = centered / (std + 1e-5) * np.array([1.0, 2.0, 3.0]) + np.array(
        [0.5, 0.0, -0.5]
    )
    np.testing.assert_allclose(_np(out), expect, rtol=1e-10, atol=1e-12)
    # NOT per-node layer norm: a per-row normalization would give rows
    # with identical statistics; the graph mode must not
    row_means = _np(out).mean(axis=1)
    assert np.ptp(row_means) > 1e-3


def test_stub_matches_reference_gcn_usage_shape():
    """The reference drives the stubs through batched dense->sparse
    conversion (reference modules/gcn.py:8-38); make sure the stub
    composes with that exact path on a 2-graph batch."""
    import modules.gcn as ref_gcn

    adj = torch.zeros(2, 3, 3, dtype=torch.float64)
    adj[0, 0, 1] = adj[0, 1, 0] = 1.0
    adj[1, 1, 2] = adj[1, 2, 1] = 2.0
    edge_index, edge_weight = ref_gcn.my_batched_dense_to_sparse(adj)
    assert edge_index.shape[0] == 2 and edge_index.max() == 5
    conv = GCNConv(2, 2).double()
    x = torch.randn(6, 2, dtype=torch.float64)
    out = conv(x, edge_index, edge_weight)
    assert out.shape == (6, 2)
    # batch-block isolation: graph 0's nodes only aggregate graph 0
    with torch.no_grad():
        conv.lin.weight.copy_(torch.eye(2, dtype=torch.float64))
        conv.bias.zero_()
    x2 = torch.zeros(6, 2, dtype=torch.float64)
    x2[5] = torch.tensor([7.0, 7.0])  # last node of graph 1
    out2 = conv(x2, edge_index, edge_weight)
    np.testing.assert_allclose(_np(out2)[:3], 0.0)  # graph 0 untouched


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
