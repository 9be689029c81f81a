"""Dense-masked bipartite GCN vs an explicit edge-list oracle.

The oracle reimplements torch_geometric GCNConv semantics (add self-loops,
deg over incoming edges, norm = deg_j^-1/2 * deg_i^-1/2, bias after
aggregation) on the dynamic edge list the reference builds
(ref models/DNN.py:1217-1219), proving the static dense form equivalent."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from gdmcf_tpu.models.gcn import gcn_conv_bipartite, layer_gcn_apply, layer_gcn_init
from gdmcf_tpu.models.layers import gcn_conv_init


def gcn_conv_oracle(w, b, x, edges, num_nodes):
    """edges: list of (src, dst) directed pairs; self-loops added."""
    edges = list(edges) + [(i, i) for i in range(num_nodes)]
    deg = np.zeros(num_nodes)
    for _, i in edges:
        deg[i] += 1.0
    xw = x @ w
    out = np.zeros((num_nodes, w.shape[1]))
    for j, i in edges:
        out[i] += xw[j] / np.sqrt(deg[j] * deg[i])
    return out + b


def bipartite_edges(g):
    b = g.shape[0]
    rows, cols = np.nonzero(g)
    return [(u, b + i) for u, i in zip(rows, cols)]


def symmetric_edges(g):
    e = bipartite_edges(g)
    return e + [(i, u) for (u, i) in e]


def test_directed_conv_matches_oracle(rng):
    B, N, D, Do = 6, 11, 8, 5
    g = (rng.random((B, N)) < 0.3).astype(np.float32)
    hu = rng.standard_normal((B, D)).astype(np.float32)
    hi = rng.standard_normal((N, D)).astype(np.float32)
    p = gcn_conv_init(jax.random.PRNGKey(0), D, Do)
    u_out, i_out = gcn_conv_bipartite(p, jnp.asarray(hu), jnp.asarray(hi),
                                      jnp.asarray(g), symmetric=False)
    x = np.concatenate([hu, hi], axis=0)
    expected = gcn_conv_oracle(np.asarray(p["w"]), np.asarray(p["b"]), x,
                               bipartite_edges(g), B + N)
    np.testing.assert_allclose(np.asarray(u_out), expected[:B], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_out), expected[B:], rtol=1e-4, atol=1e-5)


def test_symmetric_conv_matches_oracle(rng):
    B, N, D, Do = 5, 9, 6, 6
    g = (rng.random((B, N)) < 0.4).astype(np.float32)
    hu = rng.standard_normal((B, D)).astype(np.float32)
    hi = rng.standard_normal((N, D)).astype(np.float32)
    p = gcn_conv_init(jax.random.PRNGKey(1), D, Do)
    u_out, i_out = gcn_conv_bipartite(p, jnp.asarray(hu), jnp.asarray(hi),
                                      jnp.asarray(g), symmetric=True)
    x = np.concatenate([hu, hi], axis=0)
    expected = gcn_conv_oracle(np.asarray(p["w"]), np.asarray(p["b"]), x,
                               symmetric_edges(g), B + N)
    np.testing.assert_allclose(np.asarray(u_out), expected[:B], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_out), expected[B:], rtol=1e-4, atol=1e-5)


def test_directed_user_rows_are_graph_independent(rng):
    """Reference quirk: with directed user->item edges, user outputs don't
    depend on the graph at all (SURVEY/engine docstrings)."""
    B, N, D = 4, 7, 5
    hu = rng.standard_normal((B, D)).astype(np.float32)
    hi = rng.standard_normal((N, D)).astype(np.float32)
    p = gcn_conv_init(jax.random.PRNGKey(2), D, D)
    g1 = (rng.random((B, N)) < 0.5).astype(np.float32)
    g2 = np.zeros_like(g1)
    u1, _ = gcn_conv_bipartite(p, jnp.asarray(hu), jnp.asarray(hi), jnp.asarray(g1))
    u2, _ = gcn_conv_bipartite(p, jnp.asarray(hu), jnp.asarray(hi), jnp.asarray(g2))
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-6)


def test_layer_gcn_two_layer_shapes(rng):
    B, N, D = 3, 6, 10
    p = layer_gcn_init(jax.random.PRNGKey(3), D, 4, D, num_layers=2)
    hu = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    hi = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    g = jnp.asarray((rng.random((B, N)) < 0.5).astype(np.float32))
    u, i = layer_gcn_apply(p, hu, hi, g, num_layers=2)
    assert u.shape == (B, D) and i.shape == (N, D)
    # residual path
    u_r, _ = layer_gcn_apply(p, hu, hi, g, num_layers=2, residual=True)
    np.testing.assert_allclose(np.asarray(u_r), np.asarray(u + hu), rtol=1e-6)


@pytest.mark.parametrize("layers", [1, 2])
def test_user_rows_shortcut_equals_full_conv(rng, layers):
    """layer_gcn_user_rows == layer_gcn_apply(...)[0] in the directed case
    (the specialization the flagship uses to skip the discarded item chain)."""
    import jax

    from gdmcf_tpu.models.gcn import (layer_gcn_apply, layer_gcn_init,
                                      layer_gcn_user_rows)

    b, n, d_in, hid = 12, 20, 16, 8
    p = layer_gcn_init(jax.random.PRNGKey(0), d_in, hid, d_in, layers)
    hu = jnp.asarray(rng.standard_normal((b, d_in)).astype(np.float32))
    hi = jnp.asarray(rng.standard_normal((n, d_in)).astype(np.float32))
    g = jnp.asarray((rng.random((b, n)) < 0.3).astype(np.float32))
    full_u, _ = layer_gcn_apply(p, hu, hi, g, num_layers=layers,
                                symmetric=False)
    fast_u = layer_gcn_user_rows(p, hu, layers)
    np.testing.assert_allclose(np.asarray(fast_u), np.asarray(full_u),
                               rtol=1e-6, atol=1e-6)
