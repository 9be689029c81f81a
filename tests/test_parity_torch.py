"""Cross-framework numerics parity: the JAX flagship forward vs the torch
mirror (benchmarks/torch_cpu_baseline.py) with IDENTICAL weights and inputs.

This pins the whole denoiser math stack — timestep embedding, towers,
NT-Xent, dense bipartite GCNConv, sumW blend, cosine head — against an
independent implementation in a different framework. Exact stochastic parity
with the reference is impossible (different RNG streams, SURVEY.md §7 hard
part 3); deterministic forward parity at fixed weights is the strong check
that IS possible.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gdmcf_tpu.config import Config
from gdmcf_tpu.models.registry import build_model

N_USER, N_ITEM, B, D = 30, 40, 8, 16


def build_pair():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.torch_cpu_baseline import TorchFlagship

    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[D], emb_size=10,
                 steps=5, noise_scale=0.01)
    jmodel = build_model(cfg, N_USER, N_ITEM)
    params = jmodel.init(jax.random.PRNGKey(0))

    tmodel = TorchFlagship(N_USER, N_ITEM, d=D)
    tmodel.eval()

    def t(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        tmodel.emb_layer.weight.copy_(t(params["emb_layer"]["w"]).T)
        tmodel.emb_layer.bias.copy_(t(params["emb_layer"]["b"]))
        tmodel.tower1.weight.copy_(t(params["in_layers"][0]["w"]).T)
        tmodel.tower1.bias.copy_(t(params["in_layers"][0]["b"]))
        tmodel.tower2.weight.copy_(t(params["in_layers2"][0]["w"]).T)
        tmodel.tower2.bias.copy_(t(params["in_layers2"][0]["b"]))
        tmodel.embedding_item.weight.copy_(t(params["embedding_item"]))
        tmodel.embedding_user.weight.copy_(t(params["embedding_user"]))
        tmodel.gcn1.weight.copy_(t(params["gcn"]["conv1"]["w"]).T)
        tmodel.gcn1.bias.copy_(t(params["gcn"]["conv1"]["b"]))
        tmodel.gcn2.weight.copy_(t(params["gcn"]["conv2"]["w"]).T)
        tmodel.gcn2.bias.copy_(t(params["gcn"]["conv2"]["b"]))
        tmodel.sumW.copy_(t(params["sumW"]))
    return jmodel, params, tmodel


def test_forward_parity():
    jmodel, params, tmodel = build_pair()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, N_ITEM)).astype(np.float32)
    x0 = (rng.random((B, N_ITEM)) < 0.3).astype(np.float32)
    s = (rng.random((B, N_ITEM)) < 0.5).astype(np.float32)
    c1 = x0 * s
    c0 = (1 - x0) * (1 - s)
    x_U = np.stack([c0, c1], axis=-1).astype(np.float32)
    ts = rng.integers(0, 5, B)
    index = np.arange(B)

    j_out, j_closs = jmodel.apply(
        params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(x_U),
        index=jnp.asarray(index), graph=jnp.asarray(x_U),
        rcloss=True, train=False, rng=None)

    with torch.no_grad():
        t_out, t_closs = tmodel(torch.tensor(x), torch.tensor(ts),
                                torch.tensor(x_U), torch.tensor(index),
                                torch.tensor(c1))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=2e-4, atol=2e-5)
    assert abs(float(j_closs) - float(t_closs)) < 1e-4


def test_forward_parity_empty_graph():
    """Degenerate graph (no edges) must also agree — exercises the deg=0
    branch of the dense GCN normalization."""
    jmodel, params, tmodel = build_pair()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, N_ITEM)).astype(np.float32)
    x_U = np.zeros((B, N_ITEM, 2), dtype=np.float32)
    x_U[..., 0] = 1.0  # all cells in state 0
    ts = np.zeros(B, dtype=np.int64)
    index = np.arange(B)
    g = np.zeros((B, N_ITEM), dtype=np.float32)

    j_out, _ = jmodel.apply(
        params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(x_U),
        index=jnp.asarray(index), graph=jnp.asarray(x_U),
        rcloss=True, train=False, rng=None)
    with torch.no_grad():
        t_out, _ = tmodel(torch.tensor(x), torch.tensor(ts),
                          torch.tensor(x_U), torch.tensor(index),
                          torch.tensor(g))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=2e-4, atol=2e-5)
