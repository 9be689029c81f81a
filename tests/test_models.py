"""Backbone init/apply shape and behavior checks for every model family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdmcf_tpu.config import Config
from gdmcf_tpu.models.registry import BACKBONES, build_model
from gdmcf_tpu.models.layers import nt_xent_loss

N_USER, N_ITEM, B = 40, 30, 8


def make_batch(key, backbone):
    kx, ku, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, N_ITEM))
    x_bin = (jax.random.uniform(ku, (B, N_ITEM)) < 0.3).astype(jnp.float32)
    x_U = jnp.stack([1.0 - x_bin, x_bin], axis=-1)
    index = jnp.arange(B, dtype=jnp.int32)
    t = jnp.zeros((B,), dtype=jnp.int32)
    return x, t, x_U, index, x_U


@pytest.mark.parametrize("backbone", BACKBONES)
def test_backbone_forward_shapes(backbone):
    cfg = Config(backbone=backbone, dims=[16], emb_size=10, steps=5)
    model = build_model(cfg, N_USER, N_ITEM)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    x, t, x_U, index, graph = make_batch(jax.random.PRNGKey(1), backbone)
    out, closs = model.apply(params, x, t, x_U, index=index, graph=graph,
                             rcloss=model.needs_index and model.needs_onehot,
                             train=True, rng=jax.random.PRNGKey(2))
    assert out.shape == (B, N_ITEM)
    assert jnp.all(jnp.isfinite(out))
    if model.needs_index and model.needs_onehot:
        assert closs is not None and jnp.isfinite(closs)


@pytest.mark.parametrize("backbone", BACKBONES)
def test_backbone_eval_deterministic(backbone):
    cfg = Config(backbone=backbone, dims=[16], emb_size=10, steps=5)
    model = build_model(cfg, N_USER, N_ITEM)
    params = model.init(jax.random.PRNGKey(0))
    x, t, x_U, index, graph = make_batch(jax.random.PRNGKey(1), backbone)
    out1, _ = model.apply(params, x, t, x_U, index=index, graph=graph,
                          train=False, rng=None)
    out2, _ = model.apply(params, x, t, x_U, index=index, graph=graph,
                          train=False, rng=None)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_gcn_backbone_jittable():
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10)
    model = build_model(cfg, N_USER, N_ITEM)
    params = model.init(jax.random.PRNGKey(0))
    x, t, x_U, index, graph = make_batch(jax.random.PRNGKey(1), "gcn")

    @jax.jit
    def fwd(p, x, t, x_U, index, graph):
        return model.apply(p, x, t, x_U, index=index, graph=graph,
                           rcloss=True, train=False, rng=None)

    out, closs = fwd(params, x, t, x_U, index, graph)
    assert out.shape == (B, N_ITEM)


def test_gcn_backbone_grads_flow():
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10)
    model = build_model(cfg, N_USER, N_ITEM)
    params = model.init(jax.random.PRNGKey(0))
    x, t, x_U, index, graph = make_batch(jax.random.PRNGKey(1), "gcn")

    def loss_fn(p):
        out, closs = model.apply(p, x, t, x_U, index=index, graph=graph,
                                 rcloss=True, train=False, rng=None)
        return (out ** 2).mean() + closs

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(float(jnp.abs(g).sum())) for g in flat)
    # Reference property: sumW inits to 1.0 (ref DNN.py:1162) so the GCN blend
    # hc*sumW + gcn*(1-sumW) passes zero gradient to the conv weights at init;
    # sumW itself trains first. With sumW=0.5 every live param gets gradient.
    assert float(jnp.abs(grads["sumW"])) > 0
    assert float(jnp.abs(grads["gcn"]["conv1"]["w"]).sum()) == 0
    params2 = dict(params, sumW=jnp.asarray(0.5))
    grads2 = jax.grad(loss_fn)(params2)
    flat2, _ = jax.tree_util.tree_flatten(grads2)
    nonzero = [float(jnp.abs(g).sum()) > 0 for g in flat2]
    assert sum(nonzero) == len(flat2)


def test_nt_xent_matches_definition(rng):
    n, d = 6, 4
    z1 = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    z2 = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    sim = np.asarray(z1 @ z2.T) / 0.1
    p = np.exp(sim) / np.exp(sim).sum(axis=1, keepdims=True)
    diag = np.diag(p)
    neg = p.sum(axis=1) - diag
    # denominator epsilon matches the saturation guard (models/layers.py)
    expected = (-np.log((diag + 1e-5) / (neg + 1e-5))).mean()
    got = float(nt_xent_loss(z1, z2))
    assert abs(got - expected) < 1e-5


def test_nt_xent_impls_agree(rng):
    """The 'lse' inner form (logsumexp + diagonal only) must match the
    'softmax' form in value and gradient — they are the same math."""
    import gdmcf_tpu.models.layers as layers

    z1 = jnp.asarray(rng.standard_normal((32, 20)), dtype=jnp.float32)
    z2 = jnp.asarray(rng.standard_normal((32, 20)), dtype=jnp.float32)
    saved = layers._NT_XENT_IMPL
    try:
        vals, grads = {}, {}
        for impl in ("softmax", "lse"):
            layers._NT_XENT_IMPL = impl
            vals[impl] = float(nt_xent_loss(z1, z2))
            grads[impl] = jax.grad(lambda z: nt_xent_loss(z, z2))(z1)
    finally:
        layers._NT_XENT_IMPL = saved
    assert abs(vals["softmax"] - vals["lse"]) < 1e-6
    assert float(jnp.abs(grads["softmax"] - grads["lse"]).max()) < 1e-6


def test_nt_xent_auto_routing():
    """'auto' (the production default) picks softmax at the recipe batch
    and lse once the quadratic [B,B] term dominates (measured crossover,
    docs/BENCH_NOTES.md round-4 large-batch section); explicit forms pass
    through untouched."""
    import gdmcf_tpu.models.layers as layers

    assert layers._NT_XENT_IMPL == "auto"  # production default
    thr = layers._NT_XENT_LSE_MIN_BATCH
    assert layers._resolve_ntxent_impl(1024) == "softmax"
    assert layers._resolve_ntxent_impl(thr - 1) == "softmax"
    assert layers._resolve_ntxent_impl(thr) == "lse"
    saved = layers._NT_XENT_IMPL
    try:
        layers._NT_XENT_IMPL = "remat"
        assert layers._resolve_ntxent_impl(10_000) == "remat"
    finally:
        layers._NT_XENT_IMPL = saved


def test_noise_type_ablation_zeroes_closs():
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                 noise_type=1)
    model = build_model(cfg, N_USER, N_ITEM)
    params = model.init(jax.random.PRNGKey(0))
    x, t, x_U, index, graph = make_batch(jax.random.PRNGKey(1), "gcn")
    _, closs = model.apply(params, x, t, x_U, index=index, graph=graph,
                           rcloss=True, train=False, rng=None)
    assert float(closs) == 0.0


def test_lightgcn_backbone_propagates_over_train_graph(rng):
    """The link filter must use embeddings propagated over the train graph
    (reference predict_link over e_f, DNN.py:1776-1784), and those tables must
    be excluded from optimization (frozen_* mask)."""
    import scipy.sparse as sp
    from gdmcf_tpu.train.state import make_optimizer, _trainable_mask

    train = sp.csr_matrix((rng.random((N_USER, N_ITEM)) < 0.3).astype(np.float32))
    cfg = Config(backbone="lightGCN", dims=[16], emb_size=10, steps=5)
    from gdmcf_tpu.models.registry import build_model as bm
    with_graph = bm(cfg, N_USER, N_ITEM, train_csr=train)
    without = bm(cfg, N_USER, N_ITEM)
    p1 = with_graph.init(jax.random.PRNGKey(0))
    p0 = without.init(jax.random.PRNGKey(0))
    # propagation changes the frozen tables
    assert not np.allclose(np.asarray(p1["frozen_lgn_user"]),
                           np.asarray(p0["frozen_lgn_user"]))
    # the optimizer mask excludes frozen_* and includes everything else
    mask = _trainable_mask(p1)
    assert mask["frozen_lgn_user"] is False
    assert mask["frozen_lgn_item"] is False
    assert mask["emb_layer"]["w"] is True
    # forward works and is finite
    x, t, x_U, index, graph = make_batch(jax.random.PRNGKey(1), "lightGCN")
    out, _ = with_graph.apply(p1, x, t, x_U, index=index, graph=graph,
                              train=False, rng=None)
    assert out.shape == (B, N_ITEM) and bool(jnp.all(jnp.isfinite(out)))


def test_frozen_params_survive_adamw_with_weight_decay():
    import optax
    from gdmcf_tpu.train.state import make_optimizer
    params = {"w": jnp.ones((4,)), "frozen_c": jnp.ones((4,)) * 7.0}
    tx = make_optimizer(lr=0.1, weight_decay=0.1)
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4,)), "frozen_c": jnp.zeros((4,))}
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["frozen_c"]),
                                  np.asarray(params["frozen_c"]))
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))
