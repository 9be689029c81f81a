"""LightGCN pretrainer: propagation algebra, BPR loss, end-to-end smoke."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from gdmcf_tpu.models.lightgcn import (
    bpr_loss,
    normalized_bipartite_blocks,
    pretrain,
    propagate,
    sample_bpr_batch,
)


def random_csr(rng, n_user, n_item, p=0.2):
    m = (rng.random((n_user, n_item)) < p).astype(np.float32)
    return sp.csr_matrix(m)


def test_normalized_blocks_match_full_adjacency(rng):
    """N equals the user-item block of D^-1/2 A D^-1/2 on the full graph."""
    n_user, n_item = 12, 9
    csr = random_csr(rng, n_user, n_item)
    r = np.asarray(csr.todense())
    n = n_user + n_item
    a = np.zeros((n, n), dtype=np.float64)
    a[:n_user, n_user:] = r
    a[n_user:, :n_user] = r.T
    deg = a.sum(axis=1)
    dinv = np.power(deg + 1e-9, -0.5)
    dinv[np.isinf(dinv)] = 0.0
    a_hat = (a * dinv[:, None]) * dinv[None, :]
    n_mat = normalized_bipartite_blocks(csr)
    np.testing.assert_allclose(n_mat, a_hat[:n_user, n_user:], rtol=1e-5)


def test_propagation_matches_dense_adjacency(rng):
    """Block propagation == A_hat @ E on the stacked embedding, per layer."""
    n_user, n_item, d, k = 10, 8, 6, 3
    csr = random_csr(rng, n_user, n_item)
    n_mat = jnp.asarray(normalized_bipartite_blocks(csr))
    e_u = jnp.asarray(rng.standard_normal((n_user, d)).astype(np.float32))
    e_i = jnp.asarray(rng.standard_normal((n_item, d)).astype(np.float32))

    # dense oracle
    nm = np.asarray(n_mat)
    n = n_user + n_item
    a_hat = np.zeros((n, n), dtype=np.float32)
    a_hat[:n_user, n_user:] = nm
    a_hat[n_user:, :n_user] = nm.T
    e = np.concatenate([np.asarray(e_u), np.asarray(e_i)])
    layers = [e]
    for _ in range(k):
        layers.append(a_hat @ layers[-1])
    mean = np.mean(layers, axis=0)

    fu, fi = propagate(e_u, e_i, n_mat, k)
    np.testing.assert_allclose(np.asarray(fu), mean[:n_user], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fi), mean[n_user:], rtol=1e-4, atol=1e-5)


def test_bpr_loss_prefers_positive():
    u = jnp.ones((4, 8))
    pos = jnp.ones((4, 8))
    neg = -jnp.ones((4, 8))
    loss_good, _ = bpr_loss(u, pos, neg, u, pos, neg, 4)
    loss_bad, _ = bpr_loss(u, neg, pos, u, neg, pos, 4)
    assert float(loss_good) < float(loss_bad)


def test_sample_bpr_batch_validity(rng):
    csr = random_csr(rng, 30, 20, p=0.3)
    users, pos, neg = sample_bpr_batch(rng, csr, 16)
    dense = np.asarray(csr.todense())
    for u, p, n in zip(users, pos, neg):
        if dense[u].sum() > 0:
            assert dense[u, p] == 1
            assert dense[u, n] == 0


def test_pretrain_smoke(rng):
    train = random_csr(rng, 24, 16, p=0.3)
    test = random_csr(rng, 24, 16, p=0.1)
    logs = []
    result = pretrain(train, test, n_layers=2, latent_dim=8, epochs=2,
                      batch_size=8, k=5, log=logs.append)
    assert result.final_user.shape == (24, 8)
    assert result.final_item.shape == (16, 8)
    assert len(logs) == 2
