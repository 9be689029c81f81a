"""LightGCN embedding pretrainer — the reference's standalone script
(``/root/reference/lightGCN.py``) as a first-class module.

The reference builds a sparse normalized adjacency and iterates
``torch.sparse.mm`` (ref lightGCN.py:145-194). On TPU the bipartite structure
factors the propagation into two dense block matmuls per layer:

    N   = D_u^{-1/2} R D_i^{-1/2}          (R = user x item interactions)
    u'  = N  @ e_items,   i' = N^T @ e_users

which is exactly ``A_hat @ E`` restricted to the off-diagonal blocks (the
diagonal blocks of the bipartite adjacency are zero). Final embeddings are the
mean over layers 0..K (ref :180-194). Training is BPR with L2 regularization
(ref bpr_loss :207-219) under jitted Adam; negative sampling stays host-side
(the reference's rejection loop, vectorized with numpy).

The large/sharded regime uses the same propagation with the Pallas SpMM
(ops/spmm.py) in place of the dense blocks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from gdmcf_tpu.models.layers import xavier_uniform


def normalized_bipartite_blocks(train_csr: sp.spmatrix,
                                eps: float = 1e-9) -> np.ndarray:
    """N = D_u^{-1/2} R D_i^{-1/2} as a dense [n_user, n_item] float32 matrix.

    Degree epsilon matches the reference (ref lightGCN.py:159-161).
    """
    r = np.asarray(train_csr.todense(), dtype=np.float32)
    deg_u = r.sum(axis=1)
    deg_i = r.sum(axis=0)
    du = np.power(deg_u + eps, -0.5)
    di = np.power(deg_i + eps, -0.5)
    du[np.isinf(du)] = 0.0
    di[np.isinf(di)] = 0.0
    return (r * du[:, None]) * di[None, :]


def propagate(e_user: jnp.ndarray, e_item: jnp.ndarray, n_mat: jnp.ndarray,
              n_layers: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-layer propagation, mean over layers 0..K (ref :180-194)."""
    us, its = [e_user], [e_item]
    u, i = e_user, e_item
    for _ in range(n_layers):
        u, i = n_mat @ i, n_mat.T @ u
        us.append(u)
        its.append(i)
    return (sum(us) / (n_layers + 1), sum(its) / (n_layers + 1))


def bpr_loss(users_emb, pos_emb, neg_emb, user0, pos0, neg0,
             batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BPR + L2 on the layer-0 embeddings (ref bpr_loss :207-219)."""
    reg = 0.5 * ((user0 ** 2).sum() + (pos0 ** 2).sum()
                 + (neg0 ** 2).sum()) / batch_size
    pos_scores = (users_emb * pos_emb).sum(axis=1)
    neg_scores = (users_emb * neg_emb).sum(axis=1)
    loss = jax.nn.softplus(neg_scores - pos_scores).mean()
    return loss, reg


def sample_bpr_batch(rng: np.random.Generator, train_csr: sp.spmatrix,
                     batch_size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side (user, pos, neg) triples; rejection-sampled negatives."""
    n_user, n_item = train_csr.shape
    if n_user < batch_size:
        users = rng.integers(0, n_user, batch_size)
    else:
        users = rng.choice(n_user, batch_size, replace=False)
    users.sort()
    indptr, indices = train_csr.indptr, train_csr.indices
    pos = np.empty(batch_size, dtype=np.int64)
    neg = np.empty(batch_size, dtype=np.int64)
    for k, u in enumerate(users):
        items = indices[indptr[u]:indptr[u + 1]]
        if len(items) == 0:
            pos[k] = rng.integers(n_item)
            neg[k] = rng.integers(n_item)
            continue
        pos[k] = rng.choice(items)
        iset = set(items.tolist())
        while True:
            cand = rng.integers(n_item)
            if cand not in iset:
                neg[k] = cand
                break
    return users, pos, neg


class LightGCNResult(NamedTuple):
    final_user: np.ndarray
    final_item: np.ndarray
    initial_user: np.ndarray
    initial_item: np.ndarray


def pretrain(train_csr: sp.spmatrix, test_csr: sp.spmatrix,
             n_layers: int = 3, latent_dim: int = 64, epochs: int = 30,
             batch_size: int = 1024, lr: float = 0.005, decay: float = 1e-4,
             k: int = 10, seed: int = 0, log=print) -> LightGCNResult:
    """Full pretraining loop (ref lightGCN.py:253-365): Adam + BPR, per-epoch
    Recall/Precision/NDCG/MAP@k eval, returns the 4 embedding matrices the
    reference saves as .pt files (ref :320-323)."""
    from gdmcf_tpu.ops.metrics import compute_topn_accuracy

    n_user, n_item = train_csr.shape
    key = jax.random.PRNGKey(seed)
    e0 = xavier_uniform(key, (n_user + n_item, latent_dim))
    # n_mat rides as a jit ARGUMENT — closing over it would embed the dense
    # [n_user, n_item] block as a program constant (oversized compile payloads)
    n_mat = jnp.asarray(normalized_bipartite_blocks(train_csr))
    tx = optax.adam(lr)
    opt_state = tx.init(e0)
    rng = np.random.default_rng(seed)
    steps_per_epoch = max(n_user // batch_size, 1)

    @jax.jit
    def train_step(e0, opt_state, n_mat, users, pos, neg):
        def loss_fn(e0):
            fu, fi = propagate(e0[:n_user], e0[n_user:], n_mat, n_layers)
            loss, reg = bpr_loss(fu[users], fi[pos], fi[neg],
                                 e0[users], e0[n_user + pos], e0[n_user + neg],
                                 users.shape[0])
            return loss + decay * reg
        loss, grads = jax.value_and_grad(loss_fn)(e0)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(e0, updates), opt_state, loss

    @jax.jit
    def full_embeddings(e0, n_mat):
        return propagate(e0[:n_user], e0[n_user:], n_mat, n_layers)

    train_mask = np.asarray(train_csr.todense(), dtype=np.float32)
    test_gt = np.asarray(test_csr.todense(), dtype=np.float32)

    best_ndcg = -1.0
    best = None
    for epoch in range(epochs):
        total = 0.0
        for _ in range(steps_per_epoch):
            users, pos, neg = sample_bpr_batch(rng, train_csr, batch_size)
            e0, opt_state, loss = train_step(e0, opt_state, n_mat,
                                             jnp.asarray(users),
                                             jnp.asarray(pos),
                                             jnp.asarray(neg))
            total += float(loss)
        fu, fi = full_embeddings(e0, n_mat)
        scores = np.array(fu @ fi.T)  # writable host copy
        scores[train_mask > 0] = -np.inf
        pred = np.argsort(-scores, axis=1)[:, :k]
        _, recall, ndcg, _ = compute_topn_accuracy(test_gt, pred, [k])
        log(f"epoch {epoch}: loss {total / steps_per_epoch:.4f} "
            f"recall@{k} {recall[0]:.4f} ndcg@{k} {ndcg[0]:.4f}")
        if ndcg[0] > best_ndcg:
            best_ndcg = ndcg[0]
            best = LightGCNResult(
                final_user=np.asarray(fu), final_item=np.asarray(fi),
                initial_user=np.asarray(e0[:n_user]),
                initial_item=np.asarray(e0[n_user:]))
    return best


def save_embeddings(result: LightGCNResult, out_dir: str) -> None:
    """Persist the 4 matrices (npz instead of torch .pt; same contents)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "lightgcn_embeddings.npz"),
             final_user_Embed=result.final_user,
             final_item_Embed=result.final_item,
             initial_user_Embed=result.initial_user,
             initial_item_Embed=result.initial_item)
