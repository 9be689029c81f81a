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

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from gdmcf_tpu.models.layers import xavier_uniform

# dense [n_user, n_item] blocks above this switch pretrain to sparse
# propagation and disable the dense ranking eval (module-level so tests can
# exercise the guard without materializing a 2 GiB matrix)
_DENSE_LIMIT_BYTES = 2 << 30


def normalized_bipartite_blocks(train_csr: sp.spmatrix,
                                eps: float = 1e-9) -> np.ndarray:
    """N = D_u^{-1/2} R D_i^{-1/2} as a dense [n_user, n_item] float32 matrix.

    Degree epsilon matches the reference (ref lightGCN.py:159-161).
    """
    r = train_csr.astype(np.float32).toarray()
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


def _normalized_sparse_n(train_csr: sp.spmatrix, eps: float,
                         degree_sort: bool):
    r = train_csr.tocsr().astype(np.float32)
    deg_u = np.asarray(r.sum(axis=1)).ravel()
    deg_i = np.asarray(r.sum(axis=0)).ravel()
    du = np.power(deg_u + eps, -0.5)
    di = np.power(deg_i + eps, -0.5)
    du[np.isinf(du)] = 0.0
    di[np.isinf(di)] = 0.0
    n = sp.diags(du) @ r @ sp.diags(di)
    perms = None
    if degree_sort:
        from gdmcf_tpu.ops.spmm import degree_sort_permutation
        row_perm, col_perm = degree_sort_permutation(n)
        n = n.tocsr()[row_perm][:, col_perm]
        perms = (row_perm, col_perm)
    return n, perms


def normalized_bipartite_sparse(train_csr: sp.spmatrix, br: int = 128,
                                bc: int = 128, eps: float = 1e-9,
                                max_bytes: int = 8 << 30,
                                degree_sort: bool = False):
    """O(nnz) sparse N = D_u^{-1/2} R D_i^{-1/2} as ONE BlockSparse (the
    CSC view inside it serves the N^T direction — no transposed copy).

    The scale path of ``normalized_bipartite_blocks``: nothing
    [n_user, n_item]-dense ever materializes (at the 10M x 1M BASELINE target
    the dense matrix is 40 TB). Replaces the reference's
    ``torch.sparse.mm`` propagation operand (ref lightGCN.py:145-178).

    ``degree_sort=True`` additionally returns (row_perm, col_perm) and builds
    the blocks over the permuted graph — power-law graphs need this for tile
    fill (see ops/spmm.degree_sort_permutation); embeddings must be permuted
    to match and un-permuted afterwards.
    """
    from gdmcf_tpu.ops.spmm import to_block_sparse

    n, perms = _normalized_sparse_n(train_csr, eps, degree_sort)
    n_bs = to_block_sparse(n, br, bc, max_bytes)
    return (n_bs, perms) if degree_sort else n_bs


def normalized_bipartite_hybrid(train_csr: sp.spmatrix, br: int = 8,
                                bc: int = 128, min_fill: int = 4,
                                eps: float = 1e-9,
                                max_bytes: int = 8 << 30,
                                degree_sort: bool = False):
    """Hybrid tile+COO normalized adjacency (ops/spmm.HybridSparse) — the
    low-fill large-graph regime where even thin block tiles waste memory.
    Same normalization as normalized_bipartite_sparse."""
    from gdmcf_tpu.ops.spmm import to_hybrid

    n, perms = _normalized_sparse_n(train_csr, eps, degree_sort)
    h = to_hybrid(n, br=br, bc=bc, min_fill=min_fill, max_bytes=max_bytes)
    return (h, perms) if degree_sort else h


def propagate_hybrid(e_user: jnp.ndarray, e_item: jnp.ndarray,
                     meta, arrays, n_layers: int,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``propagate`` on the hybrid tile+COO operand (differentiable).

    The same N serves both directions: A@x via the kept tiles + remainder,
    A^T@x via transpose=True (swapped tile pair, swapped COO indices).
    """
    from gdmcf_tpu.ops.spmm import hybrid_spmm

    n_user, n_item = e_user.shape[0], e_item.shape[0]
    us, its = [e_user], [e_item]
    u, i = e_user, e_item
    for _ in range(n_layers):
        u, i = (hybrid_spmm(meta, arrays, i, transpose=False,
                            interpret=interpret)[:n_user],
                hybrid_spmm(meta, arrays, u, transpose=True,
                            interpret=interpret)[:n_item])
        us.append(u)
        its.append(i)
    return (sum(us) / (n_layers + 1), sum(its) / (n_layers + 1))


def propagate_sparse(e_user: jnp.ndarray, e_item: jnp.ndarray,
                     meta, arrays, n_layers: int, interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``propagate`` on the Pallas block-sparse kernel (differentiable).

    meta/arrays: the single N operand from ``normalized_bipartite_sparse``
    (split with ops.spmm.block_sparse_meta / block_sparse_arrays so the
    matrix rides as jit arguments); the N^T direction runs on the same tile
    storage via the kernel's CSC view (transpose=True).
    """
    from gdmcf_tpu.ops.spmm import spmm_op

    n_user, n_item = e_user.shape[0], e_item.shape[0]
    us, its = [e_user], [e_item]
    u, i = e_user, e_item
    for _ in range(n_layers):
        u, i = (spmm_op(meta, False, interpret, arrays, i)[:n_user],
                spmm_op(meta, True, interpret, arrays, u)[:n_item])
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


def _choose_users(rng: np.random.Generator, n_user: int,
                  batch_size: int) -> np.ndarray:
    """Sorted user sample (with replacement only when the population is
    smaller than the batch) — shared by both BPR samplers."""
    if n_user < batch_size:
        users = rng.integers(0, n_user, batch_size)
    else:
        users = rng.choice(n_user, batch_size, replace=False)
    users.sort()
    return users


def sample_bpr_batch(rng: np.random.Generator, train_csr: sp.spmatrix,
                     batch_size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side (user, pos, neg) triples; rejection-sampled negatives.

    Pure-numpy reference implementation; the production pretrain loop uses
    the C++ engine via NativeCSR.sample_bpr (same semantics, ~1700x faster
    at 1M users — see pretrain())."""
    n_user, n_item = train_csr.shape
    deg = np.diff(train_csr.indptr)
    if deg.size and int(deg.max()) >= n_item:
        raise ValueError(
            "BPR negative sampling impossible: some user interacted with "
            f"all {n_item} items (the rejection loop would never exit)")
    users = _choose_users(rng, n_user, batch_size)
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
             k: int = 10, seed: int = 0, log=print,
             sparse: "bool | None" = None, block_size: int = 128,
             block_rows: "int | None" = None,
             spmm_interpret: bool = False,
             evaluate: bool = True,
             steps_per_epoch: "int | None" = None) -> LightGCNResult:
    """Full pretraining loop (ref lightGCN.py:253-365): Adam + BPR, per-epoch
    Recall/Precision/NDCG/MAP@k eval, returns the 4 embedding matrices the
    reference saves as .pt files (ref :320-323).

    ``sparse``: propagate on the Pallas block-CSR SpMM instead of the dense
    normalized blocks (the large-graph path — the reference's
    ``torch.sparse.mm``, lightGCN.py:176-194). ``None`` auto-selects sparse
    once the dense [n_user, n_item] matrix would exceed 2 GiB; the string
    ``"hybrid"`` uses the tile+COO-remainder format (ops/spmm.HybridSparse)
    for low-fill graphs.
    ``evaluate=False`` skips the dense-scoring eval (mandatory at scales where
    the [n_user, n_item] score matrix cannot materialize; returns the final,
    not best-NDCG, embeddings).
    ``steps_per_epoch``: optimizer steps per epoch. ``None`` (default) uses
    the reference's interactions-based budget ``len(train) // batch_size``
    (ref lightGCN.py:275 — ``train`` there is the interaction DataFrame, so
    ``n_batch`` counts nnz, not users). Rounds 1-3 of this repo mistakenly
    used ``n_user // batch_size`` — roughly ``avg_degree``x fewer Adam steps
    per epoch, which made the lightgcn_parity tail-BPR-loss gate fail (see
    docs/PARITY.md, LightGCN pretrainer section); pass an explicit value to
    reproduce those runs or to bound wall-time at scale benchmarks.
    """
    from gdmcf_tpu.ops.metrics import lightgcn_topn_metrics

    if sparse not in (None, True, False, "hybrid"):
        # any other truthy string would silently fall through to the
        # block-CSR path — a typo'd format name must fail, not misroute
        raise ValueError(f"sparse={sparse!r}: expected None, True, False, "
                         "or 'hybrid'")
    n_user, n_item = train_csr.shape
    key = jax.random.PRNGKey(seed)
    e0 = xavier_uniform(key, (n_user + n_item, latent_dim))
    dense_bytes = n_user * n_item * 4
    if sparse is None:
        sparse = dense_bytes > _DENSE_LIMIT_BYTES
    if evaluate and dense_bytes > _DENSE_LIMIT_BYTES:
        # the eval path materializes train/test dense masks AND the
        # [n_user, n_item] score matrix — impossible at the scales that
        # force sparse propagation; fall back to loss-only training
        import warnings
        warnings.warn(
            f"pretrain: disabling the dense ranking eval at {n_user} x "
            f"{n_item} (score matrix alone would be "
            f"{dense_bytes / 2**30:.1f} GiB); returning final (not "
            "best-NDCG) embeddings", stacklevel=2)
        evaluate = False
    # propagation operands ride as jit ARGUMENTS — closing over them would
    # embed the whole adjacency as a program constant (oversized compiles)
    if sparse == "hybrid":
        from gdmcf_tpu.ops.spmm import hybrid_arrays, hybrid_meta
        h = normalized_bipartite_hybrid(train_csr,
                                        br=block_rows or 8, bc=block_size)
        h_meta = hybrid_meta(h)
        prop_args = hybrid_arrays(h)

        def prop(e0, prop_args):
            return propagate_hybrid(e0[:n_user], e0[n_user:], h_meta,
                                    prop_args, n_layers,
                                    interpret=spmm_interpret)
    elif sparse:
        from gdmcf_tpu.ops.spmm import block_sparse_arrays, block_sparse_meta
        n_bs = normalized_bipartite_sparse(
            train_csr, br=block_rows or block_size, bc=block_size)
        n_meta = block_sparse_meta(n_bs)
        prop_args = block_sparse_arrays(n_bs)

        def prop(e0, prop_args):
            return propagate_sparse(e0[:n_user], e0[n_user:], n_meta,
                                    prop_args, n_layers,
                                    interpret=spmm_interpret)
    else:
        prop_args = jnp.asarray(normalized_bipartite_blocks(train_csr))

        def prop(e0, prop_args):
            return propagate(e0[:n_user], e0[n_user:], prop_args, n_layers)

    tx = optax.adam(lr)
    opt_state = tx.init(e0)
    rng = np.random.default_rng(seed)
    if steps_per_epoch is None:
        steps_per_epoch = max(int(train_csr.nnz) // batch_size, 1)
    # (user, pos, neg) sampling rides the C++ engine (numpy fallback inside
    # NativeCSR.sample_bpr): the pure-numpy rejection loop costs ~0.9 s per
    # 65k-triple batch at the 1M-user geometry — more than half the whole
    # BPR step
    from gdmcf_tpu.data.native import NativeCSR
    # strict=False: BPR consumes interaction MEMBERSHIP (pos/neg item
    # sets), so count-valued cells binarizing here is the intended
    # semantics, as in the reference's interaction-list sampling
    ncsr = NativeCSR.from_scipy(train_csr, strict=False)

    def sample(batch_size):
        users = _choose_users(rng, n_user, batch_size)
        pos, neg = ncsr.sample_bpr(users, int(rng.integers(2 ** 62)))
        return users, pos, neg

    # donate the table + moments: at the 1M x 200k pretrain geometry the
    # [n_user+n_item, 64] f32 table and two Adam moment trees are GBs;
    # without donation XLA double-buffers them every step (the main
    # trainer donates its state for the same reason, trainer.py)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(e0, opt_state, prop_args, users, pos, neg):
        def loss_fn(e0):
            fu, fi = prop(e0, prop_args)
            loss, reg = bpr_loss(fu[users], fi[pos], fi[neg],
                                 e0[users], e0[n_user + pos], e0[n_user + neg],
                                 users.shape[0])
            return loss + decay * reg
        loss, grads = jax.value_and_grad(loss_fn)(e0)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(e0, updates), opt_state, loss

    @jax.jit
    def full_embeddings(e0, prop_args):
        return prop(e0, prop_args)

    if evaluate:
        train_mask = train_csr.astype(np.float32).toarray()
        test_gt = test_csr.astype(np.float32).toarray()

    best_ndcg = -1.0
    best = None
    for epoch in range(epochs):
        losses = []
        for _ in range(steps_per_epoch):
            users, pos, neg = sample(batch_size)
            e0, opt_state, loss = train_step(e0, opt_state, prop_args,
                                             jnp.asarray(users),
                                             jnp.asarray(pos),
                                             jnp.asarray(neg))
            # keep the DEVICE scalar: float(loss) here would block every
            # step on the dispatch round-trip (~25 ms on the relay — at the
            # interactions-based budget that is tens of seconds/epoch of
            # pure RTT) and stop host-side BPR sampling from overlapping
            # the device step
            losses.append(loss)
        total = float(jnp.stack(losses).sum())
        if not evaluate:
            log(f"epoch {epoch}: loss {total / steps_per_epoch:.4f}")
            continue
        fu, fi = full_embeddings(e0, prop_args)
        scores = np.array(fu @ fi.T)  # writable host copy
        scores[train_mask > 0] = -np.inf
        # argpartition + small sort: a full per-row argsort of the
        # [n_user, n_item] matrix costs O(n log n) per row per epoch for
        # the same top-k set
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        order = np.argsort(np.take_along_axis(-scores, part, axis=1), axis=1)
        pred = np.take_along_axis(part, order, axis=1)
        # the reference pretrainer's eval protocol (ref lightGCN.py:67-127):
        # natural-log NDCG, MAP@K, means over test users only
        recall, precision, ndcg, map_k = lightgcn_topn_metrics(
            test_gt, pred, k)
        log(f"epoch {epoch}: loss {total / steps_per_epoch:.4f} "
            f"recall@{k} {recall:.4f} precision@{k} {precision:.4f} "
            f"ndcg@{k} {ndcg:.4f} map@{k} {map_k:.4f}")
        if ndcg > best_ndcg:
            best_ndcg = ndcg
            best = LightGCNResult(
                final_user=np.asarray(fu), final_item=np.asarray(fi),
                initial_user=np.asarray(e0[:n_user]),
                initial_item=np.asarray(e0[n_user:]))
    if best is None:  # evaluate=False: final embeddings, no selection
        fu, fi = full_embeddings(e0, prop_args)
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
