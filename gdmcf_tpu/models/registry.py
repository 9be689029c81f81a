"""Backbone registry — the reference's 8-way construction switch
(``/root/reference/main.py:212-256``) as a config-driven factory."""

from __future__ import annotations

from gdmcf_tpu.models.backbones import (
    ModelDef,
    dnn,
    dnn_cat,
    dnn_cat2,
    dnn_conti,
    dnn_lightgcn,
    dnn_one_hot,
    dnn_one_hot_embedding,
    dnn_one_hot_embedding_gcn,
    dnn_transformer,
)

BACKBONES = (
    "DNN",
    "DNN_conti",
    "DNNCat",
    "DNNCat2",
    "DNNOneHot",
    "DNNOneHotTransformer",
    "DNNOneHotEmbedding",
    "DNNOneHotEmbedding_conti",
    "DNNOneHotEmbeddingGCN",
    "DNNOneHotEmbeddingGCN_conti",
    "lightGCN",
)


def build_model(cfg, n_user: int, n_item: int, train_csr=None,
                mesh=None) -> ModelDef:
    """train_csr: training interaction matrix; used by the lightGCN backbone
    to propagate its link-filter embeddings over the frozen train graph
    (reference main.py:221-235 builds e_f from train_data pre-model).
    mesh: optional (dp, mp) device mesh — the embedding backbones switch
    their user-table gather to the row-sharded shard_map lookup when mp>1."""
    in_dims = cfg.in_dims(n_item)
    out_dims = cfg.out_dims(n_item)
    common = dict(norm=cfg.norm, dropout_rate=cfg.dropout)
    # corrected mode guards the cosine head's denominator (a zero-norm user
    # vector or item row NaNs the whole score matrix in the reference)
    emb_kw = dict(cosine_eps=0.0 if cfg.fidelity else 1e-8, mesh=mesh)
    b = cfg.backbone
    if b == "DNN":
        return dnn(in_dims, out_dims, cfg.emb_size, **common)
    if b == "DNN_conti":
        return dnn_conti(in_dims, out_dims, cfg.emb_size, n_item, n_user,
                         **common)
    if b == "DNNCat":
        return dnn_cat(in_dims, out_dims, cfg.emb_size, **common)
    if b == "DNNCat2":
        return dnn_cat2(in_dims, out_dims, cfg.emb_size, **common)
    if b == "DNNOneHot":
        return dnn_one_hot(in_dims, out_dims, cfg.emb_size, **common)
    if b == "DNNOneHotTransformer":
        return dnn_transformer(in_dims, out_dims, cfg.emb_size, **common)
    if b == "DNNOneHotEmbedding":
        return dnn_one_hot_embedding(in_dims, out_dims, cfg.emb_size,
                                     n_item, n_user, **common, **emb_kw)
    if b == "DNNOneHotEmbedding_conti":
        return dnn_one_hot_embedding(in_dims, out_dims, cfg.emb_size,
                                     n_item, n_user, conti=True,
                                     **common, **emb_kw)
    if b == "DNNOneHotEmbeddingGCN":
        return dnn_one_hot_embedding_gcn(
            in_dims, out_dims, cfg.emb_size, n_item, n_user,
            gcn_layer_num=cfg.gcnLayerNum, noise_type=cfg.noise_type,
            symmetric_gcn=cfg.symmetric_gcn, **common, **emb_kw)
    if b == "DNNOneHotEmbeddingGCN_conti":
        return dnn_one_hot_embedding_gcn(
            in_dims, out_dims, cfg.emb_size, n_item, n_user,
            gcn_layer_num=cfg.gcnLayerNum, noise_type=cfg.noise_type,
            symmetric_gcn=cfg.symmetric_gcn, conti=True, **common, **emb_kw)
    if b == "lightGCN":
        norm_adj, sparse_adj = None, None
        if train_csr is not None:
            # dense normalized blocks for moderate catalogs (MXU-optimal);
            # hybrid tile+COO once the dense [n_user, n_item] would be large
            # (the hybrid format degrades gracefully on unclustered graphs —
            # stragglers go to the COO remainder instead of raising)
            from gdmcf_tpu.models import lightgcn as _lg

            if n_user * n_item * 4 > _lg._DENSE_LIMIT_BYTES:
                import jax

                from gdmcf_tpu.models.lightgcn import normalized_bipartite_hybrid
                interp = jax.default_backend() != "tpu"  # Pallas needs a chip
                sparse_adj = (normalized_bipartite_hybrid(train_csr), interp)
            else:
                from gdmcf_tpu.models.lightgcn import normalized_bipartite_blocks
                norm_adj = normalized_bipartite_blocks(train_csr)
        return dnn_lightgcn(in_dims, out_dims, cfg.emb_size,
                            n_user, n_item, norm_adj=norm_adj,
                            sparse_adj=sparse_adj, **common)
    raise ValueError(f"not implemented backbone: {b}")

