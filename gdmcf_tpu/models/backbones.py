"""Denoiser backbones — every model family of the reference, TPU-native.

Parity map (reference ``/root/reference/models/DNN.py``):
  dnn()                         <- DNN                    (:11-88)
  dnn_cat()                     <- DNNCat                 (:180-265)
  dnn_cat2()                    <- DNNCat2                (:268-358)
  dnn_one_hot()                 <- DNNOneHot              (:360-477)
  dnn_one_hot_embedding()       <- DNNOneHotEmbedding     (:510-681)
  dnn_one_hot_embedding(conti)  <- DNNOneHotEmbedding_conti (:683-853)
  dnn_one_hot_embedding_gcn()   <- DNNOneHotEmbeddingGCN  (:1105-1327) [default]
  dnn_one_hot_embedding_gcn(conti) <- DNNOneHotEmbeddingGCN_conti (:855-1043)
  dnn_transformer()             <- DNNOneHotTransformer   (:1585-1707)
  dnn_lightgcn()                <- DNNlightGCN            (:1709-1804)

All applies share one signature:
    apply(params, x, t, x_U=None, index=None, graph=None,
          rcloss=False, train=False, rng=None) -> (out, closs_or_None)

Design notes (differences from the reference that are deliberate TPU moves):
  * The Embedding/GCN variants construct ``out_layers`` in the reference but
    never execute them (ref DNN.py:648-652, 1295-1299); we do not allocate
    those dead parameters (documented divergence: params that receive no
    gradients and appear in no forward pass).
  * The batch graph rides as the dense one-hot ``graph [B, n, 2]``; the GCN is
    the dense-masked bipartite conv from ``models/gcn.py`` — numerically
    equivalent to GCNConv over the dynamic edge_index, but static-shape.
  * ``DNNlightGCN``'s per-edge ``predict_link`` filter (ref :1776-1784) is
    reformulated densely: score every (user,item) cell once with one matmul and
    mask the batch matrix — identical output, no dynamic shapes.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional, Tuple

import math

import jax
import jax.numpy as jnp

from gdmcf_tpu.models.gcn import (layer_gcn_apply, layer_gcn_init,
                                  layer_gcn_user_rows)
from gdmcf_tpu.models.layers import (
    cosine_scores,
    dropout,
    l2_normalize,
    linear,
    linear_init,
    mlp_init,
    mlp_out,
    mlp_tanh,
    nt_xent_loss,
    timestep_embedding,
    xavier_uniform,
)


class ModelDef(NamedTuple):
    init: Callable[[jax.Array], dict]
    apply: Callable[..., Tuple[jnp.ndarray, Optional[jnp.ndarray]]]
    needs_onehot: bool   # reference CatOneHot: model takes x_U
    needs_index: bool    # reference diffusion.indexIn: model takes index/graph
    # apply dereferences ``graph`` unconditionally (the GCN family, ref
    # DNN.py:1241 does graph.argmax with no None check). The degenerate
    # noise_scale==0 reverse path has no graph to pass — the reference
    # crashes there (model(x_t, t, x_tU) at :699 -> AttributeError on
    # None); the Trainer refuses the combination loudly at construction.
    needs_graph: bool = False


def _tower_dims(in_dims: List[int], emb_size: int) -> List[int]:
    """in_dims_temp: prepend time-embedding width to the first layer."""
    return [in_dims[0] + emb_size] + list(in_dims[1:])


def _split(rng, n):
    return list(jax.random.split(rng, n)) if rng is not None else [None] * n


def _make_user_lookup(mesh, user_num: int):
    """User-table row gather, mesh-aware (SURVEY.md §2.3 row 3).

    Without a model-parallel mesh: plain replicated gather. With mesh_mp > 1
    and an evenly mp-shardable table: the shard_map lookup from
    parallel/embed.py — each chip gathers only rows it owns and [B, D] is all
    that crosses the ICI, so a 10M-user table is never replicated or
    all-gathered. Falls back to the plain gather (and whatever GSPMD decides)
    when the table rows don't divide the mesh axis.
    """
    mp = mesh.shape.get("mp", 1) if mesh is not None else 1
    if mesh is None or mp <= 1 or user_num % mp != 0:
        return lambda table, index: table[index]

    from gdmcf_tpu.parallel.embed import sharded_embedding_lookup

    dp = mesh.shape.get("dp", 1)

    def lookup(table, index):
        batch_axis = "dp" if dp > 1 and index.shape[0] % dp == 0 else None
        return sharded_embedding_lookup(mesh, table, index,
                                        batch_axis=batch_axis)

    return lookup


# ---------------------------------------------------------------------------
# DNN — plain MLP denoiser
# ---------------------------------------------------------------------------

def dnn(in_dims: List[int], out_dims: List[int], emb_size: int,
        norm: bool = False, dropout_rate: float = 0.5) -> ModelDef:
    assert out_dims[0] == in_dims[-1], "In and out dimensions must equal to each other."
    in_t = _tower_dims(in_dims, emb_size)

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "emb_layer": linear_init(k1, emb_size, emb_size),
            "in_layers": mlp_init(k2, in_t),
            "out_layers": mlp_init(k3, out_dims),
        }

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        (k_drop,) = _split(rng, 1)
        emb = linear(p["emb_layer"], timestep_embedding(t, emb_size))
        if norm:
            x = l2_normalize(x)
        x = dropout(k_drop, x, dropout_rate, train)
        h = jnp.concatenate([x, emb], axis=-1)
        h = mlp_tanh(p["in_layers"], h)
        h = mlp_out(p["out_layers"], h)
        return h, None

    return ModelDef(init, apply, needs_onehot=False, needs_index=False)


def dnn_conti(in_dims, out_dims, emb_size, item_num, user_num,
              norm=False, dropout_rate=0.5) -> ModelDef:
    """DNN_conti (ref :90-177): the plain DNN forward plus unused embedding
    tables — experiment residue kept for inventory/param parity. The tables
    are allocated (they ARE parameters in the reference) but, exactly like
    the reference, never used in the forward pass."""
    assert out_dims[0] == in_dims[-1]
    in_t = _tower_dims(in_dims, emb_size)
    d_user = in_t[-1]
    d_item = in_t[-1] + d_user

    def init(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return {
            "emb_layer": linear_init(k1, emb_size, emb_size),
            "in_layers": mlp_init(k2, in_t),
            "out_layers": mlp_init(k3, out_dims),
            "embedding_item": xavier_uniform(k4, (item_num, d_item)),
            "embedding_user": xavier_uniform(k5, (user_num, d_user)),
        }

    base = dnn(in_dims, out_dims, emb_size, norm, dropout_rate)

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        return base.apply(p, x, t, x_U, index=index, graph=graph,
                          rcloss=rcloss, train=train, rng=rng)

    return ModelDef(init, apply, needs_onehot=False, needs_index=False)


# ---------------------------------------------------------------------------
# DNNCat / DNNCat2 — fuse continuous x with one-hot x_U before the MLP
# ---------------------------------------------------------------------------

def dnn_cat(in_dims, out_dims, emb_size, norm=False, dropout_rate=0.5,
            cat_dim: int = 2) -> ModelDef:
    assert out_dims[0] == in_dims[-1]
    in_t = _tower_dims(in_dims, emb_size)

    def init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "emb_layer": linear_init(k1, emb_size, emb_size),
            "cat_layer": linear_init(k2, cat_dim + 1, 1),
            "in_layers": mlp_init(k3, in_t),
            "out_layers": mlp_init(k4, out_dims),
        }

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        (k_drop,) = _split(rng, 1)
        # per-item 3 -> 1 linear over [x, x_U0, x_U1] (ref DNN.py:242-249)
        xc = jnp.concatenate([x[..., None], x_U], axis=2)
        emb = linear(p["emb_layer"], timestep_embedding(t, emb_size))
        x = jnp.squeeze(linear(p["cat_layer"], xc), axis=-1)
        if norm:
            x = l2_normalize(x)
        x = dropout(k_drop, x, dropout_rate, train)
        h = jnp.concatenate([x, emb], axis=-1)
        h = mlp_tanh(p["in_layers"], h)
        h = mlp_out(p["out_layers"], h)
        return h, None

    return ModelDef(init, apply, needs_onehot=True, needs_index=False)


def dnn_cat2(in_dims, out_dims, emb_size, norm=False, dropout_rate=0.5,
             cat_dim: int = 2) -> ModelDef:
    assert out_dims[0] == in_dims[-1]
    in_t = _tower_dims(in_dims, emb_size)
    n = in_dims[0]

    def init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "emb_layer": linear_init(k1, emb_size, emb_size),
            "cat_layer": linear_init(k2, (cat_dim + 1) * n, n),
            "in_layers": mlp_init(k3, in_t),
            "out_layers": mlp_init(k4, out_dims),
        }

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        (k_drop,) = _split(rng, 1)
        xc = jnp.concatenate([x[..., None], x_U], axis=2).reshape(x.shape[0], -1)
        emb = linear(p["emb_layer"], timestep_embedding(t, emb_size))
        x = jnp.tanh(linear(p["cat_layer"], xc))
        if norm:
            x = l2_normalize(x)
        x = dropout(k_drop, x, dropout_rate, train)
        h = jnp.concatenate([x, emb], axis=-1)
        # DNNCat2 uses relu in both stacks (ref DNN.py:349-356)
        for lp in p["in_layers"]:
            h = jax.nn.relu(linear(lp, h))
        h = mlp_out(p["out_layers"], h, act=jax.nn.relu)
        return h, None

    return ModelDef(init, apply, needs_onehot=True, needs_index=False)


# ---------------------------------------------------------------------------
# DNNOneHot — two-tower MLP, concat heads -> out_layers
# ---------------------------------------------------------------------------

def dnn_one_hot(in_dims, out_dims, emb_size, norm=False,
                dropout_rate=0.5) -> ModelDef:
    assert out_dims[0] == in_dims[-1]
    in_t = _tower_dims(in_dims, emb_size)
    in_dims2 = [in_dims[0] * 2] + list(in_dims[1:])
    in_t2 = _tower_dims(in_dims2, emb_size)
    out_t = [out_dims[0] + in_dims2[-1]] + list(out_dims[1:])

    def init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "emb_layer": linear_init(k1, emb_size, emb_size),
            "in_layers": mlp_init(k2, in_t),
            "in_layers2": mlp_init(k3, in_t2),
            "out_layers": mlp_init(k4, out_t),
        }

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        k1, k2 = _split(rng, 2)
        x_U = x_U.reshape(x_U.shape[0], -1)
        emb = linear(p["emb_layer"], timestep_embedding(t, emb_size))
        if norm:
            x, x_U = l2_normalize(x), l2_normalize(x_U)
        x = dropout(k1, x, dropout_rate, train)
        x_U = dropout(k2, x_U, dropout_rate, train)
        h = mlp_tanh(p["in_layers"], jnp.concatenate([x, emb], axis=-1))
        h_U = mlp_tanh(p["in_layers2"], jnp.concatenate([x_U, emb], axis=-1))
        h = jnp.concatenate([h, h_U], axis=1)
        h = mlp_out(p["out_layers"], h)
        return h, None

    return ModelDef(init, apply, needs_onehot=True, needs_index=False)


# ---------------------------------------------------------------------------
# DNNOneHotEmbedding family — towers + user/item tables + cosine head (+GCN)
# ---------------------------------------------------------------------------

def dnn_one_hot_embedding(in_dims, out_dims, emb_size, item_num, user_num,
                          norm=False, dropout_rate=0.5,
                          conti: bool = False,
                          cosine_eps: float = 0.0,
                          mesh=None) -> ModelDef:
    """DNNOneHotEmbedding (ref :510-681); conti variant (ref :683-853) swaps
    the continuous tower out of the fused vector: hc = [h_U || h_U || user]."""
    assert out_dims[0] == in_dims[-1]
    user_lookup = _make_user_lookup(mesh, user_num)
    in_t = _tower_dims(in_dims, emb_size)
    in_dims2 = [in_dims[0] * 2] + list(in_dims[1:])
    in_t2 = _tower_dims(in_dims2, emb_size)
    d_user = in_t[-1]
    d_item = in_t[-1] + d_user + in_t2[-1]

    def init(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return {
            "emb_layer": linear_init(k1, emb_size, emb_size),
            "in_layers": mlp_init(k2, in_t),
            "in_layers2": mlp_init(k3, in_t2),
            "embedding_item": xavier_uniform(k4, (item_num, d_item)),
            "embedding_user": xavier_uniform(k5, (user_num, d_user)),
        }

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        k1, k2 = _split(rng, 2)
        x_U = x_U.reshape(x_U.shape[0], -1)
        emb = linear(p["emb_layer"], timestep_embedding(t, emb_size))
        if norm:
            x, x_U = l2_normalize(x), l2_normalize(x_U)
        x = dropout(k1, x, dropout_rate, train)
        x_U = dropout(k2, x_U, dropout_rate, train)
        h = mlp_tanh(p["in_layers"], jnp.concatenate([x, emb], axis=-1))
        h_U = mlp_tanh(p["in_layers2"], jnp.concatenate([x_U, emb], axis=-1))
        closs = nt_xent_loss(h, h_U) if rcloss else None
        user_vecs = user_lookup(p["embedding_user"], index)
        first = h_U if conti else h
        hc = jnp.concatenate([first, h_U, user_vecs], axis=1)
        scores = cosine_scores(hc, p["embedding_item"], eps=cosine_eps)
        return scores, closs

    # needs_index=True for BOTH variants — the class contract, not main's:
    # the reference main can't run DNNOneHotEmbedding_conti at all (it
    # passes an args kwarg the __init__ lacks, main.py:248-250, AND leaves
    # indexIn False while the forward unconditionally does index.to(...),
    # DNN.py:811). The only coherent contract is the sibling classes'
    # indexIn=True path, which is what this builder implements.
    return ModelDef(init, apply, needs_onehot=True, needs_index=True)


def dnn_one_hot_embedding_gcn(in_dims, out_dims, emb_size, item_num, user_num,
                              norm=False, dropout_rate=0.5,
                              gcn_layer_num: int = 2, noise_type: int = 0,
                              symmetric_gcn: bool = False,
                              conti: bool = False,
                              cosine_eps: float = 0.0,
                              mesh=None) -> ModelDef:
    """The flagship backbone, DNNOneHotEmbeddingGCN (ref :1105-1327).

    Towers -> NT-Xent -> fuse with user table -> dense bipartite GCN over the
    corruption graph -> learnable sumW blend -> full-catalog cosine scores.
    ``conti=True`` gives DNNOneHotEmbeddingGCN_conti (ref :855-1043): the fused
    vector uses the discrete tower twice and skips noise_type routing.
    """
    assert out_dims[0] == in_dims[-1]
    in_t = _tower_dims(in_dims, emb_size)
    in_dims2 = [in_dims[0] * 2] + list(in_dims[1:])
    in_t2 = _tower_dims(in_dims2, emb_size)
    d_user = in_t[-1]
    d_item = in_t[-1] + d_user + in_t2[-1]
    gcn_hidden = 512
    user_lookup = _make_user_lookup(mesh, user_num)

    def init(key):
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        return {
            "emb_layer": linear_init(k1, emb_size, emb_size),
            "in_layers": mlp_init(k2, in_t),
            "in_layers2": mlp_init(k3, in_t2),
            "embedding_item": xavier_uniform(k4, (item_num, d_item)),
            "embedding_user": xavier_uniform(k5, (user_num, d_user)),
            "gcn": layer_gcn_init(k6, d_item, gcn_hidden, d_item,
                                  max(gcn_layer_num, 1)),
            "sumW": jnp.asarray(1.0, dtype=jnp.float32),
        }

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        k1, k2 = _split(rng, 2)
        # graph [B, n, 2] one-hot; ct = argmax(-1) == channel 1 (ref :1217)
        g = graph[..., 1].astype(x.dtype)
        x_U = x_U.reshape(x_U.shape[0], -1)
        emb = linear(p["emb_layer"], timestep_embedding(t, emb_size))
        if norm:
            x, x_U = l2_normalize(x), l2_normalize(x_U)
        x = dropout(k1, x, dropout_rate, train)
        x_U = dropout(k2, x_U, dropout_rate, train)

        # ablation routing via --noise_type (ref :1236-1249); conti skips it
        if not conti and noise_type == 1:
            h_in = jnp.concatenate([x_U[:, : x.shape[1]], emb], axis=-1)
        else:
            h_in = jnp.concatenate([x, emb], axis=-1)
        h = mlp_tanh(p["in_layers"], h_in)

        if not conti and noise_type == 2:
            hu_in = jnp.concatenate([x, x, emb], axis=-1)
        else:
            hu_in = jnp.concatenate([x_U, emb], axis=-1)
        h_U = mlp_tanh(p["in_layers2"], hu_in)

        closs = None
        if rcloss:
            closs = nt_xent_loss(h, h_U)
            if not conti and noise_type != 0:
                closs = closs * 0.0

        user_vecs = user_lookup(p["embedding_user"], index)
        item_table = p["embedding_item"]
        if conti:
            hc = jnp.concatenate([h_U, h_U, user_vecs], axis=1)
        else:
            hc = jnp.concatenate([h, h_U, user_vecs], axis=1)

        if gcn_layer_num > 0:
            if symmetric_gcn:
                gcn_u, _gcn_i = layer_gcn_apply(
                    p["gcn"], hc, item_table, g, num_layers=gcn_layer_num,
                    symmetric=True)
            else:
                # directed (reference-faithful) graph: the user rows the
                # blend consumes are graph-independent — compute only them
                # (equality with layer_gcn_apply tested; ~2x step win since
                # TPU XLA does not DCE the discarded item-side chain)
                gcn_u = layer_gcn_user_rows(p["gcn"], hc, gcn_layer_num)
            hc = hc * p["sumW"] + gcn_u * (1.0 - p["sumW"])
        scores = cosine_scores(hc, item_table, eps=cosine_eps)
        return scores, closs

    return ModelDef(init, apply, needs_onehot=True, needs_index=True,
                    needs_graph=True)


# ---------------------------------------------------------------------------
# DNNOneHotTransformer — transformer-encoder towers
# ---------------------------------------------------------------------------

def _torch_linear_default(key, d_in, d_out):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(+-1/
    sqrt(fan_in)) for the weight, U(+-1/sqrt(fan_in)) for the bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), minval=-bound,
                                maxval=bound),
        "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound),
    }


def _encoder_layer_init(key, d_model, d_ff):
    ks = jax.random.split(key, 4)
    # DISTRIBUTION-faithful to torch: the reference's init_weights() loops
    # only over in/out/emb layers (DNN.py:1636-1663) — the encoder keeps
    # torch's own defaults: MHA in_proj xavier-uniform + zero bias,
    # out_proj Linear-default weight + zero bias, FFN Linear defaults
    # (round-3 golden parity caught the earlier repo-convention inits
    # training at a different loss scale).
    out = _torch_linear_default(ks[1], d_model, d_model)
    out["b"] = jnp.zeros((d_model,))
    return {
        "qkv": {"w": xavier_uniform(ks[0], (d_model, 3 * d_model)),
                "b": jnp.zeros((3 * d_model,))},
        "out": out,
        "ff1": _torch_linear_default(ks[2], d_model, d_ff),
        "ff2": _torch_linear_default(ks[3], d_ff, d_model),
        "ln1": {"g": jnp.ones((d_model,)), "b": jnp.zeros((d_model,))},
        "ln2": {"g": jnp.ones((d_model,)), "b": jnp.zeros((d_model,))},
    }


def _layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _encoder_layer_apply(p, x, nhead, train, rng, dropout_rate):
    """Post-norm torch TransformerEncoderLayer with relu FFN.

    The reference feeds [B, d_model] (no sequence axis): torch treats the batch
    as the sequence of one unbatched "sentence", so self-attention mixes
    *across batch rows*. We reproduce that exactly: seq_len = B.
    """
    B, d = x.shape
    hd = d // nhead
    qkv = x @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(B, nhead, hd).transpose(1, 0, 2)  # [H, B, hd]

    q, k, v = heads(q), heads(k), heads(v)
    att = jax.nn.softmax((q @ k.transpose(0, 2, 1)) / jnp.sqrt(hd), axis=-1)
    k1, k2, k_att, k_ff = _split(rng, 4)
    # torch MultiheadAttention drops the ATTENTION WEIGHTS (F.dropout on the
    # softmax output) and TransformerEncoderLayer drops the FFN inner
    # activation — both at the layer's dropout rate (0.5 here, ref
    # DNN.py:1622-1626). Round-3 golden parity caught their absence: our
    # transformer trained measurably better than the reference's.
    att = dropout(k_att, att, dropout_rate, train)
    ctx = (att @ v).transpose(1, 0, 2).reshape(B, d)
    ctx = ctx @ p["out"]["w"] + p["out"]["b"]
    x = _layer_norm(p["ln1"], x + dropout(k1, ctx, dropout_rate, train))
    ff = linear(p["ff2"],
                dropout(k_ff, jax.nn.relu(linear(p["ff1"], x)),
                        dropout_rate, train))
    x = _layer_norm(p["ln2"], x + dropout(k2, ff, dropout_rate, train))
    return x


def dnn_transformer(in_dims, out_dims, emb_size, norm=False,
                    dropout_rate=0.5, nhead: int = 2,
                    num_layers: int = 2) -> ModelDef:
    """DNNOneHotTransformer (ref :1585-1707): two 2-layer encoders replace the
    MLP towers; heads concat -> out_layers."""
    assert out_dims[0] == in_dims[-1]
    in_t = _tower_dims(in_dims, emb_size)
    in_dims2 = [in_dims[0] * 2] + list(in_dims[1:])
    in_t2 = _tower_dims(in_dims2, emb_size)
    out_t = [in_t2[0] + in_t[0]] + list(out_dims[1:])
    d1, d2 = in_t[0], in_t2[0]

    def init(key):
        ks = jax.random.split(key, 2 * num_layers + 2)
        return {
            "emb_layer": linear_init(ks[0], emb_size, emb_size),
            "enc1": [_encoder_layer_init(ks[1 + i], d1, in_t[-1])
                     for i in range(num_layers)],
            "enc2": [_encoder_layer_init(ks[1 + num_layers + i], d2, in_t2[-1])
                     for i in range(num_layers)],
            "out_layers": mlp_init(ks[-1], out_t),
        }

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        ks = _split(rng, 2 + 2 * num_layers)
        x_U = x_U.reshape(x_U.shape[0], -1)
        emb = linear(p["emb_layer"], timestep_embedding(t, emb_size))
        if norm:
            x, x_U = l2_normalize(x), l2_normalize(x_U)
        x = dropout(ks[0], x, dropout_rate, train)
        x_U = dropout(ks[1], x_U, dropout_rate, train)
        h = jnp.concatenate([x, emb], axis=-1)
        h_U = jnp.concatenate([x_U, emb], axis=-1)
        for i, lp in enumerate(p["enc1"]):
            h = _encoder_layer_apply(lp, h, nhead, train, ks[2 + i], dropout_rate)
        for i, lp in enumerate(p["enc2"]):
            h_U = _encoder_layer_apply(lp, h_U, nhead, train,
                                       ks[2 + num_layers + i], dropout_rate)
        h = jnp.concatenate([h, h_U], axis=1)
        h = mlp_out(p["out_layers"], h)
        return h, None

    return ModelDef(init, apply, needs_onehot=True, needs_index=False)


# ---------------------------------------------------------------------------
# DNNlightGCN — link-prediction pre-filter + plain DNN
# ---------------------------------------------------------------------------

def dnn_lightgcn(in_dims, out_dims, emb_size, n_user, n_item,
                 norm=False, dropout_rate=0.5, lgn_dim: int = 64,
                 lgn_layers: int = 2, norm_adj=None,
                 sparse_adj=None) -> ModelDef:
    """DNNlightGCN (ref :1709-1804), dense reformulation.

    Reference flow per batch: adjacency -> edge list -> LightGCN.predict_link
    over the full training edge set -> filtered adjacency -> DNN. The per-edge
    score is sigmoid(e_u . e_i) > 0.5 with embeddings propagated over the
    static train graph. Densely: S = sigmoid(E_u[index] @ E_i^T);
    x' = x * (S > 0.5).

    THREE upstream findings pin what "faithful" can mean here (round 3):
    (1) the class is UNCONSTRUCTIBLE in the reference — DNN.py:1061 defines
    a module-level ``class LightGCN`` that shadows the torch_geometric
    import at DNN.py:7, so the constructor call at :1721 TypeErrors even
    with torch_geometric installed; (2) with the shadowing repaired, tg
    2.5.3's gcn_norm on the reference's DIRECTED user->item edge list gives
    users in-degree 0, zeroing every propagation weight — the effective
    link filter is sign(raw_u . raw_i) on the xavier-init embeddings, which
    is exactly this builder WITHOUT ``norm_adj`` (identical-weights parity
    vs the repaired class: tests/test_parity_reference.py); (3) the
    training path is additionally incoherent upstream (training_losses has
    no ``gcn`` branch; only p_mean_variance does). ``norm_adj``/
    ``sparse_adj`` implement the evidently-INTENDED symmetric propagation
    and are what the registry wires in.

    ``norm_adj``: the normalized user->item block N ([n_user, n_item]) from
    models/lightgcn.normalized_bipartite_blocks over the TRAIN matrix (the
    reference's frozen e_f edge set, main.py:221-235). The boolean threshold
    blocks all gradient to the LightGCN embeddings in the reference too, so
    they stay at their init values — propagating ONCE at init is exactly
    equivalent to the reference's per-forward propagate+predict_link. The
    propagated tables live in params under "frozen_*" keys, which the
    optimizer masks out (no weight-decay erosion). Without ``norm_adj`` the
    raw init embeddings are used (0 propagation layers).

    ``sparse_adj``: large-graph alternative to ``norm_adj`` — an
    ``(operand,)`` or ``(operand, interpret)`` tuple where operand is a
    BlockSparse (``normalized_bipartite_sparse``) or HybridSparse
    (``normalized_bipartite_hybrid``); the init-time propagation then runs
    on the Pallas SpMM (CSC view for the transpose direction) and nothing
    [n_user, n_item]-dense materializes (the reference equivalent is
    ``torch.sparse.mm``, lightGCN.py:176-194).
    """
    assert out_dims[0] == in_dims[-1]
    in_t = _tower_dims(in_dims, emb_size)

    def init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        emb = xavier_uniform(k4, (n_user + n_item, lgn_dim))
        e_user, e_item = emb[:n_user], emb[n_user:]
        if sparse_adj is not None:
            from gdmcf_tpu.models.lightgcn import (propagate_hybrid,
                                                   propagate_sparse)
            from gdmcf_tpu.ops.spmm import (HybridSparse,
                                            block_sparse_arrays,
                                            block_sparse_meta,
                                            hybrid_arrays, hybrid_meta)
            op = sparse_adj[0]
            interp = sparse_adj[1] if len(sparse_adj) > 1 else False
            if isinstance(op, HybridSparse):
                e_user, e_item = propagate_hybrid(
                    e_user, e_item, hybrid_meta(op), hybrid_arrays(op),
                    lgn_layers, interpret=interp)
            else:
                e_user, e_item = propagate_sparse(
                    e_user, e_item, block_sparse_meta(op),
                    block_sparse_arrays(op), lgn_layers, interpret=interp)
        elif norm_adj is not None:
            from gdmcf_tpu.models.lightgcn import propagate
            e_user, e_item = propagate(e_user, e_item,
                                       jnp.asarray(norm_adj), lgn_layers)
        return {
            "emb_layer": linear_init(k1, emb_size, emb_size),
            "in_layers": mlp_init(k2, in_t),
            "out_layers": mlp_init(k3, out_dims),
            "frozen_lgn_user": e_user,
            "frozen_lgn_item": e_item,
        }

    def apply(p, x, t, x_U=None, index=None, graph=None,
              rcloss=False, train=False, rng=None):
        (k_drop,) = _split(rng, 1)
        e_user = jax.lax.stop_gradient(p["frozen_lgn_user"])
        e_item = jax.lax.stop_gradient(p["frozen_lgn_item"])
        # == sigmoid(raw) > 0.5 exactly (sigmoid strictly monotonic,
        # sigmoid(0)=0.5) without the B x n_item transcendental pass
        link = (e_user[index] @ e_item.T) > 0.0
        x = x * link.astype(x.dtype)
        emb = linear(p["emb_layer"], timestep_embedding(t, emb_size))
        if norm:
            x = l2_normalize(x)
        x = dropout(k_drop, x, dropout_rate, train)
        h = jnp.concatenate([x, emb], axis=-1)
        h = mlp_tanh(p["in_layers"], h)
        h = mlp_out(p["out_layers"], h)
        return h, None

    return ModelDef(init, apply, needs_onehot=False, needs_index=True)
