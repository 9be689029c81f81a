"""Dense-masked bipartite graph convolution — the key TPU-native move.

The reference builds a dynamic-shape edge list from the batch's corruption
graph and runs torch_geometric GCNConv over it
(``/root/reference/models/DNN.py:1217-1219,1277-1280``). That is TPU-hostile:
``nonzero`` produces data-dependent shapes XLA cannot compile.

But the batch-local bipartite graph IS the binary matrix ``G [B, n_item]``
(edges run user-row -> item only). GCNConv with default settings
(add_self_loops=True, symmetric normalization, flow source->target) on that
directed graph reduces exactly to two static matmuls:

    deg_i     = 1 + sum_u G[u, i]              (in-degree + self-loop)
    deg_u     = 1                              (users receive only self-loops)
    item_out  = (X_i W) / deg_i + G^T (X_u W) / sqrt(deg_i) + b
    user_out  = (X_u W) + b

(derivation: gcn_norm weight for edge j->i is deg_j^{-1/2} deg_i^{-1/2} with
degrees computed over incoming edges incl. self-loops). Note the consequence,
reproduced faithfully: with the reference's *directed* edges, user rows are
graph-independent inside the conv — only item rows aggregate over the batch.
``symmetric=True`` adds the reverse edges (the "fixed" variant), in which case

    deg_u     = 1 + sum_i G[u, i]
    user_out  = (X_u W) / deg_u + G (X_i W) / outer-normalized + b

Everything is static-shape, batched, and lands on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gdmcf_tpu.models.layers import gcn_conv_init, linear


def gcn_conv_bipartite(
    p: dict,
    h_users: jnp.ndarray,   # [B, D]
    h_items: jnp.ndarray,   # [N, D]
    g: jnp.ndarray,         # [B, N] binary adjacency (user -> item edges)
    symmetric: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One GCNConv layer over the bipartite batch graph; returns (users, items)."""
    xu = h_users @ p["w"]
    xi = h_items @ p["w"]
    deg_i = 1.0 + g.sum(axis=0)                      # [N]
    if not symmetric:
        # Reference-faithful directed graph (user -> item only).
        item_out = xi / deg_i[:, None] + (g.T @ xu) / jnp.sqrt(deg_i)[:, None]
        user_out = xu
    else:
        deg_u = 1.0 + g.sum(axis=1)                  # [B]
        inv_su = jax.lax.rsqrt(deg_u)[:, None]
        inv_si = jax.lax.rsqrt(deg_i)[None, :]
        norm_g = g * inv_su * inv_si                 # edge weights d_u^-1/2 d_i^-1/2
        item_out = xi / deg_i[:, None] + norm_g.T @ xu
        user_out = xu / deg_u[:, None] + norm_g @ xi
    return user_out + p["b"], item_out + p["b"]


def layer_gcn_init(key: jax.Array, in_ch: int, hidden_ch: int, out_ch: int,
                   num_layers: int, dtype=jnp.float32) -> dict:
    """Params for LayerGCN (ref DNN.py:1077-1103): 1 or 2 GCNConv layers."""
    k1, k2 = jax.random.split(key)
    if num_layers == 1:
        return {"conv1": gcn_conv_init(k1, in_ch, out_ch, dtype)}
    return {
        "conv1": gcn_conv_init(k1, in_ch, hidden_ch, dtype),
        "conv2": gcn_conv_init(k2, hidden_ch, out_ch, dtype),
    }


def layer_gcn_apply(
    p: dict,
    h_users: jnp.ndarray,
    h_items: jnp.ndarray,
    g: jnp.ndarray,
    num_layers: int,
    residual: bool = False,
    symmetric: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LayerGCN forward (ref DNN.py:1093-1103): conv1 [+ relu+lrelu + conv2]."""
    u, i = gcn_conv_bipartite(p["conv1"], h_users, h_items, g, symmetric)
    if num_layers == 2:
        # relu then LeakyReLU(0.1) back-to-back, as the reference does
        u = jax.nn.leaky_relu(jax.nn.relu(u), 0.1)
        i = jax.nn.leaky_relu(jax.nn.relu(i), 0.1)
        u, i = gcn_conv_bipartite(p["conv2"], u, i, g, symmetric)
    if residual:
        u = u + h_users
        i = i + h_items
    return u, i


def layer_gcn_user_rows(p: dict, h_users: jnp.ndarray,
                        num_layers: int) -> jnp.ndarray:
    """User-row output of ``layer_gcn_apply`` in the DIRECTED (reference-
    faithful) case, computed without touching item rows.

    With user->item edges only, user rows receive nothing but their
    self-loop (module docstring), so their conv output is graph-independent:
        u = X_u W1 + b1;  [LeakyReLU(ReLU(u)) W2 + b2]
    Numerically identical to ``layer_gcn_apply(...)[0]`` with
    ``symmetric=False`` (tested), but skips the item-side chain
    ([N, D] projections, g^T aggregation) that the flagship blend discards —
    the TPU backend does not reliably dead-code-eliminate it, and it
    dominated the measured step cost (docs/BENCH_NOTES.md round-2 ablation).
    """
    u = linear(p["conv1"], h_users)
    if num_layers == 2:
        u = jax.nn.leaky_relu(jax.nn.relu(u), 0.1)
        u = linear(p["conv2"], u)
    return u


def mean_aggregation(
    h_users: jnp.ndarray,
    h_items: jnp.ndarray,
    g: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parameter-free add-aggregation hop, the dense equivalent of the
    reference's AggregationLayer/mini-LightGCN alternative (ref DNN.py:1048-1075).

    With directed user->item edges, items sum incoming user features and users
    receive nothing (no self-loops in raw MessagePassing aggr='add').
    """
    return jnp.zeros_like(h_users), g.T @ h_users


def mini_lightgcn_apply(h_users, h_items, g):
    """Two aggregation hops with relu between (ref LightGCN module :1061-1075).

    DEGENERATE BY CONSTRUCTION, faithfully: with the directed
    user->item aggregation, hop 1 zeroes the user features, and hop 2
    consumes those zeros while DISCARDING the relu'd item features — the
    result is (0, 0) for every input. That is exactly what the reference's
    module computes (its MessagePassing flow sends user->item only, and
    the second hop re-aggregates from the zeroed side); the class is also
    unreachable from the reference's main. Kept as documented parity
    evidence — do not wire it into a live model expecting graph signal.
    """
    u, i = mean_aggregation(h_users, h_items, g)
    u, i = jax.nn.relu(u), jax.nn.relu(i)
    return mean_aggregation(u, i, g)
