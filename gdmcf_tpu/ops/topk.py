"""Sharded full-catalog top-k: shard-local select + k-merge.

The eval hot path ranks a [B, n_item] score matrix that is sharded over the
catalog ('mp') axis. A naive ``lax.top_k`` would make XLA all-gather the full
matrix to every chip first. Here each shard selects its local top-k (k <<
n_item/shards), and only [B, k] values+indices cross the ICI before the final
merge — the SURVEY.md §5 "shard-local top-k + global merge" design. Per-chip
HBM never holds more than its catalog shard.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def topk_local_merge(scores: jnp.ndarray, k: int, axis_name: str
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inside shard_map: local top-k -> all-gather [shards, B, k] -> merge.

    Returns (values [B, k], global column indices [B, k]).
    """
    n_local = scores.shape[1]
    shard_idx = jax.lax.axis_index(axis_name)
    vals, idx = jax.lax.top_k(scores, k)
    gidx = idx + shard_idx * n_local
    all_vals = jax.lax.all_gather(vals, axis_name, axis=1)   # [B, S, k]
    all_idx = jax.lax.all_gather(gidx, axis_name, axis=1)
    b = scores.shape[0]
    flat_vals = all_vals.reshape(b, -1)
    flat_idx = all_idx.reshape(b, -1)
    mvals, mpos = jax.lax.top_k(flat_vals, k)
    midx = jnp.take_along_axis(flat_idx, mpos, axis=1)
    return mvals, midx


def sharded_topk(mesh: Mesh, scores: jnp.ndarray, k: int,
                 axis_name: str = "mp") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over the catalog axis of a ('dp','mp')-sharded score matrix.

    scores: [B, n_item] laid out P('dp', 'mp'). Output (values, indices)
    [B, k] laid out P('dp', None) — replicated over mp.
    """
    fn = jax.shard_map(
        lambda s: topk_local_merge(s, k, axis_name),
        mesh=mesh,
        in_specs=P("dp", axis_name),
        out_specs=P("dp", None),
        check_vma=False,
    )
    return fn(scores)
