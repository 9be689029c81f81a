"""Row-sharded embedding lookup — the workload's EP analog (SURVEY.md §2.3).

At the synthetic 10M-user / 1M-item scale the user/item tables cannot be
replicated per chip. They are row-sharded over the 'mp' axis; a lookup of ids
[B] becomes, inside shard_map:

    local  = table_shard[clip(ids - row_offset)] masked to the shard's range
    result = psum(local, 'mp')

Each chip touches only its own HBM rows; B x D crosses the ICI once in the
reduction. The backward pass is automatic: the masked gather transposes to a
masked scatter-add into the local shard (shard_map is differentiable), so
gradients land only on the owning chip — no full-table allreduce.

For lookups where B x D is large relative to the table shard, an all-to-all
variant (exchange ids, gather locally, exchange rows back) would halve the
traffic; psum-of-masked-gather is the simpler first-class implementation and
is bandwidth-optimal for the [B, D] sizes this workload produces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                  axis_name: str) -> jnp.ndarray:
    # CONTRACT: ids must lie in [0, N). An out-of-range id is owned by NO
    # shard, so every mask is False and the psum returns an exact
    # all-zero row — silently (no device-side bounds check can raise
    # inside shard_map without a debug callback). The data layer validates
    # ids at ingest (data/loader.py raises on out-of-range edges); keep
    # that invariant when feeding this path from new code.
    rows_per_shard = table_shard.shape[0]
    shard = jax.lax.axis_index(axis_name)
    offset = shard * rows_per_shard
    local_ids = ids - offset
    in_range = (local_ids >= 0) & (local_ids < rows_per_shard)
    gathered = table_shard[jnp.clip(local_ids, 0, rows_per_shard - 1)]
    local = jnp.where(in_range[:, None], gathered, 0.0)
    return jax.lax.psum(local, axis_name)


def sharded_embedding_lookup(mesh: Mesh, table: jnp.ndarray,
                             ids: jnp.ndarray,
                             axis_name: str = "mp",
                             batch_axis: "str | None" = None) -> jnp.ndarray:
    """table: [N, D] sharded P('mp', None); ids: [B].
    Returns [B, D] replicated over mp. Differentiable (grads scatter to the
    owning shard only).

    ``batch_axis``: optionally shard the ids (and result rows) over a second
    mesh axis (dp), so each data-parallel group only looks up its own batch
    shard; requires B divisible by that axis size.
    """
    bspec = P(batch_axis) if batch_axis else P()
    fn = jax.shard_map(
        lambda t, i: _local_lookup(t, i, axis_name),
        mesh=mesh,
        in_specs=(P(axis_name, None), bspec),
        out_specs=P(batch_axis) if batch_axis else P(),
        check_vma=False,
    )
    return fn(table, ids)
