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


# Measured on a v5e (benchmarks/profile_topk.py, scan-amortized protocol —
# the only timing protocol that survives cross-checks on this relay):
# [1024, 2810] k=100: lax.top_k 1.89 ms, chunked 1.30-1.36 (~31% win);
# [256, 131072] k=100: lax.top_k 10.93, chunked(512) 10.38 (~5% win).
# Chunked wins whenever the structural condition (n > max(2k, chunk))
# leaves a real candidate reduction, so it is on by default; min_n is kept
# as an escape hatch.
_CHUNK_MIN_N = 0


def chunked_topk(scores: jnp.ndarray, k: int, chunk: int = 512,
                 min_n: int = _CHUNK_MIN_N
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k: per-chunk select + candidate merge.

    ``lax.top_k`` on TPU pays a full partial sort over all n columns; it
    is cheaper to select the top-k of each size-``chunk`` slice and
    re-select over the n/chunk * k candidates (the global top-k is a
    subset of the per-chunk top-k's, so this is exact). Tie-order
    matches ``lax.top_k`` (lowest index wins): candidates are laid out
    chunk-major and rank-minor, which is index order among equal values.

    Same contract as ``lax.top_k``: returns (values, indices) [B, k].
    """
    b, n = scores.shape
    if n < min_n or n <= max(2 * k, chunk):     # no reduction to exploit
        return jax.lax.top_k(scores, k)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    kc = min(k, chunk)
    vals, idx = jax.lax.top_k(scores.reshape(b, n_chunks, chunk), kc)
    gidx = idx + (jnp.arange(n_chunks, dtype=idx.dtype) * chunk)[None, :, None]
    mvals, mpos = jax.lax.top_k(vals.reshape(b, n_chunks * kc), k)
    midx = jnp.take_along_axis(gidx.reshape(b, n_chunks * kc), mpos, axis=1)
    # padded columns can only be selected from all--inf tails; their ids
    # would be out of range — clamp like the sharded path does.
    return mvals, jnp.minimum(midx, n - 1) if pad else midx


def topk_local_merge(scores: jnp.ndarray, k: int, axis_name: str
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inside shard_map: local top-k -> all-gather [shards, B, k] -> merge.

    Returns (values [B, k], global column indices [B, k]).
    """
    n_local = scores.shape[1]
    shard_idx = jax.lax.axis_index(axis_name)
    vals, idx = chunked_topk(scores, k)
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
