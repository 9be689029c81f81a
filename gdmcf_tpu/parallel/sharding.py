"""Sharding rules: regex path -> PartitionSpec, GSPMD-propagated elsewhere.

Strategy (SURVEY.md §2.3 / §5):
  * batch axis -> dp everywhere (rows of users)
  * item-catalog axis -> mp: the item embedding table [n_item, 3D], the
    tower-1 first weight [n_item+temb, D], the tower-2 first weight
    [2*n_item+temb, D], and (by XLA propagation) the [B, n_item] activations
    and score matrices
  * everything else replicated; optimizer state follows params

Only the *inputs* are annotated; XLA's sharding propagation inserts the
collectives (all-gather for the cosine head's full-catalog scores, psum for
gradients) — the scaling-book recipe: pick a mesh, annotate, let XLA work.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex over the '/'-joined param path, spec)
DEFAULT_RULES: List[Tuple[str, P]] = [
    (r"embedding_item$", P("mp", None)),
    # user table row-sharded over mp; the backbones gather it through the
    # shard_map lookup (parallel/embed.py) so it is never all-gathered
    (r"embedding_user$", P("mp", None)),
    (r"in_layers/0/w$", P("mp", None)),
    (r"in_layers2/0/w$", P("mp", None)),
    (r"cat_layer/w$", P(None, "mp")),
    (r"out_layers/(\d+)/w$", P(None, None)),
    (r"frozen_lgn_(user|item)$", P("mp", None)),
    (r".*", P()),
]


def _path_str(path) -> str:
    # the one canonical leaf-path format, shared with Config.bf16_weights
    from gdmcf_tpu.train.state import path_str
    return path_str(path)


def compatible_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop spec axes whose dimension isn't divisible by the mesh axis size
    (device_put rejects uneven shardings; XLA would pad inside jit, but
    explicit placement must be even). Returns a possibly-reduced spec."""
    if len(spec) > len(shape):
        return P()
    out = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis] if not isinstance(axis, tuple) else int(
            np.prod([mesh.shape[a] for a in axis]))
        out.append(axis if dim % size == 0 else None)
    while out and out[-1] is None:
        out.pop()
    return P(*out)


def param_specs(params: Any, rules=None, mesh: Optional[Mesh] = None) -> Any:
    """Pytree of PartitionSpec matching params, by first-matching rule."""
    rules = rules or DEFAULT_RULES

    def spec_for(path, leaf):
        name = _path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, name):
                # never shard a dim the leaf doesn't have
                if len([a for a in spec if a is not None]) and leaf.ndim < len(spec):
                    return P()
                if mesh is not None:
                    return compatible_spec(spec, leaf.shape, mesh)
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(params: Any, mesh: Mesh, rules=None) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs(params, rules, mesh))


def shard_params(params: Any, mesh: Mesh, rules=None) -> Any:
    """Place a params pytree onto the mesh according to the rules."""
    return jax.device_put(params, param_shardings(params, mesh, rules))


def batch_spec() -> P:
    """Input rows [B, n_item]: batch over dp, catalog over mp."""
    return P("dp", "mp")


def index_spec() -> P:
    return P("dp")
