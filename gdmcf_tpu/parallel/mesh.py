"""Device mesh construction.

Axes:
  dp — data parallel: batch rows of users; gradients psum across it
  mp — model parallel: the item-catalog axis (the workload's "long axis",
       SURVEY.md §5); shards the item embedding table, the tower weights'
       item-sized dims, and the [B, n_item] score matrix.

The reference has no distributed support at all (SURVEY.md §2.3); this is the
net-new scaling layer. On hardware, lay dp over DCN/outer ICI and mp over
inner ICI so the catalog all-reduces ride the fastest links.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = dp * mp
    if len(devices) < need:
        raise ValueError(f"need {need} devices for mesh ({dp},{mp}); "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(dp, mp)
    return Mesh(grid, axis_names=("dp", "mp"))


def single_device_mesh(device=None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.asarray([device]).reshape(1, 1), axis_names=("dp", "mp"))
