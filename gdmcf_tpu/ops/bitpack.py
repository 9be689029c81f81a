"""Bit-packed wire format for binary interaction rows.

The training batch is a binary matrix ``x [B, n_item]`` (a user's item row —
ref DataDiffusion, data_utils.py:222-224). Shipping it host->device as
float32 costs 32 bits per interaction cell; packing to one bit cuts the
host->device transfer AND the on-device staging buffer of the k-fused train
step ([K, B, n_item] f32 -> [K, B, ceil(n_item/8)] uint8) by 32x. The unpack
runs *inside* the jitted step (a handful of VPU shift/mask ops, fused by
XLA), so eager per-batch dispatches stay unchanged.

Lossless only for binary rows — callers must check ``dataset.binary`` (edge
lists with duplicate pairs produce count cells > 1, which the reference
would also feed through; those fall back to the f32 wire format).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def is_binary(a: np.ndarray) -> bool:
    """True iff every cell is exactly 0 or 1 — the packability predicate
    (``pack_rows`` packs ``x != 0``, which would silently binarize counts or
    fractional weights)."""
    a = np.asarray(a)
    return bool(((a == 0) | (a == 1)).all())


def pack_rows(x: np.ndarray) -> np.ndarray:
    """Host-side: binary [..., n] (any dtype) -> uint8 [..., ceil(n/8)],
    little bit order (element ``8*j + i`` is bit ``i`` of byte ``j``)."""
    return np.packbits(np.asarray(x) != 0, axis=-1, bitorder="little")


def unpack_rows(packed: jnp.ndarray, n: int,
                dtype=jnp.float32) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_rows`: uint8 [..., n8] -> [..., n].

    Pure elementwise shift/mask — safe inside jit/scan/shard_map; XLA fuses
    it into the consuming op so the [.., n] tensor never round-trips HBM as
    a separate buffer.
    """
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts) & jnp.uint8(1)
    flat = bits.reshape(packed.shape[:-1] + (8 * packed.shape[-1],))
    return flat[..., :n].astype(dtype)
