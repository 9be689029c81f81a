"""Block-sparse SpMM — Pallas TPU kernels for large-graph propagation.

Replaces the reference's ``torch.sparse.mm`` / torch_geometric scatter kernels
(``/root/reference/lightGCN.py:185``, ``models/DNN.py:1047``) for the regime
where the graph cannot be densified (e.g. the 10M-user / 1M-item synthetic
scale, SURVEY.md §2.3). For moderate catalogs the dense-masked formulation in
``models/gcn.py`` is already MXU-optimal; this kernel extends the same math to
sparse adjacencies.

Format: block-CSR + a CSC view over the SAME tiles. The [n_rows, n_cols]
sparse matrix is tiled into (BR x BC) tiles; only tiles containing nonzeros
are stored densely, once:

    blocks     [n_blocks, BR, BC]  dense tile values (CSR order)
    block_cols [n_blocks]          column-tile of each stored tile
    row_ptr    [n_row_tiles + 1]   CSR over tiles
    col_ptr    [n_col_tiles + 1]   CSC over the same tiles
    block_ids  [n_blocks]          CSC-order permutation into ``blocks``
    block_rows [n_blocks]          row-tile of each CSC entry

``y = A @ x``   iterates row-tiles (CSR);  acc[br, D] += tile @ x_tile
``y = A^T @ x`` iterates col-tiles (CSC);  acc[bc, D] += tile^T @ x_tile
so the transpose pass (needed by both LightGCN propagation and the matvec
VJP) reuses the forward tile storage — no transposed copy of the matrix ever
exists, and tile layout stays MXU/DMA-aligned (lane dim = BC >= 128) in both
directions.

Scaling design (learned the hard way at 1M x 200k): only the tiny ptr array
is scalar-prefetched into SMEM; tile metadata (block_cols /
block_ids+block_rows) is stored in absolute-aligned 1024-entry chunks
([n_chunks, 8, 128] int32) and DMA'd HBM->SMEM chunk-by-chunk as each
output tile's range crosses them. Whole-array prefetch of 433k block_cols
(1.7 MB) overflows the 1 MB SMEM budget, a hot column tile can span EVERY
row tile (125k entries), and Mosaic requires 1-D int32 DMA offsets/lengths
to be 1024-aligned — absolute chunking by the untiled leading dim satisfies
all three. Tile/x DMAs are pipelined _PIPELINE deep (latency-bound at low
fill: measured 7.5 -> 5.1 ms/product going 2 -> 4 deep).

Hardware alignment rules (Mosaic): BC must be a multiple of 128 (lane dim of
tile and x DMAs), BR a multiple of 8 (sublane dim); the dense operand's D is
padded to a multiple of 128 internally. Interpret mode (tests) accepts any
sizes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BlockSparse(NamedTuple):
    # metadata arrays are stored chunked [n_chunks, 8, _META_CHUNK//8] int32
    # (flat order = CSR/CSC tile order) — see to_block_sparse.chunked
    blocks: jnp.ndarray      # [n_blocks, BR, BC] float32 (CSR tile order)
    block_cols: jnp.ndarray  # chunked [n_blocks] int32
    row_ptr: jnp.ndarray     # [n_row_tiles + 1] int32
    col_ptr: jnp.ndarray     # [n_col_tiles + 1] int32
    block_ids: jnp.ndarray   # chunked [n_blocks] int32 (CSC -> CSR index)
    block_rows: jnp.ndarray  # chunked [n_blocks] int32 (CSC order)
    block_rows_csr: jnp.ndarray  # chunked [n_blocks] int32 (CSR order)
    shape: Tuple[int, int]   # padded (n_rows, n_cols)
    br: int
    bc: int
    max_row_width: int       # max stored tiles in any row-tile
    max_col_width: int       # max stored tiles in any col-tile


_Meta = Tuple[Tuple[int, int], int, int]


def n_real_blocks(a: BlockSparse) -> int:
    """Stored tile count, excluding the _GROUP-1 zero pad tiles appended
    for the batched-DMA kernel (see to_block_sparse)."""
    return a.blocks.shape[0] - (_GROUP - 1)


def block_sparse_meta(a: BlockSparse) -> _Meta:
    """Static metadata (hashable) — pass alongside ``block_sparse_arrays``."""
    return (a.shape, a.br, a.bc)


def block_sparse_arrays(a: BlockSparse):
    """The jit-argument arrays. Pass these as arguments and rebuild with
    ``_rebuild`` inside — closing over them embeds the whole sparse matrix
    as a program constant (oversized remote-compile payloads)."""
    return (a.blocks, a.block_cols, a.row_ptr, a.col_ptr, a.block_ids,
            a.block_rows, a.block_rows_csr)


def _rebuild(meta: _Meta, arrays) -> BlockSparse:
    shape, br, bc = meta
    # the width fields are host-side diagnostics, irrelevant inside jit
    return BlockSparse(*arrays, shape=shape, br=br, bc=bc,
                       max_row_width=0, max_col_width=0)


def degree_sort_permutation(mat: sp.spmatrix):
    """(row_perm, col_perm) sorting rows/cols by descending degree.

    Power-law graphs relabeled this way concentrate nonzeros into the leading
    tiles, which is what makes the block format effective; apply with
    ``mat[row_perm][:, col_perm]`` and remap embeddings/ids accordingly.
    """
    mat = mat.tocsr()
    row_deg = np.asarray(mat.sum(axis=1)).ravel()
    col_deg = np.asarray(mat.sum(axis=0)).ravel()
    return np.argsort(-row_deg), np.argsort(-col_deg)


def to_block_sparse(mat: sp.spmatrix, br: int = 128, bc: int = 128,
                    max_bytes: int = 8 << 30) -> BlockSparse:
    """Host-side: scipy sparse -> block-CSR(+CSC view), nonzero tiles only.

    Refuses (ValueError) when the densified tiles would exceed ``max_bytes``:
    uniform-random sparsity puts ~1 nnz per tile and blows storage up by
    br*bc/1 — this format targets clustered/structured sparsity (see
    degree_sort_permutation and to_hybrid). For unstructured sparse graphs
    use the dense path per catalog shard instead.
    """
    mat = mat.tocoo()
    n_rows = -(-mat.shape[0] // br) * br
    n_cols = -(-mat.shape[1] // bc) * bc
    rb = mat.row // br
    cb = mat.col // bc
    n_col_tiles = n_cols // bc
    n_row_tiles = n_rows // br
    tile_ids = rb.astype(np.int64) * n_col_tiles + cb
    uniq, inverse = np.unique(tile_ids, return_inverse=True)
    n_blocks = len(uniq)
    nbytes = max(n_blocks, 1) * br * bc * 4
    if nbytes > max_bytes:
        raise ValueError(
            f"block-sparse densification would take {nbytes / 2**30:.1f} GiB "
            f"({n_blocks} tiles for {mat.nnz} nnz, fill "
            f"{mat.nnz / max(n_blocks, 1) / (br * bc):.4f}); this format "
            "needs clustered sparsity — degree-sort the graph "
            "(degree_sort_permutation), use to_hybrid, or the dense sharded "
            "path")
    blocks = np.zeros((max(n_blocks, 1), br, bc), dtype=np.float32)
    # add (not assign): duplicate COO entries must sum, matching scipy's
    # canonical form and the dense product
    np.add.at(blocks, (inverse, mat.row % br, mat.col % bc), mat.data)
    u_rb = (uniq // n_col_tiles).astype(np.int32)
    u_cb = (uniq % n_col_tiles).astype(np.int32)

    def csr_ptr(keys, n_bins):
        ptr = np.zeros(n_bins + 1, dtype=np.int32)
        np.add.at(ptr[1:], keys, 1)
        return np.cumsum(ptr).astype(np.int32)

    row_ptr = csr_ptr(u_rb, n_row_tiles)   # uniq already sorted by (rb, cb)
    # CSC view over the same tiles: stable sort by column-tile
    csc_order = np.argsort(u_cb, kind="stable").astype(np.int32)
    col_ptr = csr_ptr(u_cb, n_col_tiles)
    csc_rows = u_rb[csc_order]
    widths_r = np.diff(row_ptr)
    widths_c = np.diff(col_ptr)
    mrw = int(widths_r.max()) if n_blocks else 1
    mcw = int(widths_c.max()) if n_blocks else 1

    def chunked(arr):
        # metadata is DMA'd in whole absolute-aligned _META_CHUNK chunks,
        # stored [n_chunks, 8, CHUNK/8] so the kernel indexes chunks by the
        # (untiled) leading dimension — the same addressing the blocks array
        # uses, with no dynamic-offset alignment proofs needed
        n = -(-max(len(arr), 1) // _META_CHUNK) * _META_CHUNK
        out = np.zeros(n, dtype=np.int32)
        out[: len(arr)] = arr
        return out.reshape(-1, 8, _META_CHUNK // 8)

    if n_blocks == 0:
        u_rb = np.zeros(1, np.int32)
        u_cb = np.zeros(1, np.int32)
        csc_order = np.zeros(1, np.int32)
        csc_rows = np.zeros(1, np.int32)
    # pad with _GROUP-1 zero tiles: the VMEM-x kernel fetches blocks in
    # contiguous _GROUP-sized batches (CSR order) and the last batch of a
    # range may overrun the real tiles. Zero tiles are inert everywhere:
    # ptr ranges never reach them in the kernels, and in spmm_reference
    # their segment ids fall out of range (dropped) with zero values anyway.
    pad = np.zeros((_GROUP - 1, br, bc), dtype=np.float32)
    blocks = np.concatenate([blocks, pad], axis=0)
    return BlockSparse(
        blocks=jnp.asarray(blocks),
        block_cols=jnp.asarray(chunked(u_cb)),
        row_ptr=jnp.asarray(row_ptr),
        col_ptr=jnp.asarray(col_ptr),
        block_ids=jnp.asarray(chunked(csc_order)),
        block_rows=jnp.asarray(chunked(csc_rows)),
        block_rows_csr=jnp.asarray(chunked(u_rb)),
        shape=(n_rows, n_cols),
        br=br, bc=bc,
        max_row_width=max(mrw, 1), max_col_width=max(mcw, 1),
    )


def spmm_reference(a: BlockSparse, x: jnp.ndarray,
                   transpose: bool = False) -> jnp.ndarray:
    """Gather-based oracle: y = A @ x (or A^T @ x) via jnp ops, any backend."""
    n_blocks = n_real_blocks(a)
    if transpose:
        n_out_tiles = a.shape[1] // a.bc
        x_pad = jnp.zeros((a.shape[0], x.shape[1]),
                          x.dtype).at[: x.shape[0]].set(x)
        x_tiles = x_pad.reshape(-1, a.br, x.shape[1])
        gathered = x_tiles[a.block_rows.reshape(-1)[:n_blocks]]
        tiles = a.blocks[a.block_ids.reshape(-1)[:n_blocks]]
        per_block = jnp.einsum("kij,kid->kjd", tiles, gathered)
        seg_ids = jnp.searchsorted(a.col_ptr[1:], jnp.arange(n_blocks),
                                   side="right")
        y = jax.ops.segment_sum(per_block, seg_ids, num_segments=n_out_tiles)
        return y.reshape(a.shape[1], x.shape[1])
    n_row_tiles = a.shape[0] // a.br
    x_pad = jnp.zeros((a.shape[1], x.shape[1]),
                      x.dtype).at[: x.shape[0]].set(x)
    x_tiles = x_pad.reshape(-1, a.bc, x.shape[1])
    gathered = x_tiles[a.block_cols.reshape(-1)[:n_blocks]]
    per_block = jnp.einsum("kij,kjd->kid", a.blocks[:n_blocks], gathered)
    seg_ids = jnp.searchsorted(a.row_ptr[1:], jnp.arange(n_blocks),
                               side="right")
    y = jax.ops.segment_sum(per_block, seg_ids, num_segments=n_row_tiles)
    return y.reshape(a.shape[0], x.shape[1])


_META_CHUNK = 1024  # ints per metadata DMA (4 KB SMEM; int32 HBM slices tile at 1024)
_PIPELINE = 4       # tile/x DMA buffer depth (latency hiding at low fill)
_GROUP = 8          # tiles per batched block DMA (VMEM-x forward kernel)
_X_VMEM_BUDGET = 6 << 20  # keep whole x in VMEM when it fits this many bytes


def _spmm_kernel(ptr_ref, tile_meta_hbm, aux_meta_hbm, blocks_hbm, x_hbm,
                 y_ref, meta_buf, aux_buf, a_buf, x_buf, acc_ref, meta_sems,
                 sems, *, x_rows: int, transpose: bool, rowg: int):
    """One grid step per output tile group (``rowg`` row-tiles forward —
    128 output rows per step regardless of br, so thin-tile graphs don't
    pay the per-grid-step fixed cost 16x; one col-tile transpose).

    ptr (SMEM, scalar-prefetched) gives this step's [start, stop) range into
    the tile-metadata arrays, which are streamed HBM->SMEM in fixed
    _META_CHUNK slices (whole-array prefetch overflows the 1 MB SMEM budget
    at ~250k tiles, and a hot column tile can span EVERY row tile — 125k
    entries at the 1M x 200k geometry — so even per-step whole-width chunks
    don't fit):
      forward:   tile_meta = block_cols (x tile index);
                 aux = block_rows_csr (output row-tile id, routes each tile
                 to its br-row slot of the group accumulator)
      transpose: tile_meta = block_rows (x tile index); aux = block_ids
    Within a chunk, tile/x DMAs are double-buffered and accumulate on the
    MXU; the pipeline restarts at each chunk boundary (one ~2 KB DMA bubble
    per 512 tiles).
    """
    i = pl.program_id(0)
    start = ptr_ref[i * rowg]
    stop = ptr_ref[(i + 1) * rowg]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    sub = _META_CHUNK // 8
    need_aux = transpose or rowg > 1

    def chunk_body(c, _):
        # chunks are ABSOLUTE-aligned (metadata stored [n_chunks, 8, C/8]):
        # leading-dim indexing needs no dynamic-offset alignment proofs
        meta_dma = pltpu.make_async_copy(tile_meta_hbm.at[c], meta_buf,
                                         meta_sems.at[0])
        meta_dma.start()
        if need_aux:  # rowg==1 forward never reads aux — skip the dead DMA
            aux_dma = pltpu.make_async_copy(aux_meta_hbm.at[c], aux_buf,
                                            meta_sems.at[1])
            aux_dma.start()
        meta_dma.wait()
        if need_aux:
            aux_dma.wait()
        lo = jnp.maximum(start, c * _META_CHUNK)
        hi = jnp.minimum(stop, (c + 1) * _META_CHUNK)

        def meta_at(buf, k):
            j = k - c * _META_CHUNK
            return buf[j // sub, j % sub]

        def pair(k, slot):
            # forward: blocks are CSR-contiguous (index = k, the absolute
            # tile index); transpose: CSC permutation from block_ids
            block_idx = meta_at(aux_buf, k) if transpose else k
            a_dma = pltpu.make_async_copy(blocks_hbm.at[block_idx],
                                          a_buf.at[slot], sems.at[slot, 0])
            x_dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(meta_at(meta_buf, k) * x_rows, x_rows), :],
                x_buf.at[slot], sems.at[slot, 1])
            return a_dma, x_dma

        def start_pair(k, slot):
            a_dma, x_dma = pair(k, slot)
            a_dma.start()
            x_dma.start()

        @pl.when(lo < hi)
        def _():
            # 4-deep pipeline: prefetch up to 3 tile/x pairs ahead so the
            # per-DMA issue latency (the wall at low fill) overlaps compute
            for p in range(_PIPELINE - 1):
                @pl.when(lo + p < hi)
                def _(p=p):
                    start_pair(lo + p, p % _PIPELINE)

            def body(k, _):
                slot = (k - lo) % _PIPELINE
                nxt = (k - lo + _PIPELINE - 1) % _PIPELINE

                @pl.when(k + _PIPELINE - 1 < hi)
                def _():
                    start_pair(k + _PIPELINE - 1, nxt)

                a_dma, x_dma = pair(k, slot)
                a_dma.wait()
                x_dma.wait()
                if transpose:
                    # acc[bc, D] += tile[br, bc]^T @ x[br, D]
                    acc_ref[:] += jax.lax.dot_general(
                        a_buf[slot], x_buf[slot],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                elif rowg > 1:
                    # route to this tile's br-row slot of the group acc
                    br = a_buf.shape[1]
                    off = (meta_at(aux_buf, k) % rowg) * br
                    acc_ref[pl.ds(off, br), :] = (
                        acc_ref[pl.ds(off, br), :]
                        + jnp.dot(a_buf[slot], x_buf[slot],
                                  preferred_element_type=jnp.float32))
                else:
                    acc_ref[:] += jnp.dot(a_buf[slot], x_buf[slot],
                                          preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(lo, hi, body, 0)
        return 0

    first = start // _META_CHUNK
    n_chunks = (stop + _META_CHUNK - 1) // _META_CHUNK - first
    jax.lax.fori_loop(first, first + n_chunks, chunk_body, 0)
    y_ref[:] = acc_ref[:]


def _spmm_kernel_vx_fwd(ptr_ref, tile_meta_hbm, blocks_hbm, x_ref, y_ref,
                        meta_buf, a_buf, acc_ref, meta_sem, sems,
                        *, x_rows: int):
    """Forward pass with x resident in VMEM: batched contiguous block DMA.

    CSR tile order makes this range of ``blocks`` contiguous in HBM, so
    tiles stream in _GROUP-sized batches (one DMA descriptor per _GROUP
    tiles instead of per tile — the per-DMA issue latency is the wall at
    low fill), double-buffered; x is read directly from VMEM, no x DMAs at
    all. ``blocks`` carries _GROUP-1 zero pad tiles so edge batches may
    overrun the real tile count safely.
    """
    i = pl.program_id(0)
    start = ptr_ref[i]
    stop = ptr_ref[i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    sub = _META_CHUNK // 8

    def chunk_body(c, _):
        meta_dma = pltpu.make_async_copy(tile_meta_hbm.at[c], meta_buf,
                                         meta_sem)
        meta_dma.start()
        meta_dma.wait()
        lo = jnp.maximum(start, c * _META_CHUNK)
        hi = jnp.minimum(stop, (c + 1) * _META_CHUNK)

        def meta_at(k):
            j = k - c * _META_CHUNK
            return meta_buf[j // sub, j % sub]

        def start_group(k0, slot):
            pltpu.make_async_copy(blocks_hbm.at[pl.ds(k0, _GROUP)],
                                  a_buf.at[slot], sems.at[slot]).start()

        @pl.when(lo < hi)
        def _():
            n_groups = (hi - lo + _GROUP - 1) // _GROUP
            start_group(lo, 0)

            def gbody(g, _):
                g0 = lo + g * _GROUP
                slot = g % 2

                @pl.when(g + 1 < n_groups)
                def _():
                    start_group(g0 + _GROUP, (g + 1) % 2)

                pltpu.make_async_copy(blocks_hbm.at[pl.ds(g0, _GROUP)],
                                      a_buf.at[slot], sems.at[slot]).wait()
                for j in range(_GROUP):
                    @pl.when(g0 + j < hi)
                    def _(j=j):
                        xt = x_ref[pl.ds(meta_at(g0 + j) * x_rows, x_rows), :]
                        acc_ref[:] += jnp.dot(
                            a_buf[slot, j], xt,
                            preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, n_groups, gbody, 0)
        return 0

    first = start // _META_CHUNK
    n_chunks = (stop + _META_CHUNK - 1) // _META_CHUNK - first
    jax.lax.fori_loop(first, first + n_chunks, chunk_body, 0)
    y_ref[:] = acc_ref[:]


def _spmm_kernel_vx_t(ptr_ref, tile_meta_hbm, aux_meta_hbm, blocks_hbm,
                      x_ref, y_ref, meta_buf, aux_buf, a_buf, acc_ref,
                      meta_sems, sems, *, x_rows: int):
    """Transpose pass with x resident in VMEM: per-tile CSC-permuted block
    DMA ( _PIPELINE deep), x read from VMEM — half the DMAs of the
    streaming transpose kernel."""
    i = pl.program_id(0)
    start = ptr_ref[i]
    stop = ptr_ref[i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    sub = _META_CHUNK // 8

    def chunk_body(c, _):
        meta_dma = pltpu.make_async_copy(tile_meta_hbm.at[c], meta_buf,
                                         meta_sems.at[0])
        aux_dma = pltpu.make_async_copy(aux_meta_hbm.at[c], aux_buf,
                                        meta_sems.at[1])
        meta_dma.start()
        aux_dma.start()
        meta_dma.wait()
        aux_dma.wait()
        lo = jnp.maximum(start, c * _META_CHUNK)
        hi = jnp.minimum(stop, (c + 1) * _META_CHUNK)

        def meta_at(buf, k):
            j = k - c * _META_CHUNK
            return buf[j // sub, j % sub]

        def start_tile(k, slot):
            pltpu.make_async_copy(blocks_hbm.at[meta_at(aux_buf, k)],
                                  a_buf.at[slot], sems.at[slot]).start()

        @pl.when(lo < hi)
        def _():
            for p in range(_PIPELINE - 1):
                @pl.when(lo + p < hi)
                def _(p=p):
                    start_tile(lo + p, p % _PIPELINE)

            def body(k, _):
                slot = (k - lo) % _PIPELINE
                nxt = (k - lo + _PIPELINE - 1) % _PIPELINE

                @pl.when(k + _PIPELINE - 1 < hi)
                def _():
                    start_tile(k + _PIPELINE - 1, nxt)

                pltpu.make_async_copy(blocks_hbm.at[meta_at(aux_buf, k)],
                                      a_buf.at[slot], sems.at[slot]).wait()
                xt = x_ref[pl.ds(meta_at(meta_buf, k) * x_rows, x_rows), :]
                acc_ref[:] += jax.lax.dot_general(
                    a_buf[slot], xt,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(lo, hi, body, 0)
        return 0

    first = start // _META_CHUNK
    n_chunks = (stop + _META_CHUNK - 1) // _META_CHUNK - first
    jax.lax.fori_loop(first, first + n_chunks, chunk_body, 0)
    y_ref[:] = acc_ref[:]


def _spmm_call_vx(a: BlockSparse, x_pad, ptr, tile_meta, aux, grid, x_rows,
                  out_rows, out_tile, d, transpose, interpret):
    """pallas_call wrapper for the VMEM-resident-x kernels."""
    br, bc = a.br, a.bc
    x_spec = pl.BlockSpec(x_pad.shape, lambda i, *_: (0, 0),
                          memory_space=pltpu.VMEM)
    if transpose:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # tile_meta (block_rows)
                pl.BlockSpec(memory_space=pl.ANY),   # aux (csc ids)
                pl.BlockSpec(memory_space=pl.ANY),   # blocks stay in HBM
                x_spec,                              # x resident in VMEM
            ],
            out_specs=pl.BlockSpec((out_tile, d), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((8, _META_CHUNK // 8), jnp.int32),
                pltpu.SMEM((8, _META_CHUNK // 8), jnp.int32),
                pltpu.VMEM((_PIPELINE, br, bc), jnp.float32),
                pltpu.VMEM((out_tile, d), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((_PIPELINE,)),
            ],
        )
        kernel = functools.partial(_spmm_kernel_vx_t, x_rows=x_rows)
        operands = (ptr, tile_meta, aux, a.blocks, x_pad)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # tile_meta (block_cols)
                pl.BlockSpec(memory_space=pl.ANY),   # blocks stay in HBM
                x_spec,                              # x resident in VMEM
            ],
            out_specs=pl.BlockSpec((out_tile, d), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((8, _META_CHUNK // 8), jnp.int32),
                pltpu.VMEM((2, _GROUP, br, bc), jnp.float32),
                pltpu.VMEM((out_tile, d), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(_spmm_kernel_vx_fwd, x_rows=x_rows)
        operands = (ptr, tile_meta, a.blocks, x_pad)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, d), jnp.float32),
        interpret=interpret,
    )(*operands)


def spmm(a: BlockSparse, x: jnp.ndarray, transpose: bool = False,
         interpret: bool = False, x_vmem: Optional[bool] = None
         ) -> jnp.ndarray:
    """``y = A @ x`` (or ``A^T @ x``) with the Pallas kernel.

    x: [A.shape[1] (or [0] for transpose), D] — unpadded rows accepted, D is
    padded to a multiple of 128 internally. Output rows are padded to the
    tile grid; slice to the logical size at the call site. Not jitted here
    (see block_sparse_arrays on how to pass the operand at a jit boundary);
    for gradients use ``spmm_op``.

    ``x_vmem`` — keep the whole dense operand resident in VMEM: forward
    batches _GROUP contiguous tiles per block DMA and issues no x DMAs at
    all; transpose halves the DMA count. Auto-selected when the padded x
    fits _X_VMEM_BUDGET; pass explicitly to force either kernel.
    """
    br, bc = a.br, a.bc
    if transpose:
        grid = a.shape[1] // bc
        ptr, tile_meta, aux = a.col_ptr, a.block_rows, a.block_ids
        x_rows, out_rows, out_tile = br, a.shape[1], bc
        n_x = a.shape[0]
    else:
        grid = a.shape[0] // br
        ptr, tile_meta, aux = a.row_ptr, a.block_cols, a.block_ids
        x_rows, out_rows, out_tile = bc, a.shape[0], br
        n_x = a.shape[1]
    d_in = x.shape[1]
    if x.dtype != jnp.float32:
        # the streaming kernel's VMEM scratch and the _X_VMEM_BUDGET
        # heuristic are f32 (4 B/elem); a bf16 operand would mismatch the
        # DMA scratch dtype at Mosaic lowering (or double-count the
        # budget). One up-front cast keeps every caller correct.
        x = x.astype(jnp.float32)
    if x.shape[0] > n_x:
        # cotangents from the opposite-direction product carry that
        # product's pad output rows — structurally zero, drop them
        x = x[:n_x]
    # Mosaic: lane (last) dim of DMA slices must be 128-aligned
    d = -(-d_in // 128) * 128
    x_pad = jnp.zeros((n_x, d), x.dtype).at[: x.shape[0], : d_in].set(x)

    if x_vmem is None:
        x_vmem = n_x * d * 4 <= _X_VMEM_BUDGET
    if x_vmem:
        y = _spmm_call_vx(a, x_pad, ptr, tile_meta, aux, grid, x_rows,
                          out_rows, out_tile, d, transpose, interpret)
        return y[:, :d_in] if d != d_in else y

    rowg = 1
    if not transpose:
        # group row-tiles so each grid step emits 128 output rows: thin-tile
        # (br=8) graphs otherwise pay the per-grid-step fixed cost 16x
        # (measured 119 -> ~55 ms per product at the 1M x 200k geometry)
        rowg = max(1, 128 // br)
        aux = a.block_rows_csr
        grid = -(-grid // rowg)
        out_tile = rowg * br
        out_rows = grid * out_tile
        # empty ranges for the pad row-tiles: repeat the last ptr entry
        pad_len = grid * rowg + 1 - ptr.shape[0]
        if pad_len > 0:
            ptr = jnp.concatenate(
                [ptr, jnp.broadcast_to(ptr[-1], (pad_len,))])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # ptr only — tile metadata is DMA'd
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # tile_meta stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # aux stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # blocks stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((out_tile, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((8, _META_CHUNK // 8), jnp.int32),
            pltpu.SMEM((8, _META_CHUNK // 8), jnp.int32),
            pltpu.VMEM((_PIPELINE, br, bc), jnp.float32),
            pltpu.VMEM((_PIPELINE, x_rows, d), jnp.float32),
            pltpu.VMEM((out_tile, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((_PIPELINE, 2)),
        ],
    )
    y = pl.pallas_call(
        functools.partial(_spmm_kernel, x_rows=x_rows,
                          transpose=transpose, rowg=rowg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, d), jnp.float32),
        interpret=interpret,
    )(ptr, tile_meta, aux, a.blocks, x_pad)
    return y[:, :d_in] if d != d_in else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def spmm_op(meta: _Meta, transpose: bool, interpret: bool, arrays,
            x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable ``y = A @ x`` (or ``A^T @ x``) on the Pallas kernel.

    The VJP w.r.t. the dense operand is the opposite-direction product on
    the SAME tile storage (CSC view) — no transposed copy of the matrix.
    Cotangents for the adjacency arrays are zeros (the graph is data, not a
    parameter — XLA dead-code-eliminates them).
    """
    return spmm(_rebuild(meta, arrays), x, transpose=transpose,
                interpret=interpret)


def _spmm_op_fwd(meta, transpose, interpret, arrays, x):
    y = spmm(_rebuild(meta, arrays), x, transpose=transpose,
             interpret=interpret)
    return y, (arrays, x.shape[0])


def _spmm_op_bwd(meta, transpose, interpret, res, g):
    arrays, n_x = res
    gx = spmm(_rebuild(meta, arrays), g, transpose=not transpose,
              interpret=interpret)[:n_x]
    return (jax.tree_util.tree_map(jnp.zeros_like, arrays), gx)


spmm_op.defvjp(_spmm_op_fwd, _spmm_op_bwd)


# ---------------------------------------------------------------------------
# hybrid tile + COO remainder
# ---------------------------------------------------------------------------

class HybridSparse(NamedTuple):
    """Hybrid tile + COO-remainder format for low-fill graphs.

    Dense tiles are stored only where they hold >= ``min_fill`` nonzeros;
    the stragglers go to a COO list handled by an XLA gather/scatter-add
    pass. At the 1M x 200k power-law geometry (br=8, min_fill=4) this keeps
    93% of nnz on the MXU kernel in 0.50 GiB of tiles instead of 1.65 GiB —
    and the 7% remainder is a 4 MiB COO list.
    """

    tiles: BlockSparse
    rem_rows: jnp.ndarray  # [nnz_rem] int32 (row in A)
    rem_cols: jnp.ndarray  # [nnz_rem] int32
    rem_vals: jnp.ndarray  # [nnz_rem] float32


def to_hybrid(mat: sp.spmatrix, br: int = 8, bc: int = 128,
              min_fill: int = 4, max_bytes: int = 8 << 30) -> HybridSparse:
    """scipy sparse -> HybridSparse (host-side, O(nnz))."""
    coo = mat.tocoo()
    n_cols_pad = -(-coo.shape[1] // bc) * bc
    tile_id = (coo.row // br).astype(np.int64) * (n_cols_pad // bc) \
        + coo.col // bc
    uniq, inverse, counts = np.unique(tile_id, return_inverse=True,
                                      return_counts=True)
    dense_mask = counts[inverse] >= min_fill
    kept = sp.coo_matrix((coo.data[dense_mask],
                          (coo.row[dense_mask], coo.col[dense_mask])),
                         shape=coo.shape)
    tiles = to_block_sparse(kept, br, bc, max_bytes)
    rem = ~dense_mask
    return HybridSparse(
        tiles=tiles,
        rem_rows=jnp.asarray(coo.row[rem].astype(np.int32)),
        rem_cols=jnp.asarray(coo.col[rem].astype(np.int32)),
        rem_vals=jnp.asarray(coo.data[rem].astype(np.float32)))


def hybrid_meta(h: HybridSparse) -> _Meta:
    return block_sparse_meta(h.tiles)


def hybrid_arrays(h: HybridSparse):
    return (block_sparse_arrays(h.tiles),
            h.rem_rows, h.rem_cols, h.rem_vals)


def hybrid_spmm(meta: _Meta, arrays, x: jnp.ndarray, transpose: bool = False,
                interpret: bool = False) -> jnp.ndarray:
    """Differentiable ``y = A @ x`` (or ``A^T @ x``) on the hybrid format.

    Tile pass rides the Pallas kernel (spmm_op custom VJP, CSC view for the
    transpose); the COO remainder is one gather + scatter-add, fully
    autodiff-native. Output rows are padded to the tile grid.
    """
    ta, rr, rc, rv = arrays
    if transpose:
        rr, rc = rc, rr
    y = spmm_op(meta, transpose, interpret, ta, x)
    contrib = rv[:, None] * x[rc, :]
    # Scatter at the native 128-lane width into a fresh zeros buffer, then
    # add elementwise: a row-scatter whose minor dim is a fraction of a
    # lane register lowers catastrophically on TPU (measured 75 ms vs
    # 9.7 ms at width 64 vs 128 for the same 365k-update scatter at the
    # 1M x 200k geometry), and scattering directly into the kernel output
    # serializes behind the custom call.
    d_in = x.shape[1]
    d_pad = -(-d_in // 128) * 128
    if d_pad != d_in:
        contrib = jnp.pad(contrib, ((0, 0), (0, d_pad - d_in)))
    z = jnp.zeros((y.shape[0], d_pad), y.dtype).at[rr].add(contrib)
    return y + z[:, :d_in]
