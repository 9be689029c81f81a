"""Block-sparse SpMM — Pallas TPU kernel for large-graph propagation.

Replaces the reference's ``torch.sparse.mm`` / torch_geometric scatter kernels
(``/root/reference/lightGCN.py:185``, ``models/DNN.py:1047``) for the regime
where the graph cannot be densified (e.g. the 10M-user / 1M-item synthetic
scale, SURVEY.md §2.3). For moderate catalogs the dense-masked formulation in
``models/gcn.py`` is already MXU-optimal; this kernel extends the same math to
sparse adjacencies.

Format: block-CSR. The [n_rows, n_cols] sparse matrix is tiled into
(BR x BC) tiles; only tiles containing nonzeros are stored densely:

    blocks     [n_blocks, BR, BC]  dense tile values
    block_cols [n_blocks]          column-tile index of each stored tile
    row_ptr    [n_row_tiles + 1]   CSR over tiles (tiles of a row-tile are
                                   contiguous)

The kernel runs one grid step per row-tile: scalar-prefetched row_ptr /
block_cols drive async DMA of each stored tile and the matching X tile from
HBM into VMEM double buffers, accumulating ``acc += tile @ x_tile`` on the
MXU. This is the canonical TPU block-sparse matmul: all FLOPs land on the
systolic array, all HBM traffic is tile-granular and overlapped with compute.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BlockSparse(NamedTuple):
    blocks: jnp.ndarray      # [n_blocks, BR, BC] float32
    block_cols: jnp.ndarray  # [n_blocks] int32
    row_ptr: jnp.ndarray     # [n_row_tiles + 1] int32
    shape: Tuple[int, int]   # padded (n_rows, n_cols)
    br: int
    bc: int


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
    """Host-side: scipy sparse -> block-CSR with only nonzero tiles stored.

    Refuses (ValueError) when the densified tiles would exceed ``max_bytes``:
    uniform-random sparsity puts ~1 nnz per tile and blows storage up by
    br*bc/1 — this format targets clustered/structured sparsity (see
    degree_sort_permutation). For unstructured sparse graphs use the dense
    path per catalog shard instead.
    """
    mat = mat.tocoo()
    n_rows = -(-mat.shape[0] // br) * br
    n_cols = -(-mat.shape[1] // bc) * bc
    rb = mat.row // br
    cb = mat.col // bc
    tile_ids = rb.astype(np.int64) * (n_cols // bc) + cb
    uniq, inverse = np.unique(tile_ids, return_inverse=True)
    n_blocks = len(uniq)
    nbytes = max(n_blocks, 1) * br * bc * 4
    if nbytes > max_bytes:
        raise ValueError(
            f"block-sparse densification would take {nbytes / 2**30:.1f} GiB "
            f"({n_blocks} tiles for {mat.nnz} nnz, fill "
            f"{mat.nnz / max(n_blocks, 1) / (br * bc):.4f}); this format "
            "needs clustered sparsity — degree-sort the graph "
            "(degree_sort_permutation) or use the dense sharded path")
    blocks = np.zeros((max(n_blocks, 1), br, bc), dtype=np.float32)
    # add (not assign): duplicate COO entries must sum, matching scipy's
    # canonical form and the dense product
    np.add.at(blocks, (inverse, mat.row % br, mat.col % bc), mat.data)
    u_rb = (uniq // (n_cols // bc)).astype(np.int32)
    u_cb = (uniq % (n_cols // bc)).astype(np.int32)
    n_row_tiles = n_rows // br
    row_ptr = np.zeros(n_row_tiles + 1, dtype=np.int32)
    np.add.at(row_ptr[1:], u_rb, 1)
    row_ptr = np.cumsum(row_ptr).astype(np.int32)
    # uniq is sorted by (rb, cb) already, so tiles of a row-tile are contiguous
    return BlockSparse(
        blocks=jnp.asarray(blocks),
        block_cols=jnp.asarray(u_cb if n_blocks else np.zeros(1, np.int32)),
        row_ptr=jnp.asarray(row_ptr),
        shape=(n_rows, n_cols),
        br=br, bc=bc,
    )


def spmm_reference(a: BlockSparse, x: jnp.ndarray) -> jnp.ndarray:
    """Gather-based oracle: y = A @ x via jnp ops (works on any backend)."""
    n_row_tiles = a.shape[0] // a.br
    x_pad = jnp.zeros((a.shape[1], x.shape[1]), x.dtype).at[: x.shape[0]].set(x)
    x_tiles = x_pad.reshape(-1, a.bc, x.shape[1])          # [n_col_tiles, BC, D]
    gathered = x_tiles[a.block_cols]                       # [n_blocks, BC, D]
    per_block = jnp.einsum("kij,kjd->kid", a.blocks, gathered)
    # segment-sum per row tile
    seg_ids = jnp.searchsorted(a.row_ptr[1:],
                               jnp.arange(a.blocks.shape[0]), side="right")
    y = jax.ops.segment_sum(per_block, seg_ids, num_segments=n_row_tiles)
    return y.reshape(a.shape[0], x.shape[1])


class HybridSparse(NamedTuple):
    """Hybrid tile + COO-remainder format for low-fill graphs.

    Dense tiles are stored only where they hold >= ``min_fill`` nonzeros;
    the stragglers go to a COO list handled by an XLA gather/scatter-add
    pass. At the 1M x 200k power-law geometry (br=8, min_fill=4) this keeps
    93% of nnz on the MXU kernel in 0.50 GiB of tiles instead of 1.65 GiB —
    and the 7% remainder is a 4 MiB COO list.

    ``tiles_t`` is the transpose OF THE KEPT TILES (T^T, not A^T): the
    differentiable matvec is y = T@x + R@x, whose VJP needs T^T (via
    spmm_pair) while R's VJP is native XLA autodiff.
    """

    tiles: BlockSparse
    tiles_t: BlockSparse
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
    tiles_t = to_block_sparse(kept.T.tocsr(), bc, br, max_bytes)
    rem = ~dense_mask
    return HybridSparse(
        tiles=tiles, tiles_t=tiles_t,
        rem_rows=jnp.asarray(coo.row[rem].astype(np.int32)),
        rem_cols=jnp.asarray(coo.col[rem].astype(np.int32)),
        rem_vals=jnp.asarray(coo.data[rem].astype(np.float32)))


def hybrid_meta(h: HybridSparse):
    return (block_sparse_meta(h.tiles), block_sparse_meta(h.tiles_t))


def hybrid_arrays(h: HybridSparse):
    return (block_sparse_arrays(h.tiles), block_sparse_arrays(h.tiles_t),
            h.rem_rows, h.rem_cols, h.rem_vals)


def hybrid_spmm(meta, arrays, x: jnp.ndarray, transpose: bool = False,
                interpret: bool = False) -> jnp.ndarray:
    """Differentiable ``y = A @ x`` (or ``A^T @ x``) on the hybrid format.

    Tile pass rides the Pallas kernel (spmm_pair custom VJP); the COO
    remainder is one gather + scatter-add, fully autodiff-native. Metadata/
    arrays come from hybrid_meta/hybrid_arrays so the operand rides as jit
    arguments. Output rows are padded to the tile grid (slice to taste).
    """
    meta_a, meta_at = meta
    ta, tt, rr, rc, rv = arrays
    if transpose:
        meta_a, meta_at = meta_at, meta_a
        ta, tt = tt, ta
        rr, rc = rc, rr
    y = spmm_pair(meta_a, meta_at, interpret, ta, tt, x)
    contrib = rv[:, None] * x[rc, :]
    return y.at[rr].add(contrib)


_Meta = Tuple[Tuple[int, int], int, int]  # (shape, br, bc) — static metadata


def _rebuild(meta: _Meta, arrays) -> BlockSparse:
    (shape, br, bc) = meta
    blocks, block_cols, row_ptr = arrays
    return BlockSparse(blocks=blocks, block_cols=block_cols, row_ptr=row_ptr,
                       shape=shape, br=br, bc=bc)


def block_sparse_meta(a: BlockSparse) -> _Meta:
    return (a.shape, a.br, a.bc)


def block_sparse_arrays(a: BlockSparse):
    return (a.blocks, a.block_cols, a.row_ptr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def spmm_pair(meta_a: _Meta, meta_at: _Meta, interpret: bool,
              a_arrays, at_arrays, x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable ``y = A @ x`` on the Pallas kernel.

    The VJP of a sparse matmul w.r.t. the dense operand is ``A^T @ g`` — the
    caller supplies A^T in the same block format (``at_arrays``), so the
    backward pass runs on the identical kernel instead of needing a scatter
    transpose. Cotangents for the adjacency arrays are zeros (the graph is
    data, not a parameter — XLA dead-code-eliminates them).

    Pass metadata via ``block_sparse_meta`` and arrays via
    ``block_sparse_arrays`` so the sparse matrices ride as jit ARGUMENTS (see
    ``spmm``'s docstring on why closing over them is a mistake).
    """
    return spmm(_rebuild(meta_a, a_arrays), x, interpret=interpret)


def _spmm_pair_fwd(meta_a, meta_at, interpret, a_arrays, at_arrays, x):
    y = spmm(_rebuild(meta_a, a_arrays), x, interpret=interpret)
    return y, (a_arrays, at_arrays, x.shape[0])


def _spmm_pair_bwd(meta_a, meta_at, interpret, res, g):
    a_arrays, at_arrays, n_x = res
    gx = spmm(_rebuild(meta_at, at_arrays), g, interpret=interpret)[:n_x]
    zeros_a = jax.tree_util.tree_map(jnp.zeros_like, a_arrays)
    zeros_at = jax.tree_util.tree_map(jnp.zeros_like, at_arrays)
    return (zeros_a, zeros_at, gx)


spmm_pair.defvjp(_spmm_pair_fwd, _spmm_pair_bwd)


def _spmm_kernel(row_ptr_ref, block_cols_ref, blocks_hbm, x_hbm, y_ref,
                 a_buf, x_buf, acc_ref, sems, *, bc: int):
    i = pl.program_id(0)
    start = row_ptr_ref[i]
    stop = row_ptr_ref[i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def get_dmas(k, slot):
        a_dma = pltpu.make_async_copy(blocks_hbm.at[k], a_buf.at[slot],
                                      sems.at[slot, 0])
        cb = block_cols_ref[k]
        x_dma = pltpu.make_async_copy(x_hbm.at[pl.ds(cb * bc, bc), :],
                                      x_buf.at[slot], sems.at[slot, 1])
        return a_dma, x_dma

    def start_pair(k, slot):
        a_dma, x_dma = get_dmas(k, slot)
        a_dma.start()
        x_dma.start()

    @pl.when(start < stop)
    def _():
        start_pair(start, 0)

        def body(k, _):
            slot = (k - start) % 2
            nxt = (k - start + 1) % 2

            @pl.when(k + 1 < stop)
            def _():
                start_pair(k + 1, nxt)

            a_dma, x_dma = get_dmas(k, slot)
            a_dma.wait()
            x_dma.wait()
            acc_ref[:] += jnp.dot(a_buf[slot], x_buf[slot],
                                  preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(start, stop, body, 0)

    y_ref[:] = acc_ref[:]


def spmm(a: BlockSparse, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x with the Pallas kernel. x: [n_cols(unpadded ok), D], D
    should be a multiple of 128 for peak efficiency (any D works).

    Not jitted here: BlockSparse.shape/br/bc are static metadata. At the call
    site, pass the BlockSparse ARRAYS as jit arguments and rebuild the
    NamedTuple inside (see benchmarks/spmm_tpu_check.py:jit_spmm) — closing
    over them embeds the whole sparse matrix as a program constant, which
    bloats compiles (and oversizes remote-compile payloads).
    """
    br, bc = a.br, a.bc
    n_row_tiles = a.shape[0] // br
    d = x.shape[1]
    x_pad = jnp.zeros((a.shape[1], d), x.dtype).at[: x.shape[0]].set(x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_row_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # blocks stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((br, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, br, bc), jnp.float32),
            pltpu.VMEM((2, bc, d), jnp.float32),
            pltpu.VMEM((br, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_spmm_kernel, bc=bc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], d), jnp.float32),
        interpret=interpret,
    )(a.row_ptr, a.block_cols, a.blocks, x_pad)
