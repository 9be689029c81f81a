"""ctypes bindings for the native data engine (data/_native/loader.cpp).

The shared library is compiled on first use with g++ (-O3 -fopenmp) and
cached next to the source; every entry point has a numpy fallback so the
framework works even without a toolchain (``HAVE_NATIVE`` reports which path
is active). pybind11 is not available in this image, hence ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "_native" / "loader.cpp"
_LIB = Path(__file__).parent / "_native" / "libgdmcf_loader.so"

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False  # one failed compile is enough — never retry per call
HAVE_NATIVE = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed, HAVE_NATIVE
    if _lib is not None:
        return _lib
    if _lib_failed:
        # without this, every gather()/sample_bpr() in the training loop
        # would re-pay a multi-second failed g++ attempt
        return None
    try:
        if (not _LIB.exists()
                or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
            # compile to a private temp and rename: concurrent first-use
            # (multi-host processes on one machine) must never CDLL a
            # half-written .so — that OSError would silently demote the
            # process to the numpy fallback for the whole run
            tmp = _LIB.with_suffix(f".{os.getpid()}.so")
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-fopenmp", "-o", str(tmp), str(_SRC)],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, _LIB)
        lib = ctypes.CDLL(str(_LIB))
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.build_csr.argtypes = [i64p, i64p, ctypes.c_int64,
                                  ctypes.c_int64, i64p, i32p]
        lib.assemble_batch.argtypes = [i64p, i32p, i32p, ctypes.c_int64,
                                       ctypes.c_int64, f32p]
        lib.sample_bpr.argtypes = [i64p, i32p, ctypes.c_int64, i32p,
                                   ctypes.c_int64, ctypes.c_uint64,
                                   i32p, i32p]
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.assemble_batch_packed.argtypes = [i64p, i32p, i32p,
                                              ctypes.c_int64,
                                              ctypes.c_int64, u8p]
        _lib = lib
        HAVE_NATIVE = True
    except Exception:
        _lib = None
        _lib_failed = True
        HAVE_NATIVE = False
    return _lib


class NativeCSR:
    """CSR interaction matrix with native batch assembly.

    Holds only indptr/indices (O(nnz)) — never the dense matrix — so it
    scales to catalogs where ``DiffusionDataset``'s dense rows cannot.
    """

    # gather() writes 0/1 only (no value array exists), so batches are
    # always eligible for the bit-packed wire format (ops/bitpack.py)
    binary = True

    def __init__(self, indptr: np.ndarray, indices: np.ndarray,
                 n_user: int, n_item: int):
        self.indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        self.indices = np.ascontiguousarray(indices, dtype=np.int32)
        self.n_user = n_user
        self.n_item = n_item

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_edge_list(cls, edges: np.ndarray, n_user: int,
                       n_item: int) -> "NativeCSR":
        edges = np.ascontiguousarray(edges, dtype=np.int64)
        nnz = len(edges)
        indptr = np.zeros(n_user + 1, dtype=np.int64)
        indices = np.zeros(max(nnz, 1), dtype=np.int32)
        lib = _ensure_lib()
        if lib is not None and nnz:
            lib.build_csr(np.ascontiguousarray(edges[:, 0]),
                          np.ascontiguousarray(edges[:, 1]),
                          nnz, n_user, indptr, indices)
        elif nnz:
            order = np.lexsort((edges[:, 1], edges[:, 0]))
            srt = edges[order]
            np.add.at(indptr[1:], srt[:, 0], 1)
            indptr = np.cumsum(indptr)
            indices = srt[:, 1].astype(np.int32)
        return cls(indptr, indices[:nnz], n_user, n_item)

    @classmethod
    def from_scipy(cls, csr, strict: bool = True) -> "NativeCSR":
        """Structure-only view of a scipy sparse matrix.

        NativeCSR keeps indptr/indices ONLY — every stored cell gathers as
        1.0. ``strict`` (default) therefore rejects count-valued/weighted
        matrices instead of silently binarizing the training data (the
        dense ``host_dense=True`` path keeps the values); pass
        ``strict=False`` where MEMBERSHIP is the intended semantics
        (serving history masks, BPR positives). Explicit-zero cells are
        never interactions and are dropped either way."""
        csr = csr.tocsr()
        csr.eliminate_zeros()  # a stored 0.0 must not gather as 1.0
        csr.sort_indices()
        if strict and csr.nnz and not ((csr.data == 1).all()):
            raise ValueError(
                "NativeCSR is structure-only and would binarize "
                "count-valued/weighted cells; use host_dense=True to keep "
                "values, or from_scipy(..., strict=False) if membership "
                "semantics are intended")
        return cls(csr.indptr.astype(np.int64), csr.indices.astype(np.int32),
                   csr.shape[0], csr.shape[1])

    # -- ops ----------------------------------------------------------------
    def __len__(self) -> int:
        return self.n_user

    def gather(self, rows: np.ndarray) -> np.ndarray:
        """Dense float32 [len(rows), n_item] batch."""
        rows = np.ascontiguousarray(rows, dtype=np.int32)
        out = np.empty((len(rows), self.n_item), dtype=np.float32)
        lib = _ensure_lib()
        if lib is not None:
            lib.assemble_batch(self.indptr, self.indices, rows,
                               len(rows), self.n_item, out)
        else:
            out.fill(0.0)
            for r, u in enumerate(rows):
                out[r, self.indices[self.indptr[u]:self.indptr[u + 1]]] = 1.0
        return out

    def gather_packed(self, rows: np.ndarray) -> np.ndarray:
        """Bit-packed uint8 [len(rows), ceil(n_item/8)] batch (little bit
        order, ops/bitpack wire format) — never materializes the dense f32
        staging buffer (~1 GB/batch at the 1M-item scale geometry)."""
        rows = np.ascontiguousarray(rows, dtype=np.int32)
        n_bytes = (self.n_item + 7) // 8
        out = np.empty((len(rows), n_bytes), dtype=np.uint8)
        lib = _ensure_lib()
        if lib is not None:
            lib.assemble_batch_packed(self.indptr, self.indices, rows,
                                      len(rows), self.n_item, out)
        else:
            out.fill(0)
            for r, u in enumerate(rows):
                items = self.indices[self.indptr[u]:self.indptr[u + 1]]
                np.bitwise_or.at(out[r], items >> 3,
                                 np.uint8(1) << (items & 7).astype(np.uint8))
        return out

    def sample_bpr(self, users: np.ndarray,
                   seed: int) -> Tuple[np.ndarray, np.ndarray]:
        """(pos, neg) item ids for the given users."""
        max_deg = getattr(self, "_max_deg", None)
        if max_deg is None:
            max_deg = self._max_deg = (
                int(np.diff(self.indptr).max()) if self.n_user else 0)
        if max_deg >= self.n_item:
            # the rejection loop (here AND in the C++ kernel, which cannot
            # be interrupted from Python) would spin forever for a user
            # whose row covers the whole catalog — no negative exists
            raise ValueError(
                "BPR negative sampling impossible: some user interacted "
                f"with all {self.n_item} items (no negatives exist)")
        users = np.ascontiguousarray(users, dtype=np.int32)
        pos = np.empty(len(users), dtype=np.int32)
        neg = np.empty(len(users), dtype=np.int32)
        lib = _ensure_lib()
        if lib is not None:
            lib.sample_bpr(self.indptr, self.indices, self.n_item,
                           users, len(users), np.uint64(seed), pos, neg)
            return pos, neg
        rng = np.random.default_rng(seed)
        for k, u in enumerate(users):
            items = self.indices[self.indptr[u]:self.indptr[u + 1]]
            if len(items) == 0:
                pos[k] = rng.integers(self.n_item)
                neg[k] = rng.integers(self.n_item)
                continue
            pos[k] = rng.choice(items)
            iset = set(items.tolist())
            while True:
                cand = int(rng.integers(self.n_item))
                if cand not in iset:
                    neg[k] = cand
                    break
        return pos, neg
