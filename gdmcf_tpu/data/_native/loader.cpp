// Native host-side data engine for gdmcf_tpu.
//
// The reference's data path is Python/scipy (SURVEY.md §2.2): CSR build via
// scipy (C) and per-batch row gathers via torch DataLoader workers. This
// library is the framework's own native equivalent, sized for the synthetic
// 10M-user/1M-item regime where materializing the dense interaction matrix
// (the current numpy path) is impossible:
//
//   build_csr       (uid, iid) edge list -> CSR (counting sort, O(nnz))
//   assemble_batch  CSR rows -> dense float32 [B, n_item] batch (OpenMP)
//   sample_bpr      per-user positive + rejection-sampled negative triples
//                   (the reference's Python loop, lightGCN.py:221-251)
//
// Exposed via ctypes (no pybind11 in this image); see gdmcf_tpu/data/native.py.

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Counting-sort CSR build. indptr: [n_user+1] (zeroed by caller or not —
// we clear it), indices: [nnz]. Per-row indices are sorted ascending.
void build_csr(const int64_t* uids, const int64_t* iids, int64_t nnz,
               int64_t n_user, int64_t* indptr, int32_t* indices) {
    std::memset(indptr, 0, sizeof(int64_t) * (n_user + 1));
    for (int64_t k = 0; k < nnz; ++k) indptr[uids[k] + 1]++;
    for (int64_t u = 0; u < n_user; ++u) indptr[u + 1] += indptr[u];
    // temporary fill cursors
    int64_t* cursor = new int64_t[n_user];
    std::memcpy(cursor, indptr, sizeof(int64_t) * n_user);
    for (int64_t k = 0; k < nnz; ++k) {
        indices[cursor[uids[k]]++] = static_cast<int32_t>(iids[k]);
    }
    delete[] cursor;
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t u = 0; u < n_user; ++u) {
        std::sort(indices + indptr[u], indices + indptr[u + 1]);
    }
}

// Gather CSR rows into a dense float32 batch (1.0 at interactions).
void assemble_batch(const int64_t* indptr, const int32_t* indices,
                    const int32_t* rows, int64_t n_rows, int64_t n_item,
                    float* out) {
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; ++r) {
        float* dst = out + r * n_item;
        std::memset(dst, 0, sizeof(float) * n_item);
        const int64_t u = rows[r];
        for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
            dst[indices[k]] = 1.0f;
        }
    }
}

// Gather CSR rows directly into the bit-packed wire format (uint8, little
// bit order — element 8*j + i is bit i of byte j, matching
// ops/bitpack.unpack_rows). Skips the dense f32 staging buffer entirely:
// at the 1M-item scale geometry that buffer is ~1 GB/batch host-side.
void assemble_batch_packed(const int64_t* indptr, const int32_t* indices,
                           const int32_t* rows, int64_t n_rows,
                           int64_t n_item, uint8_t* out) {
    const int64_t n_bytes = (n_item + 7) / 8;
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; ++r) {
        uint8_t* dst = out + r * n_bytes;
        std::memset(dst, 0, n_bytes);
        const int64_t u = rows[r];
        for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
            const int32_t it = indices[k];
            dst[it >> 3] |= static_cast<uint8_t>(1u << (it & 7));
        }
    }
}

// splitmix64 — tiny deterministic PRNG for sampling.
static inline uint64_t splitmix64(uint64_t& s) {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

// For each user: one random positive from their row, one rejection-sampled
// negative outside it (binary search membership; rows are sorted).
void sample_bpr(const int64_t* indptr, const int32_t* indices,
                int64_t n_item, const int32_t* users, int64_t batch,
                uint64_t seed, int32_t* pos, int32_t* neg) {
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < batch; ++k) {
        uint64_t s = seed + 0x632be59bd9b4e019ULL * (uint64_t)(k + 1);
        const int64_t u = users[k];
        const int64_t lo = indptr[u], hi = indptr[u + 1];
        const int64_t deg = hi - lo;
        if (deg == 0) {
            pos[k] = static_cast<int32_t>(splitmix64(s) % n_item);
            neg[k] = static_cast<int32_t>(splitmix64(s) % n_item);
            continue;
        }
        pos[k] = indices[lo + (int64_t)(splitmix64(s) % (uint64_t)deg)];
        for (;;) {
            int32_t cand = static_cast<int32_t>(splitmix64(s) % n_item);
            if (!std::binary_search(indices + lo, indices + hi, cand)) {
                neg[k] = cand;
                break;
            }
        }
    }
}

}  // extern "C"
