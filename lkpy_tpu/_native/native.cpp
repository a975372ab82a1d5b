// lkpy-tpu native host kernels.
//
// C++ replacement for the reference's Rust host-side accelerator
// (reference: src/accel/ — sparse/csr.rs CSR assembly, data/transpose.rs
// transpose, data/index.rs IDIndex hash lookup, data/sampling.rs negative
// sampling, data/sorting.rs argtopn).  The TPU compute path is JAX/XLA;
// this library accelerates the host data plane: columnar assembly, ID
// resolution, and samplers that feed the device.
//
// Plain C ABI over raw pointers; loaded via ctypes (lkpy_tpu/_native/__init__.py),
// with NumPy fallbacks when the shared library is unavailable.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// COO -> CSR assembly: stable sort by (row, col) via two counting passes.
// Returns 0 on success.  perm maps output position -> input position so the
// caller can permute value/field arrays.
int coo_to_csr(const int64_t* rows, const int64_t* cols, int64_t nnz,
               int64_t nrows, int64_t ncols,
               int64_t* rowptr /* nrows+1 */, int32_t* colind /* nnz */,
               int64_t* perm /* nnz */) {
    std::vector<int64_t> tmp_perm(nnz);
    // pass 1: stable counting sort by column
    {
        std::vector<int64_t> counts(ncols + 1, 0);
        for (int64_t i = 0; i < nnz; i++) {
            int64_t c = cols[i];
            if (c < 0 || c >= ncols) return -1;
            counts[c + 1]++;
        }
        for (int64_t c = 0; c < ncols; c++) counts[c + 1] += counts[c];
        for (int64_t i = 0; i < nnz; i++) tmp_perm[counts[cols[i]]++] = i;
    }
    // pass 2: stable counting sort by row (over column-sorted order)
    {
        std::vector<int64_t> counts(nrows + 1, 0);
        for (int64_t i = 0; i < nnz; i++) {
            int64_t r = rows[i];
            if (r < 0 || r >= nrows) return -2;
            counts[r + 1]++;
        }
        for (int64_t r = 0; r < nrows; r++) counts[r + 1] += counts[r];
        std::vector<int64_t> rstart(counts.begin(), counts.end() - 1);
        for (int64_t k = 0; k < nnz; k++) {
            int64_t i = tmp_perm[k];
            perm[rstart[rows[i]]++] = i;
        }
        std::memcpy(rowptr, counts.data(), (nrows + 1) * sizeof(int64_t));
    }
    for (int64_t k = 0; k < nnz; k++) colind[k] = (int32_t)cols[perm[k]];
    return 0;
}

// CSR transpose (reference: data/transpose.rs:21): counting sort by column.
int transpose_csr(const int64_t* rowptr, const int32_t* colind, int64_t nrows,
                  int64_t ncols, int64_t* out_rowptr /* ncols+1 */,
                  int32_t* out_colind /* nnz */, int64_t* perm /* nnz */) {
    int64_t nnz = rowptr[nrows];
    std::vector<int64_t> counts(ncols + 1, 0);
    for (int64_t k = 0; k < nnz; k++) counts[colind[k] + 1]++;
    for (int64_t c = 0; c < ncols; c++) counts[c + 1] += counts[c];
    std::memcpy(out_rowptr, counts.data(), (ncols + 1) * sizeof(int64_t));
    std::vector<int64_t> cstart(counts.begin(), counts.end() - 1);
    for (int64_t r = 0; r < nrows; r++) {
        for (int64_t k = rowptr[r]; k < rowptr[r + 1]; k++) {
            int64_t pos = cstart[colind[k]]++;
            out_colind[pos] = (int32_t)r;
            perm[pos] = k;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Hash-based int64 ID index (reference: data/index.rs IDIndex).
struct IdIndex {
    std::unordered_map<int64_t, int32_t> map;
};

void* id_index_create(const int64_t* ids, int64_t n) {
    auto* idx = new IdIndex();
    idx->map.reserve((size_t)(n * 1.3));
    for (int64_t i = 0; i < n; i++) idx->map.emplace(ids[i], (int32_t)i);
    return idx;
}

void id_index_destroy(void* h) { delete (IdIndex*)h; }

void id_index_lookup(void* h, const int64_t* keys, int64_t n, int32_t* out) {
    auto* idx = (IdIndex*)h;
    for (int64_t i = 0; i < n; i++) {
        auto it = idx->map.find(keys[i]);
        out[i] = it == idx->map.end() ? -1 : it->second;
    }
}

// ---------------------------------------------------------------------------
// splitmix64 PRNG
static inline uint64_t splitmix64(uint64_t& state) {
    uint64_t z = (state += 0x9E3779B97f4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

static inline bool csr_contains_one(const int64_t* rowptr, const int32_t* colind,
                                    int64_t row, int32_t col) {
    const int32_t* lo = colind + rowptr[row];
    const int32_t* hi = colind + rowptr[row + 1];
    const int32_t* it = std::lower_bound(lo, hi, col);
    return it != hi && *it == col;
}

// Verified negative sampling (reference: data/sampling.rs:20): uniform draws
// with bounded rejection redraw against the user's sorted history.
void sample_negatives(const int64_t* rowptr, const int32_t* colind,
                      const int64_t* rows, int64_t n_rows_req, int64_t n_per,
                      int64_t n_cols, uint64_t seed, int32_t max_attempts,
                      int32_t* out /* n_rows_req * n_per */) {
    uint64_t state = seed ^ 0xD6E8FEB86659FD93ULL;
    for (int64_t i = 0; i < n_rows_req; i++) {
        int64_t r = rows[i];
        for (int64_t j = 0; j < n_per; j++) {
            int32_t cand = (int32_t)(splitmix64(state) % (uint64_t)n_cols);
            int attempts = 0;
            while (attempts < max_attempts && csr_contains_one(rowptr, colind, r, cand)) {
                cand = (int32_t)(splitmix64(state) % (uint64_t)n_cols);
                attempts++;
            }
            out[i * n_per + j] = cand;
        }
    }
}

// argtopn (reference: data/sorting.rs): indices of the n largest finite
// values, descending, ties by position.  Returns the number selected.
int64_t argtopn(const float* values, int64_t n_values, int64_t n,
                int64_t* out /* n */) {
    std::vector<int64_t> idx;
    idx.reserve(n_values);
    for (int64_t i = 0; i < n_values; i++) {
        if (values[i] == values[i]) idx.push_back(i);  // skip NaN
    }
    int64_t k = std::min<int64_t>(n, (int64_t)idx.size());
    auto cmp = [&](int64_t a, int64_t b) {
        if (values[a] != values[b]) return values[a] > values[b];
        return a < b;
    };
    std::partial_sort(idx.begin(), idx.begin() + k, idx.end(), cmp);
    std::copy(idx.begin(), idx.begin() + k, out);
    return k;
}

}  // extern "C"
