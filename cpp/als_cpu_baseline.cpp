// CPU implicit-ALS baseline — a faithful C++ reimplementation of the
// reference's Rust kernel (reference: src/accel/als/implicit.rs:26 per-row
// rank-restricted update; src/accel/als/explicit.rs:81 gather + Gram +
// Cholesky; rayon par_iter -> OpenMP parallel for).  Used by
// _measure_cpu_baseline.py to produce the measured denominator for
// bench.py's vs_baseline (the reference itself cannot be installed in this
// image: its accelerator needs a Rust toolchain, which is absent).
//
// Build: g++ -O3 -march=native -fopenmp -o als_cpu_baseline als_cpu_baseline.cpp
// Run:   ./als_cpu_baseline <dir> <k> <epochs>
//   <dir> holds ui.rowptr (int64), ui.colind (int32), ui.values (f32) and
//   iu.* equivalents, plus meta.txt with "n_users n_items nnz".

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <string>
#include <chrono>
#include <random>

#ifdef _OPENMP
#include <omp.h>
#endif

static std::vector<char> read_file(const std::string& path) {
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(n);
    if (fread(buf.data(), 1, n, f) != (size_t)n) { fprintf(stderr, "short read %s\n", path.c_str()); exit(1); }
    fclose(f);
    return buf;
}

// in-place Cholesky factorization + solve (the reference resolves LAPACK
// sposv; same algorithm, k is small so a textbook loop is representative)
static bool cholesky_solve(float* A, float* y, int k) {
    for (int j = 0; j < k; j++) {
        float d = A[j * k + j];
        for (int p = 0; p < j; p++) d -= A[j * k + p] * A[j * k + p];
        if (d <= 0) return false;
        d = std::sqrt(d);
        A[j * k + j] = d;
        for (int i = j + 1; i < k; i++) {
            float s = A[i * k + j];
            for (int p = 0; p < j; p++) s -= A[i * k + p] * A[j * k + p];
            A[i * k + j] = s / d;
        }
    }
    // L z = y
    for (int i = 0; i < k; i++) {
        float s = y[i];
        for (int p = 0; p < i; p++) s -= A[i * k + p] * y[p];
        y[i] = s / A[i * k + i];
    }
    // L^T x = z
    for (int i = k - 1; i >= 0; i--) {
        float s = y[i];
        for (int p = i + 1; p < k; p++) s -= A[p * k + i] * y[p];
        y[i] = s / A[i * k + i];
    }
    return true;
}

struct Csr {
    const int64_t* rowptr;
    const int32_t* colind;
    const float* values;  // confidence deltas c = w (implicit)
    int64_t nrows;
};

// One implicit-ALS half-epoch (reference implicit.rs:26): for each row,
// A = OtOr + sum_i c_i y_i y_i^T,  b = sum_i (c_i + 1) y_i,  solve A x = b.
// Implemented in main()'s run_half lambda.

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s <dir> <k> <epochs> [extra_epochs_then_dump]\n", argv[0]); return 1; }
    std::string dir = argv[1];
    int k = atoi(argv[2]);
    int epochs = atoi(argv[3]);
    int extra = argc > 4 ? atoi(argv[4]) : 0;

    long n_users, n_items, nnz;
    {
        auto meta = read_file(dir + "/meta.txt");
        meta.push_back(0);
        sscanf(meta.data(), "%ld %ld %ld", &n_users, &n_items, &nnz);
    }
    auto ui_rp = read_file(dir + "/ui.rowptr");
    auto ui_ci = read_file(dir + "/ui.colind");
    auto ui_v = read_file(dir + "/ui.values");
    auto iu_rp = read_file(dir + "/iu.rowptr");
    auto iu_ci = read_file(dir + "/iu.colind");
    auto iu_v = read_file(dir + "/iu.values");
    Csr ui{(const int64_t*)ui_rp.data(), (const int32_t*)ui_ci.data(), (const float*)ui_v.data(), n_users};
    Csr iu{(const int64_t*)iu_rp.data(), (const int32_t*)iu_ci.data(), (const float*)iu_v.data(), n_items};

    std::mt19937_64 rng(42);
    std::normal_distribution<float> nd(0.0f, 0.01f);
    std::vector<float> U(n_users * k), I(n_items * k);
    for (auto& x : U) { float v = nd(rng); x = v * v; }
    for (auto& x : I) { float v = nd(rng); x = v * v; }

    float reg = 0.1f;

    auto run_half = [&](const Csr& m, float* left, const float* right, long n_right) {
        // OtOr = R^T R + reg I
        std::vector<float> otor(k * k, 0.0f);
#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            std::vector<float> local(k * k, 0.0f);
#ifdef _OPENMP
#pragma omp for nowait
#endif
            for (long r = 0; r < n_right; r++) {
                const float* y = right + (size_t)r * k;
                for (int a = 0; a < k; a++)
                    for (int b = 0; b < k; b++) local[a * k + b] += y[a] * y[b];
            }
#ifdef _OPENMP
#pragma omp critical
#endif
            for (int t = 0; t < k * k; t++) otor[t] += local[t];
        }
        for (int a = 0; a < k; a++) otor[a * k + a] += reg;

#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            std::vector<float> A(k * k), b(k);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 64)
#endif
            for (long r = 0; r < m.nrows; r++) {
                int64_t s = m.rowptr[r], e = m.rowptr[r + 1];
                if (s == e) continue;
                memcpy(A.data(), otor.data(), sizeof(float) * k * k);
                memset(b.data(), 0, sizeof(float) * k);
                for (int64_t p = s; p < e; p++) {
                    const float* y = right + (size_t)m.colind[p] * k;
                    float c = m.values[p];
                    float c1 = c + 1.0f;
                    // rank-1 update of A and b (vectorizes over the inner k)
                    for (int a = 0; a < k; a++) {
                        float ca = c * y[a];
                        float* Arow = A.data() + a * k;
                        for (int bb = 0; bb < k; bb++) Arow[bb] += ca * y[bb];
                        b[a] += c1 * y[a];
                    }
                }
                if (cholesky_solve(A.data(), b.data(), k))
                    memcpy(left + (size_t)r * k, b.data(), sizeof(float) * k);
            }
        }
    };

    // warm epoch (page-in)
    run_half(ui, U.data(), I.data(), n_items);
    run_half(iu, I.data(), U.data(), n_users);

    auto t0 = std::chrono::steady_clock::now();
    for (int ep = 0; ep < epochs; ep++) {
        run_half(ui, U.data(), I.data(), n_items);
        run_half(iu, I.data(), U.data(), n_users);
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double examples_per_s = (double)nnz * 2.0 * epochs / secs;
    // optional extra epochs + factor dump (for NDCG parity evaluation)
    for (int ep = 0; ep < extra; ep++) {
        run_half(ui, U.data(), I.data(), n_items);
        run_half(iu, I.data(), U.data(), n_users);
    }
    if (extra > 0) {
        FILE* fu = fopen((dir + "/U.f32").c_str(), "wb");
        fwrite(U.data(), sizeof(float), U.size(), fu);
        fclose(fu);
        FILE* fi = fopen((dir + "/I.f32").c_str(), "wb");
        fwrite(I.data(), sizeof(float), I.size(), fi);
        fclose(fi);
    }
    int threads = 1;
#ifdef _OPENMP
    threads = omp_get_max_threads();
#endif
    printf("{\"epochs\": %d, \"secs\": %.3f, \"examples_per_s\": %.1f, \"threads\": %d}\n",
           epochs, secs, examples_per_s, threads);
    return 0;
}
