// CPU item-kNN similarity-build baseline — a faithful C++ reimplementation
// of the reference's Rust kernel (reference: src/accel/knn/item_train.rs:95
// streaming CSR x CSR^T row sweep with min_sim filter and top-k truncation;
// rayon par_iter -> OpenMP parallel for).  Used by
// benchmarks/_measure_knn_cpu_baseline.py to produce the measured CPU
// denominator for bench.py's kNN-build number (the reference itself cannot
// be installed here: its accelerator needs rustc, absent from this image).
//
// Build: g++ -O3 -march=native -fopenmp -o knn_cpu_baseline knn_cpu_baseline.cpp
// Run:   ./knn_cpu_baseline <dir> <k> <min_sim>
//   <dir> holds iu.rowptr (int64), iu.colind (int32), iu.values (f32) — the
//   L2-NORMALIZED item x user matrix — and ui.* (its transpose), plus
//   meta.txt with "n_items n_users nnz".

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

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

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s <dir> <k> <min_sim>\n", argv[0]); return 1; }
    std::string dir = argv[1];
    int k = atoi(argv[2]);
    float min_sim = (float)atof(argv[3]);

    long n_items, n_users, nnz;
    {
        auto meta = read_file(dir + "/meta.txt");
        meta.push_back(0);
        sscanf(meta.data(), "%ld %ld %ld", &n_items, &n_users, &nnz);
    }
    auto iu_rp = read_file(dir + "/iu.rowptr");
    auto iu_ci = read_file(dir + "/iu.colind");
    auto iu_v = read_file(dir + "/iu.values");
    auto ui_rp = read_file(dir + "/ui.rowptr");
    auto ui_ci = read_file(dir + "/ui.colind");
    auto ui_v = read_file(dir + "/ui.values");
    const int64_t* irp = (const int64_t*)iu_rp.data();
    const int32_t* ici = (const int32_t*)iu_ci.data();
    const float* iv = (const float*)iu_v.data();
    const int64_t* urp = (const int64_t*)ui_rp.data();
    const int32_t* uci = (const int32_t*)ui_ci.data();
    const float* uv = (const float*)ui_v.data();

    // outputs: per-item top-k neighbor ids + sims (the reference streams
    // rows into a chunked Arrow CSR; a flat array is equivalent work)
    std::vector<int32_t> out_idx((size_t)n_items * k, -1);
    std::vector<float> out_sim((size_t)n_items * k, 0.0f);

    auto t0 = std::chrono::steady_clock::now();
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        // per-thread dense accumulator + touched list (sparse reset)
        std::vector<float> acc(n_items, 0.0f);
        std::vector<int32_t> touched;
        touched.reserve(4096);
        std::vector<std::pair<float, int32_t>> heap;
        heap.reserve(k + 1);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 16)
#endif
        for (long a = 0; a < n_items; a++) {
            touched.clear();
            for (int64_t p = irp[a]; p < irp[a + 1]; p++) {
                int32_t u = ici[p];
                float va = iv[p];
                for (int64_t q = urp[u]; q < urp[u + 1]; q++) {
                    int32_t b = uci[q];
                    if (acc[b] == 0.0f) touched.push_back(b);
                    acc[b] += va * uv[q];
                }
            }
            // min_sim filter + k-smallest-heap truncation (reference
            // item_train.rs keeps a bounded heap per row)
            heap.clear();
            for (int32_t b : touched) {
                float s = acc[b];
                acc[b] = 0.0f;
                if (b == (int32_t)a || s < min_sim) continue;
                if ((int)heap.size() < k) {
                    heap.emplace_back(s, b);
                    std::push_heap(heap.begin(), heap.end(), std::greater<>());
                } else if (s > heap.front().first) {
                    std::pop_heap(heap.begin(), heap.end(), std::greater<>());
                    heap.back() = {s, b};
                    std::push_heap(heap.begin(), heap.end(), std::greater<>());
                }
            }
            std::sort_heap(heap.begin(), heap.end(), std::greater<>());
            for (size_t t = 0; t < heap.size(); t++) {
                out_sim[(size_t)a * k + t] = heap[t].first;
                out_idx[(size_t)a * k + t] = heap[t].second;
            }
        }
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    // checksum so the compiler cannot elide the build
    double chk = 0;
    for (long a = 0; a < n_items; a++) chk += out_sim[(size_t)a * k];
    int threads = 1;
#ifdef _OPENMP
    threads = omp_get_max_threads();
#endif
    printf("{\"secs\": %.3f, \"n_items\": %ld, \"k\": %d, \"threads\": %d, \"checksum\": %.4f}\n",
           secs, n_items, k, threads, chk);
    return 0;
}
