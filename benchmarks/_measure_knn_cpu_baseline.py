"""Measure the CPU item-kNN similarity-build baseline (VERDICT r2 #8).

Generates the identical synthetic ML-20M dataset bench.py uses, L2-normalizes
the implicit item x user matrix with the SAME code bench.py uses
(lkpy_tpu.ops.knn.normalize_item_matrix), exports the CSRs, builds
cpp/knn_cpu_baseline.cpp (a faithful C++/OpenMP port of the reference's Rust
row sweep, src/accel/knn/item_train.rs:95), and times the k=64 build.  The
result is merged into BASELINE_CPU.json as ``knn_build_secs`` and used by
bench.py's vs_baseline reporting for the kNN workload.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"

from bench import N_ITEMS, N_USERS, split_holdout, synth_interactions


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops.knn import normalize_item_matrix

    rng = np.random.default_rng(42)
    t0 = time.time()
    all_u, all_i = synth_interactions(rng)
    train_mask, _tu, _ti = split_holdout(all_u, all_i, rng)
    tr_u, tr_i = all_u[train_mask], all_i[train_mask]
    nnz = len(tr_u)
    vals = np.ones(nnz, dtype=np.float32)
    ui = CSR.from_coo(tr_u, tr_i, vals, (N_USERS, N_ITEMS))
    iu = ui.transpose()
    normed, _means = normalize_item_matrix(iu, explicit=False)
    normed_t = normed.transpose()
    print(f"dataset: {nnz} train nnz ({time.time()-t0:.1f}s)", file=sys.stderr)

    d = "/tmp/knn_cpu_baseline"
    os.makedirs(d, exist_ok=True)
    for name, csr in (("iu", normed), ("ui", normed_t)):
        csr.rowptr.astype(np.int64).tofile(f"{d}/{name}.rowptr")
        csr.colind.astype(np.int32).tofile(f"{d}/{name}.colind")
        vv = csr.values if csr.values is not None else np.ones(csr.nnz, np.float32)
        vv.astype(np.float32).tofile(f"{d}/{name}.values")
    with open(f"{d}/meta.txt", "w") as f:
        f.write(f"{N_ITEMS} {N_USERS} {nnz}\n")

    exe = f"{d}/knn_cpu_baseline"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-funroll-loops", "-fopenmp",
         "-o", exe, "/root/repo/cpp/knn_cpu_baseline.cpp"],
        check=True,
    )
    out = subprocess.run([exe, d, "64", "1e-6"], check=True, capture_output=True, text=True)
    print(out.stdout.strip())
    res = json.loads(out.stdout.strip())

    base_path = "/root/repo/BASELINE_CPU.json"
    with open(base_path) as f:
        base = json.load(f)
    base["knn_build_secs"] = res["secs"]
    base["knn_build_threads"] = res["threads"]
    base["knn_build_k"] = res["k"]
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"kNN CPU baseline: {res['secs']:.1f}s on {res['threads']} threads", file=sys.stderr)


if __name__ == "__main__":
    main()
