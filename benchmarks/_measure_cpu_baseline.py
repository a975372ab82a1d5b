"""Measure the CPU implicit-ALS baseline (VERDICT r1 item 4).

Generates the identical synthetic ML-20M dataset and holdout split bench.py
uses, exports the CSRs, builds cpp/als_cpu_baseline.cpp (a faithful
C++/OpenMP port of the reference's Rust kernel — the reference itself is
uninstallable here: its accelerator needs rustc, absent from this image),
measures examples/s over 2 timed epochs, then continues to 10 total epochs
and evaluates NDCG@10 on the same split with the same eval code bench.py
uses.  The results go into bench.py's CPU_BASELINE_* constants and
BASELINE_CPU.json.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"

from bench import K, N_ITEMS, N_USERS, ndcg10, split_holdout, synth_interactions


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lkpy_tpu.data.matrix import CSR

    rng = np.random.default_rng(42)
    t0 = time.time()
    all_u, all_i = synth_interactions(rng)
    train_mask, test_u, test_i = split_holdout(all_u, all_i, rng)
    tr_u, tr_i = all_u[train_mask], all_i[train_mask]
    nnz = len(tr_u)
    vals = np.full(nnz, 40.0, dtype=np.float32)
    ui = CSR.from_coo(tr_u, tr_i, vals, (N_USERS, N_ITEMS))
    iu = ui.transpose()
    print(f"dataset: {nnz} train nnz ({time.time()-t0:.1f}s)", file=sys.stderr)

    d = "/tmp/cpu_baseline"
    os.makedirs(d, exist_ok=True)
    for name, csr in (("ui", ui), ("iu", iu)):
        csr.rowptr.astype(np.int64).tofile(f"{d}/{name}.rowptr")
        csr.colind.astype(np.int32).tofile(f"{d}/{name}.colind")
        csr.values.astype(np.float32).tofile(f"{d}/{name}.values")
    with open(f"{d}/meta.txt", "w") as f:
        f.write(f"{N_USERS} {N_ITEMS} {nnz}\n")

    exe = f"{d}/als_cpu_baseline"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-funroll-loops", "-fopenmp",
         "-o", exe, "/root/repo/cpp/als_cpu_baseline.cpp"],
        check=True,
    )
    # 1 warm + 2 timed epochs, then 7 more (10 total) and dump factors
    out = subprocess.run([exe, d, str(K), "2", "7"], check=True, capture_output=True, text=True)
    print(out.stdout.strip())
    res = json.loads(out.stdout.strip())

    U = np.fromfile(f"{d}/U.f32", dtype=np.float32).reshape(N_USERS, K)
    I = np.fromfile(f"{d}/I.f32", dtype=np.float32).reshape(N_ITEMS, K)

    # same recommend+eval path as bench.py
    import pandas as pd

    test_user_ids = np.unique(test_u)
    hist = pd.DataFrame({"u": tr_u, "i": tr_i}).groupby("u")["i"].apply(set)
    scores = None
    rec_users, rec10 = [], []
    chunk = 4096
    for lo in range(0, len(test_user_ids), chunk):
        batch = test_user_ids[lo : lo + chunk]
        s = U[batch] @ I.T
        idx = np.argsort(-s, axis=1)[:, : 10 + 64]
        for b_u, row in zip(batch, idx):
            h = hist.get(b_u, ())
            row = [r for r in row if r not in h][:10]
            rec_users.append(b_u)
            rec10.append(row)
    nd = ndcg10(rec_users, rec10, test_u, test_i)
    res["ndcg_at_10"] = round(nd, 4)
    print(f"CPU baseline: {res['examples_per_s']:.3e} examples/s on {res['threads']} threads; "
          f"NDCG@10 = {nd:.4f}", file=sys.stderr)
    with open("/root/repo/BASELINE_CPU.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
