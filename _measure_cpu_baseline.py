"""Measure the CPU implicit-ALS baseline (VERDICT r1 item 4).

Generates the same synthetic ML-20M dataset bench.py uses, exports the
CSRs, builds cpp/als_cpu_baseline.cpp (a faithful C++/OpenMP port of the
reference's Rust kernel — the reference itself is uninstallable here: its
accelerator needs rustc, absent from this image), and measures
examples/s.  The result goes into bench.py's CPU_BASELINE constants.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from bench import N_USERS, N_ITEMS, K, synth_dataset


def main():
    rng = np.random.default_rng(42)
    t0 = time.time()
    ui, nnz = synth_dataset(rng)
    iu = ui.transpose()
    print(f"dataset: {nnz} nnz ({time.time()-t0:.1f}s)", file=sys.stderr)

    with tempfile.TemporaryDirectory() as d:
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
        out = subprocess.run([exe, d, str(K), "2"], check=True, capture_output=True, text=True)
        print(out.stdout.strip())
        res = json.loads(out.stdout.strip())
        print(f"CPU baseline: {res['examples_per_s']:.3e} examples/s on {res['threads']} threads",
              file=sys.stderr)


if __name__ == "__main__":
    main()
