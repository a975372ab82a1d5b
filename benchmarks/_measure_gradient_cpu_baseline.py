"""Measure CPU baselines for the gradient-trained family (VERDICT r4 #4).

The reference trains FlexMF and LightGCN with torch on CPU
(reference: src/lenskit/flexmf/_training.py:39 — minibatch AdamW/SparseAdam
over embedding tables; src/lenskit/graphs/lightgcn.py:312 — BPR loss over
torch_geometric LightGCN propagation).  This script ports those training
loops to plain torch-CPU (PyG is not in this image; the LightGCN
propagation is the standard symmetric-normalized bipartite SpMM) on the
SAME synthetic ML-20M dataset bench.py uses, with 2 threads, and reports
examples/s for:

- FlexMF-BPR: pairwise logistic loss, 1 uniform negative/positive,
  sparse embedding gradients + SparseAdam (the reference's optimizer for
  embedding-dominant models), batch 32768 — matching bench.py's config.
- LightGCN: 2 propagation layers over the full bipartite graph per batch
  (the reference recomputes propagation per training batch), BPR loss,
  Adam, batch 32768.

LightGCN's CPU epoch is hours long (each batch pays a full-graph SpMM);
its rate is measured over a handful of batches and extrapolated — noted
in the output.

Writes the numbers into BASELINE_CPU.json for bench.py's vs_baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

THREADS = 2


def main():
    import torch

    torch.set_num_threads(THREADS)
    from bench import N_ITEMS, N_USERS, split_holdout, synth_interactions

    rng = np.random.default_rng(42)
    all_u, all_i = synth_interactions(rng)
    train_mask, test_u, test_i = split_holdout(all_u, all_i, rng)
    tr_u = all_u[train_mask]
    tr_i = all_i[train_mask]
    nnz = len(tr_u)
    print(f"dataset: {nnz} train interactions", file=sys.stderr)

    K = 64
    B = 32768
    results = {}

    # ---- FlexMF-BPR (reference: flexmf/_training.py:39, _implicit.py:399) --
    g = torch.Generator().manual_seed(42)
    u_emb = torch.nn.Embedding(N_USERS, K, sparse=True)
    i_emb = torch.nn.Embedding(N_ITEMS, K, sparse=True)
    i_bias = torch.nn.Embedding(N_ITEMS, 1, sparse=True)
    with torch.no_grad():
        u_emb.weight.normal_(0, 0.05, generator=g)
        i_emb.weight.normal_(0, 0.05, generator=g)
        i_bias.weight.zero_()
    opt = torch.optim.SparseAdam(
        list(u_emb.parameters()) + list(i_emb.parameters()) + list(i_bias.parameters()),
        lr=0.01,
    )
    users_t = torch.from_numpy(tr_u)
    items_t = torch.from_numpy(tr_i)

    def bpr_batch(idx):
        u = users_t[idx]
        pos = items_t[idx]
        neg = torch.randint(0, N_ITEMS, (len(idx),), generator=g)
        pu = u_emb(u)
        s_pos = (pu * i_emb(pos)).sum(-1) + i_bias(pos).squeeze(-1)
        s_neg = (pu * i_emb(neg)).sum(-1) + i_bias(neg).squeeze(-1)
        loss = -torch.nn.functional.logsigmoid(s_pos - s_neg).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

    perm = torch.randperm(nnz, generator=g)
    for w in range(3):  # warm
        bpr_batch(perm[w * B : (w + 1) * B])
    n_meas = 40
    t0 = time.perf_counter()
    for b in range(3, 3 + n_meas):
        bpr_batch(perm[b * B : (b + 1) * B])
    dt = time.perf_counter() - t0
    bpr_rate = n_meas * B / dt
    print(f"FlexMF-BPR CPU ({THREADS} threads): {bpr_rate:.3e} examples/s ({n_meas} batches of {B})")
    results["flexmf_bpr_examples_per_s"] = round(bpr_rate, 1)
    results["flexmf_bpr_batches_measured"] = n_meas

    # ---- LightGCN (reference: graphs/lightgcn.py:186 propagation, :312 BPR)
    n_nodes = N_USERS + N_ITEMS
    src = np.concatenate([tr_u, tr_i + N_USERS])
    dst = np.concatenate([tr_i + N_USERS, tr_u])
    deg = np.bincount(src, minlength=n_nodes).astype(np.float32)
    w = 1.0 / np.sqrt(np.maximum(deg[src] * deg[dst], 1.0))
    A = torch.sparse_coo_tensor(
        torch.from_numpy(np.stack([src, dst])),
        torch.from_numpy(w.astype(np.float32)),
        (n_nodes, n_nodes),
    ).coalesce()
    emb = torch.nn.Parameter(torch.empty(n_nodes, K).normal_(0, 0.05, generator=g))
    opt2 = torch.optim.Adam([emb], lr=0.01)
    n_layers = 2

    def propagate():
        x = emb
        acc = emb
        for _ in range(n_layers):
            x = torch.sparse.mm(A, x)
            acc = acc + x
        return acc / (n_layers + 1)

    def lgcn_batch(idx):
        u = users_t[idx]
        pos = items_t[idx] + N_USERS
        neg = torch.randint(0, N_ITEMS, (len(idx),), generator=g) + N_USERS
        z = propagate()
        s_pos = (z[u] * z[pos]).sum(-1)
        s_neg = (z[u] * z[neg]).sum(-1)
        loss = -torch.nn.functional.logsigmoid(s_pos - s_neg).mean()
        opt2.zero_grad()
        loss.backward()
        opt2.step()

    lgcn_batch(perm[:B])  # warm
    n_meas = 4
    t0 = time.perf_counter()
    for b in range(1, 1 + n_meas):
        lgcn_batch(perm[b * B : (b + 1) * B])
    dt = time.perf_counter() - t0
    lgcn_rate = n_meas * B / dt
    print(
        f"LightGCN CPU ({THREADS} threads, {n_layers} layers): {lgcn_rate:.3e} examples/s "
        f"(extrapolated from {n_meas} batches; full epoch would take {nnz / lgcn_rate / 60:.0f} min)"
    )
    results["lightgcn_examples_per_s"] = round(lgcn_rate, 1)
    results["lightgcn_batches_measured"] = n_meas
    results["lightgcn_layers"] = n_layers
    results["gradient_threads"] = THREADS

    path = "/root/repo/BASELINE_CPU.json"
    with open(path) as f:
        base = json.load(f)
    base.update(results)
    with open(path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"updated {path}")


if __name__ == "__main__":
    main()
