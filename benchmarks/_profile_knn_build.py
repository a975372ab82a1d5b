"""Profile the TPU item-kNN similarity build phase-by-phase (VERDICT r3).

Runs on the real TPU (default env).  Breaks the 27k-item build into:
host prep / Gram accumulation chunks / top-k tiles, and tries a bf16-input
Gram variant to see the MXU headroom.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import N_ITEMS, N_USERS, split_holdout, synth_interactions


def main():
    import jax
    import jax.numpy as jnp

    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops.knn import normalize_item_matrix

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(42)
    t0 = time.time()
    all_u, all_i = synth_interactions(rng)
    train_mask, _tu, _ti = split_holdout(all_u, all_i, rng)
    tr_u, tr_i = all_u[train_mask], all_i[train_mask]
    nnz = len(tr_u)
    ui = CSR.from_coo(tr_u, tr_i, np.ones(nnz, np.float32), (N_USERS, N_ITEMS))
    iu = ui.transpose()
    print(f"dataset {nnz} nnz ({time.time()-t0:.1f}s)", file=sys.stderr)

    t0 = time.time()
    normed, _ = normalize_item_matrix(iu, explicit=False)
    print(f"normalize: {time.time()-t0:.2f}s", file=sys.stderr)

    # phase-by-phase copy of similarity_topk's large path
    from functools import partial

    n_items, n_users = normed.shape
    max_dense_bytes = 4 << 30
    user_chunk = max(max_dense_bytes // (n_items * 4), 1024)
    t0 = time.time()
    ui_n = normed.transpose()
    print(f"transpose: {time.time()-t0:.2f}s", file=sys.stderr)

    t0 = time.time()
    chunks = []
    for ulo in range(0, n_users, user_chunk):
        uhi = min(ulo + user_chunk, n_users)
        s, e = int(ui_n.rowptr[ulo]), int(ui_n.rowptr[uhi])
        lens = (ui_n.rowptr[ulo + 1 : uhi + 1] - ui_n.rowptr[ulo:uhi]).astype(np.int64)
        rel = np.repeat(np.arange(uhi - ulo, dtype=np.int32), lens)
        chunks.append((rel, ui_n.colind[s:e], ui_n.values[s:e]))
    print(f"host chunk prep ({len(chunks)} chunks of {user_chunk} users): {time.time()-t0:.2f}s", file=sys.stderr)

    def pad_pow2(n):
        p = 8
        while p < n:
            p *= 2
        return p

    nnz_pad = pad_pow2(max(len(c[0]) for c in chunks))

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("n_rows", "n_cols", "bf16"))
    def gram(S, rel, cols, vals, n_rows, n_cols, bf16):
        U = jnp.zeros((n_rows, n_cols), dtype=jnp.bfloat16 if bf16 else jnp.float32)
        U = U.at[rel, cols].set(vals.astype(U.dtype), mode="drop")
        return S + jnp.dot(U.T, U, preferred_element_type=jnp.float32)

    for bf16 in (False, True):
        S = jnp.zeros((n_items, n_items), dtype=jnp.float32)
        t0 = time.time()
        first = True
        for rel, cc, vv in chunks:
            pad = nnz_pad - len(rel)
            rel_p = np.pad(rel, (0, pad), constant_values=user_chunk)
            cc_p = np.pad(cc, (0, pad))
            vv_p = np.pad(vv, (0, pad))
            S = gram(S, jnp.asarray(rel_p), jnp.asarray(cc_p), jnp.asarray(vv_p), user_chunk, n_items, bf16)
            jax.block_until_ready(S)
            if first:
                print(f"  gram[bf16={bf16}] first chunk (compile+run): {time.time()-t0:.2f}s", file=sys.stderr)
                first = False
        total = time.time() - t0
        flops = 2.0 * n_items * n_items * n_users
        print(f"gram[bf16={bf16}]: {total:.2f}s  ({flops/total/1e12:.1f} TF/s)", file=sys.stderr)

    # top-k tiles (approx path, k=64)
    from lkpy_tpu.ops.knn import _tile_topk_at

    k = 64
    tile = 2048
    min_sim = jnp.float32(1e-6)
    t0 = time.time()
    outs = []
    for lo in range(0, n_items, tile):
        start = min(lo, n_items - tile)
        sims, idx = _tile_topk_at(S, jnp.int32(start), min_sim, k, tile, True)
        outs.append(np.asarray(sims))
    print(f"topk tiles approx: {time.time()-t0:.2f}s", file=sys.stderr)
    t0 = time.time()
    for lo in range(0, n_items, tile):
        start = min(lo, n_items - tile)
        sims, idx = _tile_topk_at(S, jnp.int32(start), min_sim, k, tile, False)
        np.asarray(sims)
    print(f"topk tiles exact: {time.time()-t0:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
