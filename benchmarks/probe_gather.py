"""Gather-wall probe (VERDICT r4 next-#3): can a hand-written Pallas kernel
beat XLA's TPU gather at the ALS factor-row shapes?

Measured on the v5e (2026-08-22, this file's runs):

=========================  =============  ==========================
variant                     rate           notes
=========================  =============  ==========================
a. XLA gather (k=128, 4M)   ~362 M rows/s  table 27k rows
a. XLA gather (k=64, 4M)    ~253 M rows/s  table 27k rows
a. XLA gather (k=128, 4M)    ~92 M rows/s  table 131k rows (VMEM miss)
b. Pallas DMA, depth-1      ~2.7 M rows/s  one row-DMA at a time
b. Pallas DMA, depth-8       ~10 M rows/s  8 descriptors in flight
c. VMEM per-row copy         ~15 M rows/s  table VMEM-resident
=========================  =============  ==========================

Conclusion: **the XLA gather wall is hardware truth.**  Per-row DMA pays
~100 ns of descriptor issue + semaphore traffic per row even when
pipelined; a per-row VMEM copy pays ~70 ns of loop/dynamic-slice control
flow.  XLA's gather lowers to the VPU's vectorized dynamic-gather
sequence at ~4 ns/row — an issue-rate limit no manual data movement
undercuts, because the bottleneck is not memory bandwidth (256 B/row ×
253 M rows/s ≈ 65 GB/s, an order below HBM) but per-row address handling.
The ~170 M examples/s implicit-ALS formulation ceiling derived in
docs/guide/performance.md therefore stands.

Mosaic notes for the record (cost several bisection rounds):
- A (N, 64) f32 table gets (1, 128) lane tiling; row slices of width 64
  fail verification — DMA row gathers need 128-lane-aligned rows.
- Scalar-prefetch operands live whole in SMEM (1 MB): a 4M-entry int32
  index array OOMs SMEM, so the index set must be chunked per call.
- SMEM-blocked *inputs* (BlockSpec(memory_space=SMEM) with an index_map)
  crash the Mosaic compiler subprocess outright; scalar prefetch is the
  only working way to hand row indices to DMA code.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 128  # row width: DMA row slices must be 128-lane aligned (see module doc)
M = 1 << 16  # rows gathered per call (index set must fit SMEM for b/c)
ROWS = 512  # rows per grid step
DEPTH = 8  # DMAs in flight


def bench(fn, idx, label, want=None, reps=6):
    try:
        out = fn(idx)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(idx)
        jax.block_until_ready(out)
        r = M * reps / (time.perf_counter() - t0)
        ok = "" if want is None else f" (correct={np.array_equal(np.asarray(out), want)})"
        print(f"  {label}: {r / 1e6:7.1f} M rows/s{ok}")
        return out
    except Exception as e:  # record failures honestly
        print(f"  {label}: FAILED ({type(e).__name__}: {str(e)[:160]})")
        return None


def _dma_kernel(idx_ref, table_ref, out_ref, sems):
    base = pl.program_id(0) * ROWS

    def dma(j, slot):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[base + j], 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[slot],
        )

    for j in range(DEPTH):
        dma(j, j).start()

    def body(j, _):
        dma(j, j % DEPTH).wait()
        dma(j + DEPTH, (j + DEPTH) % DEPTH).start()
        return 0

    jax.lax.fori_loop(0, ROWS - DEPTH, body, 0)

    def drain(j, _):
        dma(j, j % DEPTH).wait()
        return 0

    jax.lax.fori_loop(ROWS - DEPTH, ROWS, drain, 0)


def _vmem_rowcopy_kernel(idx_ref, table_ref, out_ref):
    base = pl.program_id(0) * ROWS

    def body(j, _):
        out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(idx_ref[base + j], 1), :]
        return 0

    jax.lax.fori_loop(0, ROWS, body, 0)


def make_pallas(table, kernel, table_space, scratch):
    @jax.jit
    def f(idx):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // ROWS,),
            in_specs=[pl.BlockSpec(memory_space=table_space)],
            out_specs=pl.BlockSpec((ROWS, K), lambda s, i: (s, 0), memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, K), table.dtype),
            grid_spec=gs,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)

    return f


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(42)
    for n_rows in (27_000, 131_072):
        table = jnp.asarray(rng.standard_normal((n_rows, K)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n_rows, M).astype(np.int32))
        print(f"--- table ({n_rows}, {K}) f32, {M} rows/call ---")
        want_dev = jax.jit(lambda i, t=table: t[i])(idx)
        want = np.asarray(want_dev)
        # XLA baseline at a large batch (4M rows/call) — at M=65k the ~25ms
        # remote dispatch latency dominates and understates the gather rate
        M_XLA = 1 << 22
        idx_big = jnp.asarray(rng.integers(0, n_rows, M_XLA).astype(np.int32))
        g = jax.jit(lambda i, t=table: t[i])
        jax.block_until_ready(g(idx_big))
        t0 = time.perf_counter()
        for _ in range(6):
            out = g(idx_big)
        jax.block_until_ready(out)
        print(f"  a. XLA gather (4M rows/call): {M_XLA * 6 / (time.perf_counter() - t0) / 1e6:7.1f} M rows/s")
        bench(jax.jit(lambda i, t=table: t[i]), idx, "a. XLA gather (65k) ")
        bench(
            make_pallas(table, _dma_kernel, pl.ANY, [pltpu.SemaphoreType.DMA((DEPTH,))]),
            idx,
            "b. Pallas DMA depth8",
            want,
        )
        if n_rows * K * 4 <= 14 << 20:
            bench(
                make_pallas(table, _vmem_rowcopy_kernel, pltpu.VMEM, []),
                idx,
                "c. VMEM row copy    ",
                want,
            )


if __name__ == "__main__":
    main()
