"""Pallas per-row DMA gather rate vs XLA's gather (measured ~1.9e7 rows/s,
~53ns/row on v5e): if in-kernel async copies from an HBM-resident table can
issue meaningfully faster (or overlap with compute), the MSM accumulate's
dominant cost disappears.  Measures a ring of NSEM in-flight single-row
DMAs driven by scalar-prefetched indices, and a chunked variant (CH
consecutive rows per descriptor — the rate a bucket-sorted layout unlocks).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/zprize_tpu_jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 22              # table rows
# u32 words per row: the packed TE row is 40 words, but Mosaic DMA slices
# must align to the (1,128) HBM tile — pad to a full lane tile (512 B/row).
ROWS = 128
T = 512                  # rows gathered per grid step
NSEM = 16                # DMAs in flight
TILES = 128              # total rows gathered = T * TILES (idx lives in
                         # SMEM: keep T*TILES*4B well under the 1MB budget)


REPEAT = 16              # in-kernel repetitions (amortize the ~30ms
                         # per-dispatch tunnel overhead out of the signal)


def make_bench(chunk: int):
    """chunk=1: one row per DMA (random rows); chunk>1: `chunk` consecutive
    rows per DMA (sorted-layout model), T/chunk descriptors per tile."""
    n_dma = T // chunk

    def kernel(idx_ref, table_ref, out_ref, scratch, sems):
        t_grid = pl.program_id(0)
        t = jax.lax.rem(t_grid, TILES)
        base = t * n_dma

        def copy(i, slot):
            r = idx_ref[base + i]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(r, chunk)],
                scratch.at[pl.ds(slot * chunk, chunk)],
                sems.at[slot])

        def body(i, _):
            slot = jax.lax.rem(i, NSEM)
            copy(i, slot).start()
            # retire the copy that used this slot NSEM iterations ago
            @pl.when(i >= NSEM - 1)
            def _():
                j = i - (NSEM - 1)
                copy(j, jax.lax.rem(j, NSEM)).wait()
            return 0

        jax.lax.fori_loop(0, n_dma, body, 0)

        def drain(i, _):
            j = n_dma - (NSEM - 1) + i
            @pl.when(jnp.logical_and(j >= 0, j < n_dma))
            def _():
                copy(j, jax.lax.rem(j, NSEM)).wait()
            return 0

        jax.lax.fori_loop(0, NSEM - 1, drain, 0)
        out_ref[pl.ds(t, 1)] = jnp.sum(
            scratch[...].astype(jnp.int32), axis=0, keepdims=True
        ).astype(jnp.uint32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TILES * REPEAT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILES, ROWS), lambda t, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSEM * chunk, ROWS), jnp.uint32),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TILES, ROWS), jnp.uint32),
    )


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (N, ROWS), 0, 1 << 30,
                               dtype=jnp.int32).astype(jnp.uint32)

    for chunk in (1, 4, 16):
        n_dma_total = TILES * (T // chunk)
        idx = jax.random.randint(key, (n_dma_total,), 0, N - chunk,
                                 dtype=jnp.int32)
        fn = make_bench(chunk)
        out = fn(idx, table)
        jax.device_get(out.ravel()[0])
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            out = fn(idx, table)
            jax.device_get(out.ravel()[0])
        dt = (time.time() - t0) / iters
        rows = TILES * T
        print(f"chunk={chunk:3d}: {dt*1e3:7.2f} ms  "
              f"{rows/dt:.3e} rows/s  {rows*ROWS*4/dt/1e9:6.1f} GB/s  "
              f"({n_dma_total/dt:.3e} descriptors/s)", flush=True)


if __name__ == "__main__":
    main()
