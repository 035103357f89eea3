"""Data-movement microbench for the MSM accumulate redesign: how fast can
the chip (a) gather rows at various row widths, (b) sort rows with payload
(bucket-major physical reorder), (c) scatter rows.  The accumulate's gather
volume is W*n rows/MSM; if random-row gather is descriptor-latency-bound
(~53 ns/row measured r2) the win is physically reordering the table once
(sort/permute) and reading contiguous per-bucket STRIPS afterwards.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/zprize_tpu_jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.device_get(jax.tree.leaves(x)[0].ravel()[0])


def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        sync(out)
    dt = (time.time() - t0) / iters
    return out, dt


def main():
    rng = np.random.default_rng(0)
    n = 1 << int(os.environ.get("BENCH_ROWS_LOG", "20"))

    # (a) gather at varying row widths
    for words in (10, 20, 40, 80, 160):
        table = jnp.asarray(rng.integers(0, 1 << 15, (n, words),
                                         dtype=np.int64).astype(np.uint32))
        idx = jnp.asarray(rng.permutation(n).astype(np.int32))
        g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        _, dt = timeit(f"gather w={words}", g, table, idx)
        print(f"gather rows={n} words={words:3d} ({words*4:4d} B): "
              f"{dt*1e3:8.2f} ms  {dt/n*1e9:6.1f} ns/row  "
              f"{n*words*4/dt/1e9:6.1f} GB/s", flush=True)

    words = 40
    table = jnp.asarray(rng.integers(0, 1 << 15, (n, words),
                                     dtype=np.int64).astype(np.uint32))
    key = jnp.asarray(rng.integers(0, 1 << 16, (n,), dtype=np.int64)
                      .astype(np.uint32))

    # (b) sort with full row payload (40 u32 operands)
    def sort_payload(key, t):
        ops = (key,) + tuple(t[:, i] for i in range(words))
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return out[1]

    _, dt = timeit("sort+payload", jax.jit(sort_payload), key, table)
    print(f"sort rows={n} payload={words}x u32: {dt*1e3:8.2f} ms  "
          f"{dt/n*1e9:6.1f} ns/row", flush=True)

    # (b2) sort (key, iota) then gather — the current pipeline's shape
    def sort_then_gather(key, t):
        iota = jax.lax.iota(jnp.int32, n)
        _, perm = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
        return jnp.take(t, perm, axis=0)

    _, dt = timeit("sort+gather", jax.jit(sort_then_gather), key, table)
    print(f"sort+gather rows={n}: {dt*1e3:8.2f} ms  {dt/n*1e9:6.1f} ns/row",
          flush=True)

    # (c) scatter rows (inverse permutation placement)
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))

    def scatter(t, i):
        return jnp.zeros_like(t).at[i].set(t)

    _, dt = timeit("scatter", jax.jit(scatter), table, idx)
    print(f"scatter rows={n}: {dt*1e3:8.2f} ms  {dt/n*1e9:6.1f} ns/row",
          flush=True)

    # (d) strip gather: contiguous S-row strips (the post-sort read pattern),
    # expressed as a gather of S-times-wider rows from a reshaped table
    for s in (4, 8, 16):
        t2 = table.reshape(n // s, s * words)
        idx2 = jnp.asarray(rng.permutation(n // s).astype(np.int32))
        g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        _, dt = timeit(f"strip s={s}", g, t2, idx2)
        print(f"strip-gather rows={n} S={s} ({s*words*4:5d} B/desc): "
              f"{dt*1e3:8.2f} ms  {dt/n*1e9:6.1f} ns/row  "
              f"{n*words*4/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
