"""Micro: one big (depth, lanes)-indexed row gather vs the per-step loop —
decides whether the accumulate should stream a pre-materialized rectangle.
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

N = 18 * (1 << 18)          # table rows (the collapsed point table at 2^18)
ROWS = 40
LANES = 16384
DEPTH = 272

print(f"table {N}x{ROWS} u32 ({N*ROWS*4/1e9:.2f} GB); "
      f"gather ({DEPTH},{LANES}) rows", flush=True)
key = jax.random.PRNGKey(0)
table = jax.random.randint(key, (N, ROWS), 0, 1 << 30, dtype=jnp.int32)
idx = jax.random.randint(key, (DEPTH, LANES), 0, N, dtype=jnp.int32)


@jax.jit
def big(table, idx):
    return jnp.take(table, idx, axis=0)          # (DEPTH, LANES, ROWS)


@jax.jit
def big_sum(table, idx):
    # with a reduction so the result transfer is small
    return jnp.take(table, idx, axis=0).sum(axis=0)


@jax.jit
def chunked_sum(table, idx):
    def body(r, acc):
        return acc + jnp.take(table, idx[r], axis=0)
    return jax.lax.fori_loop(0, DEPTH, body,
                             jnp.zeros((LANES, ROWS), jnp.int32))


def timeit(label, fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(3):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / 3
    rows = DEPTH * LANES
    print(f"{label:24s} {dt*1e3:8.1f} ms  {rows/dt:.3e} rows/s "
          f"({rows*ROWS*4/dt/1e9:.1f} GB/s useful)", flush=True)


timeit("big_sum", big_sum, table, idx)
timeit("chunked_sum", chunked_sum, table, idx)
# sorted-ascending index variant: does locality help?
idx_sorted = jnp.sort(idx, axis=1)
timeit("big_sum (sorted rows)", big_sum, table, idx_sorted)
