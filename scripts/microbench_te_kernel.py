"""Isolated throughput of the TE mixed-add Pallas kernel (no gathers):
upper bound for the accumulate stage, vs the in-pipeline rate (gather +
kernel) the profiler reports.  Also times the XLA row gather alone at the
production row size, so accumulate_time ~ gather + kernel can be checked.
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

from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.msm.accum_kernel import make_te_mixed_add

CURVE = BLS12_377_G1
N = CURVE.field.n_limbs
H = (N + 1) // 2
ROWS_N = 3 * H + (-3 * H) % 8
LANES = 1 << 16
TILE = 512
STEPS = 64          # sequential kernel applications per timed call


def main():
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(
        rng.integers(0, 1 << 15, shape, dtype=np.int64).astype(np.uint32))
    x, y, z, t = (mk((N, LANES)) for _ in range(4))
    mask = jnp.ones((1, LANES), jnp.uint32)

    add = make_te_mixed_add(CURVE, LANES, TILE)

    @jax.jit
    def run(x, y, z, t, rows, mask):
        def body(_, acc):
            return add(*acc, rows, mask)
        return jax.lax.fori_loop(0, STEPS, body, (x, y, z, t))

    rows = mk((ROWS_N, LANES))
    out = run(x, y, z, t, rows, mask)
    jax.device_get(out[0].ravel()[0])
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        out = run(x, y, z, t, rows, mask)
        jax.device_get(out[0].ravel()[0])
    dt = (time.time() - t0) / iters
    adds = LANES * STEPS
    print(f"kernel-only: {dt*1e3:8.2f} ms  {adds/dt/1e6:7.2f} M adds/s  "
          f"({dt/adds*1e9:.1f} ns/add)", flush=True)

    # XLA gather alone at the production row size (40 u32 words).
    # Mode-independent and heavy (1.3 GB table; once broke the axon tunnel
    # mid-compile) — skipped unless explicitly requested.
    if os.environ.get("ZPRIZE_BENCH_GATHER", "0") != "1":
        return
    table = mk((1 << 22, ROWS_N))
    idx = jnp.asarray(rng.integers(0, 1 << 22, (LANES * 8,), dtype=np.int32))

    @jax.jit
    def gth(idx):
        return jnp.take(table, idx, axis=0).sum(axis=0, dtype=jnp.uint32)

    o = gth(idx)
    jax.device_get(o.ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        o = gth(idx)
        jax.device_get(o.ravel()[0])
    dt = (time.time() - t0) / iters
    nrows = idx.shape[0]
    print(f"xla gather:  {dt*1e3:8.2f} ms  {nrows/dt/1e6:7.2f} M rows/s "
          f"({dt/nrows*1e9:.1f} ns/row, {nrows*ROWS_N*4/dt/1e9:.1f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
