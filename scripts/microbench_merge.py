"""Isolated timing of the bucket-merge stage at the production shape
(W=1 collapsed set, B=2^(c-1) buckets), sweeping the triangle chunk
width ZPRIZE_TRI_LANES — the strip phase shortens with wider chunks
while the XLA-form bit-decomposition tail grows, so the optimum is a
measured tradeoff, not a formula.

Env: BENCH_C (default 17), TRI_SWEEP (comma list, default
"1024,2048,4096,8192,16384").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/zprize_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from zprize_tpu.curve import te
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.msm import te_path
from zprize_tpu.msm.accum_kernel import merge_te_triangle_pallas

CURVE = BLS12_377_G1


def main():
    c = int(os.environ.get("BENCH_C", "17"))
    nbe = 1 << (c - 1)
    nl = CURVE.field.n_limbs
    rng = np.random.default_rng(3)
    # merge only needs *some* valid-form lanes; random normal-form limbs
    # exercise the same op mix as real bucket sums
    mk = lambda: jnp.asarray(
        rng.integers(0, 1 << 15, (1, nbe, nl), dtype=np.int64)
        .astype(np.uint32))
    sums = te.TePoint(mk(), mk(), mk(), mk())

    sweep = [int(v) for v in os.environ.get(
        "TRI_SWEEP", "1024,2048,4096,8192,16384").split(",")]
    for tl in sweep:
        split = te_path.triangle_split(1, nbe, target_lanes=tl)
        os.environ["ZPRIZE_TRI_LANES"] = str(tl)
        # the production entry is itself jitted with static config — its
        # trace cache would swallow the env change, so clear between runs
        jax.clear_caches()

        @jax.jit
        def run(s):
            return merge_te_triangle_pallas(CURVE, c, False, s)

        out = run(sums)
        jax.device_get(out.x.ravel()[0])
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            out = run(sums)
            jax.device_get(out.x.ravel()[0])
        dt = (time.time() - t0) / iters
        print(f"tri_lanes={tl:6d} split={split}  {dt*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
