"""Compile-time probe for the two sorted-table MSM dispatches at the
production 2^18 shape: lowers and compiles each half separately so a
pathological XLA:TPU compile can be attributed (the fused single-dispatch
form took >35 min; the split form is the fix candidate).

Env: BENCH_NPOW (default 18), PROBE (comma list of "table","accum").
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

from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.msm import pippenger
from zprize_tpu.msm.accum_kernel import SLAB_S, _slab_rows

CURVE = BLS12_377_G1


def main():
    npow = int(os.environ.get("BENCH_NPOW", "18"))
    n = 1 << npow
    c, g = 17, 1
    m = -(-pippenger.num_windows(CURVE, c) // g)
    nl = CURVE.field.n_limbs
    h = (nl + 1) // 2
    rows_pad = _slab_rows(nl)
    nbe = 1 << (c - 1)
    S = SLAB_S
    r_rows = m * n
    r_pad = r_rows + (-r_rows) % S + S

    probes = os.environ.get("PROBE", "table,accum").split(",")

    if "table" in probes:
        # (3h, m*n) column-major: matches the production PreparedTe.packed shape
        # so compiling here warms the persistent cache for the real program
        args = (jax.ShapeDtypeStruct((3 * h, r_rows), jnp.uint32),
                jax.ShapeDtypeStruct((n, CURVE.scalar.n_limbs), jnp.uint32),
                jax.ShapeDtypeStruct((n,), jnp.bool_))
        t0 = time.time()
        split_ops = pippenger._sort_build_mode()
        lowered = pippenger._sorted_table_te.lower(CURVE, c, g, m, n,
                                                   split_ops, *args)
        t1 = time.time()
        lowered.compile()
        t2 = time.time()
        print(f"dispatch1 (sort+table):  trace/lower {t1-t0:6.1f}s  "
              f"compile {t2-t1:6.1f}s", flush=True)

    if "accum" in probes:
        args = (jax.ShapeDtypeStruct((g, r_pad // S, S * rows_pad),
                                     jnp.uint32),
                jax.ShapeDtypeStruct((g, nbe + 1), jnp.int32),
                jax.ShapeDtypeStruct((g, nbe + 1), jnp.int32))
        t0 = time.time()
        lowered = pippenger._sorted_accum_te.lower(CURVE, c, g, False, *args)
        t1 = time.time()
        lowered.compile()
        t2 = time.time()
        print(f"dispatch2 (accum+merge): trace/lower {t1-t0:6.1f}s  "
              f"compile {t2-t1:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
