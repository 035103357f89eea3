"""Stage-level timing of the packed Goldilocks four-step NTT at 2^24:
column pass, twiddle multiply, row pass (incl. the XLA transpose), and the
fused end-to-end time — identifies whether the 2^24 latency is kernel- or
relayout-bound.  Env: BENCH_NTT_LOGN (default 24), BENCH_ITERS (default 5).
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/zprize_tpu_jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from zprize_tpu.field import fp
from zprize_tpu.field.spec import GOLDILOCKS
from zprize_tpu.ntt import gl_kernel, gl_ops


def timeit(label, fn, iters):
    out = fn()
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn()
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / iters
    print(f"{label:32s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    logn = int(os.environ.get("BENCH_NTT_LOGN", "24"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    l1, l2 = logn // 2, logn - logn // 2
    n1, n2 = 1 << l1, 1 << l2
    rng = random.Random(0)
    sample = [rng.randrange(GOLDILOCKS.p) for _ in range(4096)]
    a = jnp.tile(fp.from_ints(GOLDILOCKS, sample), ((1 << logn) // 4096, 1))
    alo, ahi = gl_ops.from_limbs(GOLDILOCKS, a)
    mlo, mhi = alo.reshape(n1, n2), ahi.reshape(n1, n2)

    col = jax.jit(lambda lo, hi: gl_kernel.ntt_packed(l1, lo, hi))
    tlo, thi = gl_kernel._twiddle_matrix_packed(l1, l2, False)

    @jax.jit
    def tw(lo, hi):
        return gl_ops.gl_mul(jnp.asarray(tlo), jnp.asarray(thi), lo, hi)

    row_t = jax.jit(lambda lo, hi: gl_kernel.ntt_packed(l2, lo.T, hi.T))
    transpose_only = jax.jit(lambda lo, hi: (lo.T.copy(), hi.T.copy()))

    d1 = timeit("column pass (2^%d x %d)" % (l1, n2), lambda: col(mlo, mhi),
                iters)
    clo, chi = col(mlo, mhi)
    d2 = timeit("twiddle multiply", lambda: tw(clo, chi), iters)
    d3 = timeit("transpose only", lambda: transpose_only(clo, chi), iters)
    d4 = timeit("row pass (transpose + ntt)", lambda: row_t(clo, chi), iters)
    dt = timeit("fused end-to-end",
                lambda: gl_kernel.ntt_fourstep_packed(l1, l2, alo, ahi),
                iters)
    print(f"sum of phases: {(d1+d2+d4)*1e3:.2f} ms; "
          f"bytes/sweep = {alo.nbytes*2/1e6:.0f} MB; "
          f"e2e bandwidth-equivalent = "
          f"{alo.nbytes*2*10/dt/1e9:.0f} GB/s (10-sweep model)", flush=True)


if __name__ == "__main__":
    main()
