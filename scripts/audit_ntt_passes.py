"""HBM pass audit of the packed Goldilocks four-step NTT at 2^24
(VERDICT r4 #4): times each constituent pass with a K-chain of DEPENDENT
iterations inside ONE jit (the ~24 ms axon dispatch floor makes single
dispatches unmeasurable), and prints the pass table next to the
0.33 ms/pass HBM budget (2 x 128 MB moved per pass at ~819 GB/s on v5e).

Passes audited (the e2e 2^24 transform composes exactly these):
  bitrev(3) gather        x2  (inside each ntt_packed(12) level-1)
  kernel(3)               x2
  inner step twiddle      x2
  inner transpose         x2
  bitrev(9) gather        x2  (level-2)
  kernel(9)               x2
  outer step twiddle      x1
  outer transpose         x1
Env: BENCH_NTT_LOGN (24), BENCH_NTT_CHAIN (8), BENCH_ITERS (3).
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/zprize_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from zprize_tpu.field import fp
from zprize_tpu.field.spec import GOLDILOCKS
from zprize_tpu.ntt import gl_kernel, gl_ops
from zprize_tpu.ntt.domain import _bitrev_perm

G = gl_ops
Q = G.Q


def chain_time(label, step, x0, iters, chain_k):
    """step: (lo, hi) -> (lo, hi), jitted as a K-chain of dependent calls."""
    @jax.jit
    def chained(lo, hi):
        def body(carry, _):
            return step(*carry), ()
        c, _ = jax.lax.scan(body, (lo, hi), None, length=chain_k)
        return c

    lo, hi = chained(*x0)
    jax.device_get(lo.ravel()[0])
    times = []
    for _ in range(iters):
        t0 = time.time()
        lo, hi = chained(*x0)
        jax.device_get(lo.ravel()[0])
        times.append((time.time() - t0) / chain_k)
    dt = min(times)
    nbytes = x0[0].nbytes * 2           # both planes
    print(f"{label:34s} {dt*1e3:8.3f} ms   "
          f"({2*nbytes/dt/1e9:6.0f} GB/s r+w equiv)", flush=True)
    return dt


def main():
    logn = int(os.environ.get("BENCH_NTT_LOGN", "24"))
    chain_k = int(os.environ.get("BENCH_NTT_CHAIN", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    l1, l2 = logn // 2, logn - logn // 2
    n1, n2 = 1 << l1, 1 << l2
    n = n1 * n2
    rng = random.Random(0)
    sample = [rng.randrange(GOLDILOCKS.p) for _ in range(4096)]
    a = jnp.tile(fp.from_ints(GOLDILOCKS, sample), (n // 4096, 1))
    alo, ahi = gl_ops.from_limbs(GOLDILOCKS, a)
    print(f"audit: 2^{logn} = {l1}+{l2}, chain={chain_k}, "
          f"planes 2 x {alo.nbytes/1e6:.0f} MB", flush=True)

    kl = gl_kernel.MAX_KERNEL_LOG       # 9 by default
    ks = l1 - kl if l1 > kl else 0      # small level (3 at 12/9)
    tile = gl_kernel._default_tile()

    # ---- shapes as they occur inside ntt_packed(l1) at 2^24 ----
    sub_b = n // (1 << kl)              # batch cols for the level-2 kernel
    x9 = (alo.reshape(1 << kl, sub_b), ahi.reshape(1 << kl, sub_b))
    br9 = jnp.asarray(_bitrev_perm(kl).astype(np.int32))
    chain_time(f"bitrev({kl}) gather",
               lambda lo, hi: (jnp.take(lo, br9, axis=0),
                               jnp.take(hi, br9, axis=0)), x9, iters, chain_k)

    twlo, twhi, mask, shtab = gl_kernel._stage_tables(kl, False)
    call9 = gl_kernel._make_ntt_call(kl, sub_b, tile, False,
                                     gl_kernel._shift_twiddle_on())
    t9 = chain_time(f"kernel({kl})  (shift-twiddle)",
                    lambda lo, hi: call9(jnp.asarray(twlo), jnp.asarray(twhi),
                                         jnp.asarray(mask), jnp.asarray(shtab),
                                         lo, hi), x9, iters, chain_k)

    if ks:
        xs = (alo.reshape(1 << ks, n // (1 << ks)),
              ahi.reshape(1 << ks, n // (1 << ks)))
        brs = jnp.asarray(_bitrev_perm(ks).astype(np.int32))
        chain_time(f"bitrev({ks}) gather",
                   lambda lo, hi: (jnp.take(lo, brs, axis=0),
                                   jnp.take(hi, brs, axis=0)),
                   xs, iters, chain_k)
        tl, th, mk, sh = gl_kernel._stage_tables(ks, False)
        calls = gl_kernel._make_ntt_call(ks, n // (1 << ks), tile, False,
                                         gl_kernel._shift_twiddle_on())
        chain_time(f"kernel({ks})  (shift-twiddle)",
                   lambda lo, hi: calls(jnp.asarray(tl), jnp.asarray(th),
                                        jnp.asarray(mk), jnp.asarray(sh),
                                        lo, hi), xs, iters, chain_k)
        xin = (alo.reshape(1 << ks, 1 << kl, n // (1 << l1)),
               ahi.reshape(1 << ks, 1 << kl, n // (1 << l1)))
        chain_time(f"inner twiddle ({ks}x{kl})",
                   lambda lo, hi: tuple(
                       t.reshape(lo.shape) for t in
                       gl_kernel._apply_step_twiddle(ks, kl, False, lo, hi)),
                   xin, iters, chain_k)
        chain_time("inner transpose",
                   lambda lo, hi: (jnp.swapaxes(lo, 0, 1).reshape(lo.shape),
                                   jnp.swapaxes(hi, 0, 1).reshape(hi.shape)),
                   xin, iters, chain_k)

    xm = (alo.reshape(n1, n2), ahi.reshape(n1, n2))
    chain_time(f"outer twiddle ({l1}x{l2})",
               lambda lo, hi: tuple(
                   t[:, :, 0] for t in gl_kernel._apply_step_twiddle(
                       l1, l2, False, lo[:, :, None], hi[:, :, None])),
               xm, iters, chain_k)
    chain_time("outer transpose",
               lambda lo, hi: (lo.T.reshape(n1, n2), hi.T.reshape(n1, n2)),
               xm, iters, chain_k)

    chain_time("ntt_packed(12) (one level)",
               lambda lo, hi: gl_kernel.ntt_packed(l1, lo, hi),
               xm, iters, chain_k)
    chain_time("e2e fourstep 2^24",
               lambda lo, hi: gl_kernel.ntt_fourstep_packed(l1, l2, lo, hi),
               (alo, ahi), iters, chain_k)
    budget = 2 * alo.nbytes * 2 / 819e9
    print(f"one-pass HBM budget at 819 GB/s: {budget*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
