"""Per-phase timing of the SORTED-table TE MSM at 2^18 (the default
m>1 path since r4) — splits dispatch 1 (`_sorted_table_te`: digits, key
sort, row gather, strip build, bounds) and dispatch 2
(`_sorted_accum_te`: slab accumulate, merge+combine) into separately
jitted stages to locate the ~80% non-kernel overhead (VERDICT r4 weak
#1: 17% kernel utilization).  Each stage is its own dispatch, so the
~24 ms tunnel floor pads every row — read deltas, not absolutes.

Env: BENCH_NPOW (default 18), MSM_SEED, BENCH_ITERS (default 3),
ZPRIZE_SORT_BUILD / ZPRIZE_SORT_OPS (build-mode A/B).
"""
import functools
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


def timeit(label, fn, iters):
    out = fn()
    jax.tree.map(lambda a: jax.device_get(a.ravel()[0]), out)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn()
        jax.tree.map(lambda a: jax.device_get(a.ravel()[0]), out)
        times.append(time.time() - t0)
    print(f"{label:30s} {min(times)*1e3:9.2f} ms", flush=True)
    return out, min(times)


def main():
    npow = int(os.environ.get("BENCH_NPOW", "18"))
    seed = int(os.environ.get("MSM_SEED", "42"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    n = 1 << npow

    from zprize_tpu.curve import sw
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.field import fp
    from zprize_tpu.msm import pippenger
    from zprize_tpu.msm.accum_kernel import SLAB_S, _slab_rows, \
        accumulate_te_sorted
    from zprize_tpu.msm.pippenger import (_sort_rows_payload, _sorted_accum_te,
                                          _sorted_merge_combine,
                                          _sorted_table_te, num_windows,
                                          signed_digits)
    from zprize_tpu.utils import native as _native

    curve = BLS12_377_G1
    n_base = min(n, 1 << 10)
    base = _native.point_chain(curve, seed % 1000, n_base)
    reps = n // n_base
    px = jnp.tile(fp.from_ints(curve.field, [p[0] for p in base]), (reps, 1))
    py = jnp.tile(fp.from_ints(curve.field, [p[1] for p in base]), (reps, 1))
    pinf = jnp.zeros((n,), bool)
    rng_np = np.random.default_rng(seed)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "bench_dummy"))
    # vectorized canonical u16 scalars (same form the bench stages)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    s = jnp.asarray(benchmod._scalar_batch_np(curve, rng_np, n))

    t0 = time.time()
    prepared = pippenger.prepare_points(curve, sw.Affine(px, py, pinf))
    jax.device_get(prepared.packed[(0,) * prepared.packed.ndim])
    print(f"prepare (untimed): {time.time()-t0:.1f}s  c={prepared.c} "
          f"G={prepared.g} m={prepared.m} "
          f"table={prepared.packed.nbytes/1e9:.2f} GB", flush=True)
    c, g, m = prepared.c, prepared.g, prepared.m
    assert m > 1, "sorted-device path profiles the m>1 collapse regime"
    packed = prepared.packed
    n_win = num_windows(curve, c)
    nbe = 1 << (c - 1)
    rows_pad = _slab_rows(curve.field.n_limbs)
    split_ops = pippenger._sort_build_mode()
    print(f"build mode: split_ops={split_ops} "
          f"(-1=gather, 0=full payload, k=chunked)", flush=True)

    # ---- dispatch-1 stages ----
    @jax.jit
    def stage_digits(s, inf):
        d = signed_digits(curve, c, n_win, s)
        d = jnp.pad(d, ((0, m * g - n_win), (0, 0)))
        d = d.reshape(m, g, n).transpose(1, 0, 2).reshape(g, m * n)
        return jnp.where(jnp.tile(inf, m)[None, :], 0, d)

    digits, _ = timeit("1 digits(+reshape)",
                       lambda: stage_digits(s, pinf), iters)

    @jax.jit
    def stage_keysort(dg):
        key = jnp.abs(dg[0]).astype(jnp.uint32)
        iota = jax.lax.iota(jnp.uint32, key.shape[0])
        return jax.lax.sort((key, iota), num_keys=1, is_stable=False)

    (skey, perm), _ = timeit("2 key+iota sort",
                             lambda: stage_keysort(digits), iters)

    @jax.jit
    def stage_gather(pm):
        return jnp.take(packed, pm.astype(jnp.int32), axis=1)

    rows, _ = timeit("3 row gather (full table)",
                     lambda: stage_gather(perm), iters)

    @jax.jit
    def stage_build(rw, dg, pm):
        sign = jnp.take((dg[0] < 0).astype(jnp.uint32), pm.astype(jnp.int32))
        cols = [rw[j] for j in range(rw.shape[0])] + [sign]
        cols += [jnp.zeros_like(cols[0])] * (rows_pad - len(cols))
        r_rows = rw.shape[1]
        r_pad = r_rows + (-r_rows) % SLAB_S + SLAB_S
        table = jnp.stack(cols, axis=1)
        table = jnp.pad(table, ((0, r_pad - r_rows), (0, 0)))
        return table.reshape(r_pad // SLAB_S, SLAB_S * rows_pad)

    _, _ = timeit("4 strip build (stack+pad)",
                  lambda: stage_build(rows, digits, perm), iters)

    # ---- production dispatches for comparison ----
    tables, _ = timeit(
        "D1 _sorted_table_te (fused)",
        lambda: _sorted_table_te(curve, c, g, m, n, split_ops, packed, s,
                                 pinf), iters)
    _, _ = timeit(
        "D2 _sorted_accum_te (fused)",
        lambda: _sorted_accum_te(curve, c, g, False, *tables), iters)

    @jax.jit
    def stage_accum(tb, st, ct):
        return accumulate_te_sorted(curve, c, nbe, SLAB_S, False,
                                    tb[0], st[0], ct[0])

    sums, _ = timeit("5 slab accumulate only",
                     lambda: stage_accum(*tables), iters)

    from zprize_tpu.curve import te
    stacked = te.TePoint(*(x[None] for x in sums))
    _, _ = timeit("6 merge+combine",
                  lambda: _sorted_merge_combine(curve, c, False, stacked),
                  iters)

    def full():
        res = pippenger.msm(curve, sw.Affine(px[:1], py[:1], pinf), s,
                            c=c, prepared=prepared)
        jax.device_get(res.z[..., 0])
        return ()

    full()
    times = []
    for _ in range(iters):
        t0 = time.time()
        full()
        times.append(time.time() - t0)
    print(f"{'E2E msm (prod path)':30s} {min(times)*1e3:9.2f} ms", flush=True)
    print(f"  adds: {m * n / 1e6:.2f} M mixed; table "
          f"{packed.nbytes/1e6:.0f} MB", flush=True)


if __name__ == "__main__":
    main()
