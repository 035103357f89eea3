"""Per-phase timing of the TE MSM pipeline on the real chip (the 5-timer
breakdown role of the reference's CUDA-event instrumentation,
`prize1a-msm-gpu/yrrid/yrrid-msm/MSM.cu:496-500`).

Phases (each timed as its own dispatch; the production `msm` fuses
2+3+4+5 into one graph, so their sum slightly overstates the fused time):
  1 digits+sort   `_digits_grouped_te`
  2 accumulate    `accumulate_te_pallas` (tiered)
  3 merge         `merge_buckets_te_pallas` / XLA form
  4 combine+out   `finish_te`

Env: BENCH_NPOW (default 18), MSM_SEED, ZPRIZE_PRECOMPUTE.
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


def sync(x):
    jax.device_get(np.asarray(jax.tree.leaves(x)[0]).ravel()[0]
                   if not hasattr(x, "ravel") else x.ravel()[0])


def timeit(label, fn, iters=3):
    out = fn()
    jax.tree.map(lambda a: jax.device_get(a.ravel()[0]), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
        jax.tree.map(lambda a: jax.device_get(a.ravel()[0]), out)
    dt = (time.time() - t0) / iters
    print(f"{label:28s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    npow = int(os.environ.get("BENCH_NPOW", "18"))
    seed = int(os.environ.get("MSM_SEED", "42"))
    n = 1 << npow

    from zprize_tpu.curve import sw
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.field import fp
    from zprize_tpu.msm import pippenger
    from zprize_tpu.msm.accum_kernel import (accumulate_te_pallas,
                                             merge_buckets_te_pallas,
                                             tier_schedule)
    from zprize_tpu.msm import te_path
    from zprize_tpu.msm.pippenger import (_digits_grouped_te, _window_groups,
                                          num_windows)

    curve = BLS12_377_G1
    rng = random.Random(seed)
    from zprize_tpu.utils import native as _native
    n_base = min(n, 1 << 10)
    import importlib
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    import ec_ref
    base = (_native.point_chain(curve, seed % 1000, n_base)
            if _native.available()
            else ec_ref.random_subgroup_points(curve, n_base, seed=seed))
    reps = n // n_base
    px = jnp.tile(fp.from_ints(curve.field, [p[0] for p in base]), (reps, 1))
    py = jnp.tile(fp.from_ints(curve.field, [p[1] for p in base]), (reps, 1))
    pinf = jnp.zeros((n,), bool)
    s = fp.from_ints(curve.scalar,
                     [rng.randrange(curve.order) for _ in range(n)])

    t0 = time.time()
    prepared = pippenger.prepare_points(curve, sw.Affine(px, py, pinf))
    jax.device_get(prepared.packed.ravel()[0])
    print(f"prepare (untimed): {time.time()-t0:.1f}s  c={prepared.c} "
          f"G={prepared.g} m={prepared.m} "
          f"table={prepared.packed.nbytes/1e9:.2f} GB", flush=True)
    c = prepared.c

    n_win = num_windows(curve, c)
    full_nbe = 1 << (c - 1)
    if prepared.m > 1:
        cspec = (prepared.g, prepared.m, prepared.n)
        gdict = {full_nbe: list(range(prepared.g))}
    else:
        cspec = None
        gdict = _window_groups(curve, c, n_win, full_nbe)
    gspec = tuple(sorted(((nbe, tuple(ws)) for nbe, ws in gdict.items()),
                         reverse=True))

    (digits, perm, starts, counts, descs), t1 = timeit(
        "1 digits+sort",
        lambda: _digits_grouped_te(curve, c, cspec, gspec, True, s, pinf))

    tiers_spec = []
    for (nbe, ws), desc in zip(gspec, descs):
        desc_np = np.asarray(jax.device_get(desc))
        tiers_spec.append(tier_schedule(desc_np)
                          if len(ws) * nbe >= 4096
                          else (max(1, int(desc_np[0])),))
    print(f"  tiers: {tiers_spec}", flush=True)

    sums_list = []
    t_acc = 0.0
    for (nbe, ws), tiers in zip(gspec, tiers_spec):
        jw = jnp.asarray(ws)
        d_g = digits if len(ws) == digits.shape[0] else digits[jw]
        p_g = perm if len(ws) == digits.shape[0] else perm[jw]
        s_g = starts if len(ws) == digits.shape[0] else starts[jw]
        c_g = counts if len(ws) == digits.shape[0] else counts[jw]
        depth = max(1, tiers[-1])
        acc_j = jax.jit(lambda pk, d, p, st, ct, nbe=nbe, tiers=tiers,
                        depth=depth: accumulate_te_pallas(
                            curve, c, depth, pk, d, p, st, ct, nbe,
                            tier_depths=tiers))
        sums, dt = timeit(f"2 accumulate nbe={nbe}",
                          lambda: acc_j(prepared.packed, d_g, p_g, s_g, c_g))
        t_acc += dt
        sums_list.append((nbe, ws, sums))

    t_merge = 0.0
    merged_list = []
    for nbe, ws, sums in sums_list:
        n_bits = max(1, nbe.bit_length())
        lane_count = len(ws) * n_bits * min(nbe, 128)
        if len(ws) * nbe * n_bits >= 4096 and lane_count % 128 == 0:
            mg_j = lambda sm: merge_buckets_te_pallas(curve, c, False, sm)
        else:
            mg_j = lambda sm: te_path.merge_buckets_te(curve, c, sm)
        merged, dt = timeit(f"3 merge nbe={nbe}", lambda: mg_j(sums))
        t_merge += dt
        merged_list.append((ws, merged))

    from zprize_tpu.curve import te
    window_sums = [None] * n_win if cspec is None else [None] * prepared.g
    for ws, merged in merged_list:
        for k, w in enumerate(ws):
            window_sums[w] = te.TePoint(*(a[k] for a in merged))
    stacked = te.TePoint(*(jnp.stack([getattr(p, f) for p in window_sums])
                           for f in ("x", "y", "z", "t")))
    (res, t4) = timeit("4 combine+convert",
                       lambda: te_path.finish_te(curve, c, stacked))

    total = t1 + t_acc + t_merge + t4
    print(f"{'TOTAL (sum of phases)':28s} {total*1e3:9.2f} ms", flush=True)
    print(f"  adds equivalent: accumulate {prepared.m * n / 1e6:.2f} M mixed; "
          f"rate {prepared.m * n / max(t_acc, 1e-9) / 1e6:.2f} M adds/s",
          flush=True)


if __name__ == "__main__":
    main()
