"""Per-phase MSM timing on the real TPU: digits/grouping vs accumulate vs
merge vs combine — the 5-timer breakdown of the reference
(`yrrid-msm/MSM.cu:496-500`) for our pipeline.

Usage: python scripts/profile_msm.py [npow] [c]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/zprize_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import random

import jax
import jax.numpy as jnp
import numpy as np

from zprize_tpu.curve import sw
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.msm import pippenger
from zprize_tpu.msm.accum_kernel import (accumulate_pass_pallas,
                                         merge_buckets_pallas, tier_schedule)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return jax.device_get(leaves[0].ravel()[0])


def timed(label, fn, iters=3):
    fn()  # warm/compile
    sync_holder = []
    t0 = time.time()
    for _ in range(iters):
        sync_holder.append(fn())
    dt = (time.time() - t0) / iters
    print(f"{label:40s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    npow = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else \
        pippenger.default_window_bits(1 << npow)
    n = 1 << npow
    curve = BLS12_377_G1
    print(f"devices: {jax.devices()}  n=2^{npow} c={c}", flush=True)

    rng = random.Random(42)
    n_base = min(n, 1 << 10)
    from zprize_tpu.utils import native as _native
    base = _native.point_chain(curve, 42, n_base)
    bx = fp.from_ints(curve.field, [p[0] for p in base])
    by = fp.from_ints(curve.field, [p[1] for p in base])
    px = jnp.tile(bx, (n // n_base, 1))
    py = jnp.tile(by, (n // n_base, 1))
    points = sw.Affine(px, py, jnp.zeros((n,), bool))
    s = fp.from_ints(curve.scalar,
                     [rng.randrange(curve.order) for _ in range(n)])

    n_win = pippenger.num_windows(curve, c)
    full_nbe = 1 << (c - 1)

    # phase 1: digits
    def phase_digits():
        d = pippenger.signed_digits(curve, c, n_win, s)
        sync(d)
        return d
    timed("signed_digits", phase_digits)
    digits = pippenger.signed_digits(curve, c, n_win, s)
    digits = jnp.where(points.inf[None, :], 0, digits)

    # phase 2: grouping (argsort + boundaries)
    def phase_group():
        out = pippenger.bucket_counts_all(c, digits)
        sync(out[0])
        return out
    timed("bucket_counts(argsort)", phase_group)
    perm, starts, counts, max_counts = pippenger.bucket_counts_all(c, digits)
    max_np = np.asarray(jax.device_get(max_counts))

    # restrict to the full-width window group (the dominant one)
    scalar_bits = curve.scalar.p.bit_length()
    ws = [w for w in range(n_win)
          if min(full_nbe, (1 << min(c, max(0, scalar_bits - w * c))) + 1)
          >= full_nbe]
    widx = np.asarray(ws)
    jw = jnp.asarray(widx)
    d_g, p_g = digits[jw], perm[jw]
    s_g, c_g = starts[jw], counts[jw]
    lane_counts = np.asarray(jax.device_get(c_g[:, 1:full_nbe + 1])).reshape(-1)
    pad = (-lane_counts.size) % 512
    desc = np.sort(np.concatenate(
        [lane_counts, np.zeros(pad, lane_counts.dtype)]))[::-1]
    tiers = tier_schedule(desc)
    print(f"windows in full group: {len(ws)}/{n_win}; "
          f"tiers={tiers} max_occ={int(max_np[widx].max())}", flush=True)

    # phase 3: tiered accumulate
    def phase_acc():
        out = accumulate_pass_pallas(curve, c, 0, points.x, points.y,
                                     d_g, p_g, s_g, c_g,
                                     n_buckets_eff=full_nbe,
                                     tier_depths=tiers)
        sync(out)
        return out
    dt_acc = timed("accumulate (tiered pallas)", phase_acc)
    sums = phase_acc()

    # phase 4: merge
    def phase_merge():
        out = merge_buckets_pallas(curve, c, False, sums)
        sync(out)
        return out
    timed("merge_buckets (pallas)", phase_merge)
    merged = phase_merge()

    # phase 5: combine
    def phase_combine():
        out = pippenger.combine_windows(curve, c, merged)
        sync(out)
        return out
    timed("combine_windows", phase_combine)

    # whole msm for reference
    def whole():
        r = pippenger.msm(curve, points, s, c=c)
        sync(r)
        return r
    dt = timed("FULL msm", whole)
    print(f"throughput: {n/dt:.3e} points/s", flush=True)
    adds = sum(desc)  # ~point-adds in the dominant group
    print(f"tiered adds in full group ~ {sum(int(x) for x in desc):,} "
          f"-> {sum(int(x) for x in desc)/dt_acc:.3e} adds/s in accumulate",
          flush=True)


if __name__ == "__main__":
    main()
