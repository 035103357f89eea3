"""Per-phase timing of the TE MSM path on the real TPU, plus two
microvariants of the accumulate loop that isolate the HBM row-gather cost
from the Pallas add-kernel cost (the analog of the reference's 5-timer
breakdown, `yrrid-msm/MSM.cu:496-500`).

Usage: python scripts/profile_msm_te.py [npow] [c]
"""

import functools
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
from zprize_tpu.msm import pippenger, te_path
from zprize_tpu.msm.accum_kernel import (accumulate_te_pallas,
                                         make_te_mixed_add,
                                         merge_buckets_te_pallas,
                                         tier_schedule, _next_prefix)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return jax.device_get(leaves[0].ravel()[0])


def timed(label, fn, iters=3):
    t0 = time.time()
    fn()  # warm/compile
    print(f"{label:44s} warm {time.time()-t0:7.1f} s", flush=True, end="")
    t0 = time.time()
    for _ in range(iters):
        fn()
    dt = (time.time() - t0) / iters
    print(f"   {dt*1e3:9.1f} ms", flush=True)
    return dt


@functools.partial(jax.jit, static_argnums=(0, 1))
def gather_only(nsteps: int, rows_n: int, packed, perm, wol_p, st_p, ct_p,
                digits):
    """The accumulate loop's index math + HBM row gather with a trivial
    u32-sum in place of the EC add: isolates memory/index cost."""
    n = packed.shape[0]

    def tbody(tv, a):
        pos = jnp.clip(st_p + tv, 0, n - 1)
        idx = perm[wol_p, pos]
        rows = jnp.take(packed, idx, axis=0)
        sign = (digits[wol_p, idx] < 0).astype(jnp.uint32)
        return a + rows.T + sign[None, :]

    init = jnp.zeros((packed.shape[1], st_p.shape[0]), jnp.uint32)
    return jax.lax.fori_loop(0, nsteps, tbody, init)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def add_only(curve, nsteps: int, tile: int, rows_fixed, mask_fixed,
             x, y, z, t):
    """The Pallas TE mixed-add kernel at the same lane width with a FIXED
    operand tile (no gather): isolates kernel compute."""
    addp = make_te_mixed_add(curve, x.shape[1], tile)

    def tbody(tv, a):
        return addp(a[0], a[1], a[2], a[3], rows_fixed, mask_fixed)

    return jax.lax.fori_loop(0, nsteps, tbody, (x, y, z, t))


def main():
    npow = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << npow
    curve = BLS12_377_G1
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
    print(f"devices: {jax.devices()}  n=2^{npow}", flush=True)

    t0 = time.time()
    prepared = pippenger.prepare_points(
        curve, points, int(sys.argv[2]) if len(sys.argv) > 2 else None)
    sync(prepared.packed)
    c = prepared.c
    print(f"prepare_points: {time.time()-t0:.1f}s  c={c} g={prepared.g} "
          f"m={prepared.m} table={prepared.packed.nbytes/1e9:.2f} GB",
          flush=True)

    full_nbe = 1 << (c - 1)
    cspec = ((prepared.g, prepared.m, prepared.n)
             if prepared.m > 1 else None)
    gdict = ({full_nbe: list(range(prepared.g))} if prepared.m > 1 else
             pippenger._window_groups(
                 curve, c, pippenger.num_windows(curve, c), full_nbe))
    gspec = tuple(sorted(((nbe, tuple(ws)) for nbe, ws in gdict.items()),
                         reverse=True))

    def phase1():
        out = pippenger._digits_grouped_te(curve, c, cspec, gspec, s,
                                           points.inf)
        sync(out[0])
        return out
    timed("dispatch1: digits+sort+counts", phase1)
    digits, perm, starts, counts, descs = phase1()

    tiers_spec = []
    for (nbe, ws), desc in zip(gspec, descs):
        desc_np = np.asarray(jax.device_get(desc))
        tiers_spec.append(tier_schedule(desc_np)
                          if len(ws) * nbe >= 4096
                          else (max(1, int(desc_np[0])),))
    print(f"gspec={[(nbe, len(ws)) for nbe, ws in gspec]} "
          f"tiers={tiers_spec}", flush=True)

    # dominant group only, for the microvariants
    (nbe0, ws0), tiers0 = gspec[0], tiers_spec[0]
    total_adds = int(np.asarray(jax.device_get(descs[0])).sum())

    def phase2():
        out = accumulate_te_pallas(curve, c, max(1, tiers0[-1]),
                                   prepared.packed, digits, perm,
                                   starts, counts, nbe0,
                                   tier_depths=tiers0)
        sync(out)
        return out
    dt_acc = timed("accumulate_te (tiered pallas)", phase2)
    sums = phase2()
    print(f"  {total_adds:,} adds -> {total_adds/dt_acc:.3e} adds/s",
          flush=True)

    def phase3():
        out = merge_buckets_te_pallas(curve, c, False, sums)
        sync(out)
        return out
    timed("merge_buckets_te", phase3)
    merged = phase3()

    def phase4():
        out = te_path.finish_te(curve, c, merged)
        sync(out.x)
        return out
    timed("combine+te_to_sw (finish)", phase4)

    # ---- microvariants on the dominant group, flat depth ----------------
    lanes = len(ws0) * nbe0
    pad_lanes = (-lanes) % 512
    total = lanes + pad_lanes
    nsteps = max(1, total_adds // max(lanes, 1))
    rows_n = prepared.packed.shape[1]
    rows_n_pad = rows_n + (-rows_n) % 8
    packed_pad = jnp.pad(prepared.packed,
                         ((0, 0), (0, rows_n_pad - rows_n)))
    starts_b = jnp.pad(starts[:, 1:nbe0 + 1].reshape(-1), (0, pad_lanes))
    counts_b = jnp.pad(counts[:, 1:nbe0 + 1].reshape(-1), (0, pad_lanes))
    wol = jnp.pad(jnp.repeat(jnp.arange(len(ws0), dtype=jnp.int32), nbe0),
                  (0, pad_lanes))

    def g_only():
        out = gather_only(nsteps, rows_n_pad, packed_pad, perm, wol,
                          starts_b, counts_b, digits)
        sync(out)
        return out
    dt = timed(f"gather-only x{nsteps}", g_only)
    print(f"  -> {nsteps*total/dt:.3e} gathered rows/s", flush=True)

    f = curve.field
    nl = f.n_limbs
    rows_fixed = jnp.zeros((rows_n_pad, total), jnp.uint32)
    mask_fixed = jnp.ones((1, total), jnp.uint32)
    one = jnp.broadcast_to(
        jnp.asarray(te_path.pack_u16(
            fp.ones(f, ()).reshape(1, -1))* 0 + 1)[:1, :1], (1, 1))
    x0 = jnp.zeros((nl, total), jnp.uint32)
    onep = jnp.tile(jnp.asarray(
        np.eye(1, nl, 0, np.uint32).T), (1, total))

    def a_only():
        out = add_only(curve, nsteps, 512, rows_fixed, mask_fixed,
                       x0, onep, onep, x0)
        sync(out[0])
        return out
    dt = timed(f"add-only x{nsteps}", a_only)
    print(f"  -> {nsteps*total/dt:.3e} kernel adds/s", flush=True)


if __name__ == "__main__":
    main()
