"""Pallas TPU kernel for the MSM bucket-accumulation inner step.

The hot loop of the whole framework: acc <- acc + point (complete mixed
add, RCB a=0) over all (window, bucket) lanes.  The XLA formulation moves
every intermediate limb plane through HBM; this kernel keeps the entire
working set in VMEM/registers (limb-major layout, see `fp_kernel.py`), so
the only HBM traffic per step is the gathered points and the accumulator
state.

This is the L2 "kernel layer" of the SURVEY's architecture map — the role
`ComputeBucketSums.cu` plays in the reference — expressed as a single
branch-free vector program instead of a warp-converged scatter loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curve.spec import CurveSpec
from ..field import fp
from ..field import fp_kernel as fk
from ..field.spec import limbs_from_int


def _mixed_add_body(curve: CurveSpec, acc_x, acc_y, acc_z, ax, ay, inf_mask,
                    ft, neg2):
    """Complete mixed add in limb-major kernel form; returns new (x, y, z).

    Same RCB formula sequence as `sw.add_mixed` (kept in lockstep); inf
    lanes pass the accumulator through.  `ft`/`neg2` are the reduction
    tables (kernel inputs)."""
    f = curve.field
    t0 = fk.kmul(f, acc_x, ax, ft)
    t1 = fk.kmul(f, acc_y, ay, ft)
    t2 = acc_z
    m_xy = fk.ksub(f, fk.kmul(f, fk.kadd(f, acc_x, acc_y, ft),
                              fk.kadd(f, ax, ay, ft), ft),
                   fk.kadd(f, t0, t1, ft), ft, neg2)
    m_yz = fk.kadd(f, fk.kmul(f, ay, acc_z, ft), acc_y, ft)
    m_xz = fk.kadd(f, fk.kmul(f, ax, acc_z, ft), acc_x, ft)
    u = fk.ksub(f, t1, fk.kmul_const(f, t2, curve.b3, ft), ft, neg2)
    v = fk.kadd(f, t1, fk.kmul_const(f, t2, curve.b3, ft), ft)
    w = fk.kmul_const(f, m_xz, curve.b3, ft)
    t3 = fk.kmul_const(f, t0, 3, ft)
    x3 = fk.ksub(f, fk.kmul(f, m_xy, u, ft), fk.kmul(f, m_yz, w, ft), ft, neg2)
    y3 = fk.kadd(f, fk.kmul(f, v, u, ft), fk.kmul(f, t3, w, ft), ft)
    z3 = fk.kadd(f, fk.kmul(f, m_yz, v, ft), fk.kmul(f, m_xy, t3, ft), ft)
    keep = inf_mask  # (1, T) uint32: 1 -> keep accumulator
    sel = lambda new, old: jnp.where(keep != 0, old, new)
    return sel(x3, acc_x), sel(y3, acc_y), sel(z3, acc_z)


@functools.lru_cache(maxsize=None)
def make_mixed_add(curve: CurveSpec, n_lanes: int, tile: int,
                   interpret: bool = False):
    """fn(acc_x, acc_y, acc_z, px, py, inf) -> (x, y, z); all limb-major
    (N, n_lanes) u32 (inf: (1, n_lanes) u32); Pallas grid over lane tiles
    with accumulator aliasing."""
    f = curve.field
    n = f.n_limbs
    assert n_lanes % tile == 0

    def kernel(ft_ref, neg2_ref, ax_ref, ay_ref, inf_ref,
               x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
        x, y, z = _mixed_add_body(
            curve, x_ref[...], y_ref[...], z_ref[...],
            ax_ref[...], ay_ref[...], inf_ref[...],
            ft_ref[...], neg2_ref[...])
        ox_ref[...] = x
        oy_ref[...] = y
        oz_ref[...] = z

    lane_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((n, n + 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    neg2_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(n_lanes // tile,),
        in_specs=[ft_spec, neg2_spec, lane_spec, lane_spec, mask_spec,
                  lane_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec, lane_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((n, n_lanes), jnp.uint32)
                        for _ in range(3)),
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )

    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)

    def fn(acc_x, acc_y, acc_z, px, py, inf):
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    px, py, inf, acc_x, acc_y, acc_z)

    return fn


def _full_add_body(curve: CurveSpec, x1, y1, z1, x2, y2, z2, skip_mask,
                   ft, neg2):
    """Complete projective add (RCB a=0) in kernel form; `skip_mask` lanes
    (1 -> skip) pass (x1, y1, z1) through."""
    f = curve.field
    t0 = fk.kmul(f, x1, x2, ft)
    t1 = fk.kmul(f, y1, y2, ft)
    t2 = fk.kmul(f, z1, z2, ft)
    m_xy = fk.ksub(f, fk.kmul(f, fk.kadd(f, x1, y1, ft),
                              fk.kadd(f, x2, y2, ft), ft),
                   fk.kadd(f, t0, t1, ft), ft, neg2)
    m_yz = fk.ksub(f, fk.kmul(f, fk.kadd(f, y1, z1, ft),
                              fk.kadd(f, y2, z2, ft), ft),
                   fk.kadd(f, t1, t2, ft), ft, neg2)
    m_xz = fk.ksub(f, fk.kmul(f, fk.kadd(f, x1, z1, ft),
                              fk.kadd(f, x2, z2, ft), ft),
                   fk.kadd(f, t0, t2, ft), ft, neg2)
    u = fk.ksub(f, t1, fk.kmul_const(f, t2, curve.b3, ft), ft, neg2)
    v = fk.kadd(f, t1, fk.kmul_const(f, t2, curve.b3, ft), ft)
    w = fk.kmul_const(f, m_xz, curve.b3, ft)
    t3 = fk.kmul_const(f, t0, 3, ft)
    x3 = fk.ksub(f, fk.kmul(f, m_xy, u, ft), fk.kmul(f, m_yz, w, ft), ft, neg2)
    y3 = fk.kadd(f, fk.kmul(f, v, u, ft), fk.kmul(f, t3, w, ft), ft)
    z3 = fk.kadd(f, fk.kmul(f, m_yz, v, ft), fk.kmul(f, m_xy, t3, ft), ft)
    sel = lambda new, old: jnp.where(skip_mask != 0, old, new)
    return sel(x3, x1), sel(y3, y1), sel(z3, z1)


@functools.lru_cache(maxsize=None)
def make_full_add(curve: CurveSpec, n_lanes: int, tile: int,
                  interpret: bool = False):
    """fn(x1, y1, z1, x2, y2, z2, skip) -> (x, y, z); limb-major planes."""
    f = curve.field
    n = f.n_limbs
    assert n_lanes % tile == 0

    def kernel(ft_ref, neg2_ref, x2_ref, y2_ref, z2_ref, skip_ref,
               x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
        x, y, z = _full_add_body(
            curve, x_ref[...], y_ref[...], z_ref[...],
            x2_ref[...], y2_ref[...], z2_ref[...], skip_ref[...],
            ft_ref[...], neg2_ref[...])
        ox_ref[...] = x
        oy_ref[...] = y
        oz_ref[...] = z

    lane_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((n, n + 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    neg2_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_lanes // tile,),
        in_specs=[ft_spec, neg2_spec, lane_spec, lane_spec, lane_spec,
                  mask_spec, lane_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec, lane_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((n, n_lanes), jnp.uint32)
                        for _ in range(3)),
        input_output_aliases={6: 0, 7: 1, 8: 2},
        interpret=interpret,
    )
    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)

    def fn(x1, y1, z1, x2, y2, z2, skip):
        # tables materialized inside the caller's trace (never cached)
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    x2, y2, z2, skip, x1, y1, z1)

    return fn


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def merge_buckets_pallas(curve: CurveSpec, c: int, interpret: bool,
                         bucket_sums):
    """Pallas variant of `pippenger.merge_buckets_all`: the masked per-bit
    expansion is reduced with a fori scan of full-add kernel steps (group
    columns per step), then a log tree over the final group, then the 2^j
    fold (tiny) on the XLA side."""
    from ..curve import sw
    n_win, n_buckets_eff = bucket_sums.x.shape[:2]
    n_bits = max(1, n_buckets_eff.bit_length())
    f = curve.field
    nl = f.n_limbs

    b_ids = np.arange(1, n_buckets_eff + 1, dtype=np.uint32)
    bitmask = np.stack([((b_ids >> j) & 1) == 0 for j in range(n_bits)])
    # skip[w, j, b] = 1 if bucket b lacks bit j (same for all windows)
    skip_np = np.broadcast_to(bitmask[None], (n_win, n_bits, n_buckets_eff))

    group = 128
    steps = max(1, n_buckets_eff // group)
    gcols = n_buckets_eff // steps
    lanes = n_win * n_bits * gcols
    tile = 512 if lanes % 512 == 0 else (128 if lanes % 128 == 0 else None)
    assert tile is not None, (n_win, n_bits, gcols)
    add_fn = make_full_add(curve, lanes, tile, interpret)

    # limb-major copies of bucket sums arranged (nl, n_win, steps, gcols)
    bx = jnp.moveaxis(bucket_sums.x, -1, 0).reshape(nl, n_win, steps, gcols)
    by = jnp.moveaxis(bucket_sums.y, -1, 0).reshape(nl, n_win, steps, gcols)
    bz = jnp.moveaxis(bucket_sums.z, -1, 0).reshape(nl, n_win, steps, gcols)
    skip = jnp.asarray(
        skip_np.reshape(n_win, n_bits, steps, gcols).astype(np.uint32))

    def body(t, acc):
        q_x = jnp.broadcast_to(bx[:, :, t, None, :], (nl, n_win, n_bits, gcols)
                               ).reshape(nl, lanes)
        q_y = jnp.broadcast_to(by[:, :, t, None, :], (nl, n_win, n_bits, gcols)
                               ).reshape(nl, lanes)
        q_z = jnp.broadcast_to(bz[:, :, t, None, :], (nl, n_win, n_bits, gcols)
                               ).reshape(nl, lanes)
        sk = skip[:, :, t, :].reshape(1, lanes)
        return add_fn(acc[0], acc[1], acc[2], q_x, q_y, q_z, sk)

    one = jnp.broadcast_to(
        jnp.asarray(limbs_from_int(1, nl))[:, None], (nl, lanes))
    init = (jnp.zeros((nl, lanes), jnp.uint32), one,
            jnp.zeros((nl, lanes), jnp.uint32))
    acc = jax.lax.fori_loop(0, steps, body, init)
    # tree over the group columns (XLA full adds on (n_win*n_bits, g) lanes)
    pt = sw.Point(acc[0].T.reshape(n_win, n_bits, gcols, nl),
                  acc[1].T.reshape(n_win, n_bits, gcols, nl),
                  acc[2].T.reshape(n_win, n_bits, gcols, nl))
    s = sw.sum_points(curve, pt, axis=2)        # (n_win, n_bits)

    def fold(k, a):
        a = sw.Point(*a)
        j = n_bits - 1 - k
        a = sw.dbl(curve, a)
        return tuple(sw.add(curve, a, sw.Point(s.x[:, j], s.y[:, j],
                                               s.z[:, j])))

    init2 = sw.Point(s.x[:, n_bits - 1], s.y[:, n_bits - 1],
                     s.z[:, n_bits - 1])
    out = jax.lax.fori_loop(1, n_bits, fold, tuple(init2))
    return sw.Point(*out)


@functools.lru_cache(maxsize=None)
def make_mixed_add_multi(curve: CurveSpec, n_lanes: int, tile: int,
                         ranks: int, interpret: bool = False):
    """Rank-batched variant: one kernel call performs `ranks` sequential
    mixed adds per lane (points shaped (N, ranks, n_lanes)), amortizing the
    per-step gather/dispatch glue of the fori loop."""
    f = curve.field
    n = f.n_limbs
    assert n_lanes % tile == 0

    def kernel(ft_ref, neg2_ref, ax_ref, ay_ref, inf_ref,
               x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
        x, y, z = x_ref[...], y_ref[...], z_ref[...]
        ft, neg2 = ft_ref[...], neg2_ref[...]
        for r in range(ranks):
            x, y, z = _mixed_add_body(
                curve, x, y, z, ax_ref[:, r, :], ay_ref[:, r, :],
                inf_ref[:, r, :], ft, neg2)
        ox_ref[...] = x
        oy_ref[...] = y
        oz_ref[...] = z

    lane_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    pts_spec = pl.BlockSpec((n, ranks, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    pinf_spec = pl.BlockSpec((1, ranks, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((n, n + 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    neg2_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_lanes // tile,),
        in_specs=[ft_spec, neg2_spec, pts_spec, pts_spec, pinf_spec,
                  lane_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec, lane_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((n, n_lanes), jnp.uint32)
                        for _ in range(3)),
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )
    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)

    def fn(acc_x, acc_y, acc_z, px, py, inf):
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    px, py, inf, acc_x, acc_y, acc_z)

    return fn


@functools.lru_cache(maxsize=None)
def make_mixed_add_rect(curve: CurveSpec, n_lanes: int, tile: int,
                        depth: int, interpret: bool = False):
    """Slab-consuming variant: points arrive as a PRE-GATHERED rectangle
    (depth, N, n_lanes) streamed through VMEM by the Pallas pipeline, so the
    hot loop performs zero HBM gathers — the TPU analog of the reference's
    sorted-bucket contiguous processing (`ComputeBucketSums.cu` after the
    partition/sort phases).  fn(acc..., rect_x, rect_y, inf) with inf
    (depth, 1, n_lanes); the kernel fori-loops the depth axis in VMEM."""
    f = curve.field
    n = f.n_limbs
    assert n_lanes % tile == 0

    def kernel(ft_ref, neg2_ref, rx_ref, ry_ref, inf_ref,
               x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
        ft, neg2 = ft_ref[...], neg2_ref[...]

        def body(r, xyz):
            x, y, z = xyz
            return _mixed_add_body(curve, x, y, z, rx_ref[r], ry_ref[r],
                                   inf_ref[r], ft, neg2)

        x, y, z = jax.lax.fori_loop(
            0, depth, body, (x_ref[...], y_ref[...], z_ref[...]))
        ox_ref[...] = x
        oy_ref[...] = y
        oz_ref[...] = z

    lane_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    rect_spec = pl.BlockSpec((depth, n, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    rinf_spec = pl.BlockSpec((depth, 1, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((n, n + 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    neg2_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_lanes // tile,),
        in_specs=[ft_spec, neg2_spec, rect_spec, rect_spec, rinf_spec,
                  lane_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec, lane_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((n, n_lanes), jnp.uint32)
                        for _ in range(3)),
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )
    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)

    def fn(acc_x, acc_y, acc_z, rx, ry, inf):
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    rx, ry, inf, acc_x, acc_y, acc_z)

    return fn


# rank-slab size for the materialized rectangle (bounds the HBM transient:
# S * N * lanes * 4B * 2; 32 ranks at 2^20-scale lanes ~ 2.3 GB)
_RECT_SLAB = 32


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 9, 10))
def accumulate_rect_pallas(curve: CurveSpec, c: int, tier_depths, px, py,
                           digits, perm, starts, counts, n_buckets_eff,
                           interpret=False):
    """Occupancy-tiered accumulate with rectangle MATERIALIZATION: for each
    tier, the (slab, N, lanes) point rectangle is gathered once in XLA and
    the Pallas kernel streams it as contiguous slabs (double-buffered by the
    pipeline) — replacing the per-rank gather + transpose glue of
    `accumulate_pass_pallas` whose dispatch/latency dominated round-1
    profiles (416 ms of an 870 ms 2^18 MSM)."""
    n = px.shape[0]
    n_win = digits.shape[0]
    lanes = n_win * n_buckets_eff
    tile = 512 if lanes >= 512 else 128
    pad_lanes = (-lanes) % tile
    total = lanes + pad_lanes
    f = curve.field
    nl = f.n_limbs

    starts_b = starts[:, 1:n_buckets_eff + 1].reshape(-1)
    counts_b = counts[:, 1:n_buckets_eff + 1].reshape(-1)
    if pad_lanes:
        starts_b = jnp.pad(starts_b, (0, pad_lanes))
        counts_b = jnp.pad(counts_b, (0, pad_lanes))
    win_of_lane = jnp.pad(
        jnp.repeat(jnp.arange(n_win, dtype=jnp.int32), n_buckets_eff),
        (0, pad_lanes))

    one = jnp.broadcast_to(
        jnp.asarray(limbs_from_int(1, nl))[:, None], (nl, total))

    order = jnp.argsort(-counts_b)
    st_s = starts_b[order]
    ct_s = counts_b[order]
    wol_s = win_of_lane[order]
    acc = (jnp.zeros((nl, total), jnp.uint32), one,
           jnp.zeros((nl, total), jnp.uint32))
    d_prev = 0
    p_len = total
    for d in tier_depths:
        if d > d_prev:
            span = d - d_prev
            S = min(_RECT_SLAB, span)
            n_slabs = -(-span // S)
            addp = make_mixed_add_rect(curve, p_len, min(tile, p_len), S,
                                       interpret)
            st_p, ct_p, wol_p = st_s[:p_len], ct_s[:p_len], wol_s[:p_len]

            def slab_body(si, a, st_p=st_p, ct_p=ct_p, wol_p=wol_p,
                          addp=addp, d_prev=d_prev, S=S, p_len=p_len):
                r0 = d_prev + si * S
                rr = r0 + jnp.arange(S)[:, None]               # (S, 1)
                pos = jnp.clip(st_p[None, :] + rr, 0, n - 1)   # (S, p)
                idx = perm[wol_p[None, :], pos]
                valid = rr < ct_p[None, :]
                gx = jnp.take(px, idx.reshape(-1), axis=0)     # (S*p, N)
                gy = jnp.take(py, idx.reshape(-1), axis=0)
                sign = digits[wol_p[None, :], idx].reshape(-1) < 0
                gy = fp.select(sign, fp.neg(f, gy), gy)
                rx = gx.reshape(S, p_len, nl).transpose(0, 2, 1)
                ry = gy.reshape(S, p_len, nl).transpose(0, 2, 1)
                inf = (~valid).astype(jnp.uint32)[:, None, :]  # (S, 1, p)
                return addp(a[0], a[1], a[2], rx, ry, inf)

            sub = (acc[0][:, :p_len], acc[1][:, :p_len], acc[2][:, :p_len])
            sub = jax.lax.fori_loop(0, n_slabs, slab_body, sub)
            acc = tuple(acc[k].at[:, :p_len].set(sub[k]) for k in range(3))
            d_prev = d_prev + n_slabs * S
        p_len = _next_prefix(p_len, tile)
    inv = jnp.argsort(order)
    out = tuple(a[:, inv] for a in acc)
    from ..curve import sw
    x = out[0].T[:lanes].reshape(n_win, n_buckets_eff, nl)
    y = out[1].T[:lanes].reshape(n_win, n_buckets_eff, nl)
    z = out[2].T[:lanes].reshape(n_win, n_buckets_eff, nl)
    return sw.Point(x, y, z)


def _next_prefix(p: int, tile: int) -> int:
    """Halve the lane prefix, keeping it a tile multiple (floor at tile)."""
    return max(tile, (p // 2 // tile) * tile)


def tier_schedule(desc_counts, tile: int = 512):
    """Static depth schedule for the occupancy-sorted accumulate: given the
    lane occupancy counts sorted DESCENDING (padded to the tile multiple,
    padding counts 0), returns the increasing per-tier depth tuple whose
    prefix halving matches `accumulate_pass_pallas`.  Host-side."""
    desc = np.asarray(desc_counts)
    total = len(desc)
    depths = []
    p = total
    while True:
        p_next = _next_prefix(p, tile)
        if p_next >= p:
            depths.append(int(desc[0]))      # final tier: cover the max
            break
        depths.append(int(desc[p_next]))
        p = p_next
    out, prev = [], 0
    for d in depths:
        # round up to ~12.5% granularity (min 8): occupancy noise across
        # scalar draws then maps to the SAME static schedule, so the fused
        # jit around the tiered accumulate does not recompile per MSM
        if d > 0:
            q = max(8, 1 << max(0, d.bit_length() - 4))
            d = -(-d // q) * q
        out.append(max(d, prev))
        prev = out[-1]
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 9, 10, 11, 12))
def accumulate_pass_pallas(curve: CurveSpec, c: int, cap: int, px, py,
                           digits, perm, starts, counts, n_buckets_eff=None,
                           interpret=False, rank_batch=1, tier_depths=None,
                           rank0=0):
    # rank_batch > 1 measured SLOWER on v5e (693/865/955 ms for R=1/2/4 at
    # 2^18): the step cost is kernel+gather bound, not dispatch bound, and
    # the (N, R, total) transpose grows with R.  Kept as a knob.
    """Drop-in Pallas variant of `pippenger.accumulate_pass_all`: same
    gather/control structure, but the wide mixed add runs in the kernel,
    `rank_batch` ranks per kernel invocation.  Lanes are padded to a tile
    multiple; padding lanes (and beyond-occupancy ranks) are infinity.

    `tier_depths` (static increasing ints, last >= the group's max
    occupancy) activates the occupancy-sorted schedule — the TPU analog of
    the reference's descending-occupancy bucket sort (`SortCounts.cu`,
    launch rationale `MSM.cu:453-459`): lanes are sorted by bucket count
    (descending) and each successive depth tier runs on a halved lane
    prefix, so rectangle work tracks the occupancy curve instead of
    max * n_buckets."""
    n = px.shape[0]
    if n_buckets_eff is None:
        n_buckets_eff = 1 << (c - 1)
    n_win = digits.shape[0]
    lanes = n_win * n_buckets_eff
    tile = 512 if lanes >= 512 else 128
    pad_lanes = (-lanes) % tile
    total = lanes + pad_lanes
    f = curve.field
    nl = f.n_limbs

    starts_b = starts[:, 1:n_buckets_eff + 1].reshape(-1)      # (lanes,)
    counts_b = counts[:, 1:n_buckets_eff + 1].reshape(-1)
    if pad_lanes:
        starts_b = jnp.pad(starts_b, (0, pad_lanes))
        counts_b = jnp.pad(counts_b, (0, pad_lanes))           # count 0 -> inf
    win_of_lane = jnp.pad(
        jnp.repeat(jnp.arange(n_win, dtype=jnp.int32), n_buckets_eff),
        (0, pad_lanes))

    one = jnp.broadcast_to(
        jnp.asarray(limbs_from_int(1, nl))[:, None], (nl, total))

    if tier_depths is not None:
        # Occupancy-sorted tiered schedule (see docstring).
        order = jnp.argsort(-counts_b)                         # desc by count
        st_s = starts_b[order]
        ct_s = counts_b[order]
        wol_s = win_of_lane[order]
        acc = (jnp.zeros((nl, total), jnp.uint32), one,
               jnp.zeros((nl, total), jnp.uint32))
        d_prev = 0
        p_len = total
        for d in tier_depths:
            if d > d_prev:
                addp = make_mixed_add(curve, p_len, min(tile, p_len),
                                      interpret)
                st_p, ct_p, wol_p = st_s[:p_len], ct_s[:p_len], wol_s[:p_len]

                def tbody(t, a, st_p=st_p, ct_p=ct_p, wol_p=wol_p, addp=addp,
                          d_prev=d_prev):
                    r = d_prev + t
                    pos = jnp.clip(st_p + r, 0, n - 1)
                    idx = perm[wol_p, pos]
                    valid = r < ct_p
                    gx = jnp.take(px, idx, axis=0)
                    gy = jnp.take(py, idx, axis=0)
                    sign = digits[wol_p, idx] < 0
                    gy = fp.select(sign, fp.neg(f, gy), gy)
                    inf = (~valid).astype(jnp.uint32)[None, :]
                    return addp(a[0], a[1], a[2], gx.T, gy.T, inf)

                sub = (acc[0][:, :p_len], acc[1][:, :p_len],
                       acc[2][:, :p_len])
                sub = jax.lax.fori_loop(0, d - d_prev, tbody, sub)
                acc = tuple(acc[k].at[:, :p_len].set(sub[k])
                            for k in range(3))
                d_prev = d
            p_len = _next_prefix(p_len, tile)
        inv = jnp.argsort(order)
        out = tuple(a[:, inv] for a in acc)
        from ..curve import sw
        x = out[0].T[:lanes].reshape(n_win, n_buckets_eff, nl)
        y = out[1].T[:lanes].reshape(n_win, n_buckets_eff, nl)
        z = out[2].T[:lanes].reshape(n_win, n_buckets_eff, nl)
        return sw.Point(x, y, z)

    R = rank_batch
    if R == 1:
        add1 = make_mixed_add(curve, total, tile, interpret)

        def body(t, acc):
            r = rank0 + t
            pos = jnp.clip(starts_b + r, 0, n - 1)             # (total,)
            idx = perm[win_of_lane, pos]
            valid = r < counts_b
            gx = jnp.take(px, idx, axis=0)                     # (total, N)
            gy = jnp.take(py, idx, axis=0)
            sign = digits[win_of_lane, idx] < 0
            gy = fp.select(sign, fp.neg(f, gy), gy)
            inf = (~valid).astype(jnp.uint32)[None, :]
            return add1(acc[0], acc[1], acc[2], gx.T, gy.T, inf)
    else:
        add_fn = make_mixed_add_multi(curve, total, tile, R, interpret)

        def body(t, acc):
            r_base = rank0 + t * R
            rr = r_base + jnp.arange(R)[:, None]               # (R, 1)
            pos = jnp.clip(starts_b[None, :] + rr, 0, n - 1)   # (R, total)
            idx = perm[win_of_lane[None, :], pos]
            valid = rr < counts_b[None, :]
            gx = jnp.take(px, idx.reshape(-1), axis=0)         # (R*total, N)
            gy = jnp.take(py, idx.reshape(-1), axis=0)
            sign = digits[win_of_lane[None, :], idx].reshape(-1) < 0
            gy = fp.select(sign, fp.neg(f, gy), gy)
            gx = gx.reshape(R, total, nl).transpose(2, 0, 1)   # (N, R, total)
            gy = gy.reshape(R, total, nl).transpose(2, 0, 1)
            inf = (~valid).astype(jnp.uint32)[None, :, :]      # (1, R, total)
            return add_fn(acc[0], acc[1], acc[2], gx, gy, inf)

    init = (jnp.zeros((nl, total), jnp.uint32), one,
            jnp.zeros((nl, total), jnp.uint32))
    out = jax.lax.fori_loop(0, -(-cap // R), body, init)
    from ..curve import sw
    x = out[0].T[:lanes].reshape(n_win, n_buckets_eff, nl)
    y = out[1].T[:lanes].reshape(n_win, n_buckets_eff, nl)
    z = out[2].T[:lanes].reshape(n_win, n_buckets_eff, nl)
    return sw.Point(x, y, z)


# ---------------------------------------------------------------------------
# Twisted-Edwards (a=-1, extended) kernels — the 7M strongly-unified mixed
# add of the FPGA reference's pipelined adder
# (`prize1b-msm-fpga/hardcaml/libs/twisted_edwards/mixed_add.ml`), in wide
# vector form.  XLA reference forms live in `msm/te_path.py` /
# `curve/te.py`; keep the formula sequences in lockstep.
# ---------------------------------------------------------------------------


def _te_madd_body(curve: CurveSpec, x, y, z, t, yp, ym, kt_c, ft, neg2,
                  kmul_fn=None):
    """madd-2008-hwcd-3 (a=-1): acc (x,y,z,t) + precomp (yp, ym, kt).
    `kt_c` is the already-sign/validity-adjusted C = T1*kT2 term; yp/ym are
    already sign-swapped / identity-selected.  7 kmul total (C's mul happens
    in the caller so sign handling can ride on the product).  `kmul_fn`
    overrides the multiply (e.g. the MXU form)."""
    f = curve.field
    km = kmul_fn or (lambda u, v: fk.kmul(f, u, v, ft))
    a = km(fk.ksub(f, y, x, ft, neg2), ym)
    b = km(fk.kadd(f, y, x, ft), yp)
    d = fk.kadd(f, z, z, ft)
    e = fk.ksub(f, b, a, ft, neg2)
    ff_ = fk.ksub(f, d, kt_c, ft, neg2)
    g = fk.kadd(f, d, kt_c, ft)
    h = fk.kadd(f, b, a, ft)
    return (km(e, ff_), km(g, h), km(ff_, g), km(e, h))


def _kmul_mode() -> str:
    """Kernel-multiply schedule: 'mxu' (diag-sum + fold as exact-f32
    matmuls), 'hybrid' (VPU diag-sum, MXU fold — `fp_kernel.kmul_hybrid`),
    or 'vpu' (all-VPU `fp_kernel.kmul`).  A '-tree' suffix on 'vpu'/'hybrid'
    selects the pairwise-tree diagonal accumulation
    (`fp_kernel._diag_tree`, ~4x fewer VPU add-rows, bit-identical).
    Env A/B knob.

    Default 'hybrid' after the r3 on-chip A/B (exact-precision kernels,
    microbench_te_kernel): hybrid 46.3 M adds/s vs vpu 35.0 / mxu 19.7
    (mxu pays the 6-pass HIGHEST-precision smat matmul)."""
    import os
    return os.environ.get("ZPRIZE_KMUL", "hybrid")


def _parse_kmul_mode(kmul_mode: str) -> tuple[str, str]:
    """'hybrid-tree' -> ('hybrid', 'tree'); 'vpu' -> ('vpu', 'flat')."""
    base, _, sfx = kmul_mode.partition("-")
    return base, (sfx or "flat")


@functools.lru_cache(maxsize=None)
def make_te_mixed_add(curve: CurveSpec, n_lanes: int, tile: int,
                      interpret: bool = False, kmul_mode: str | None = None):
    """fn(x, y, z, t, rows, mask) -> (x, y, z, t).

    rows: (3h_pad, n_lanes) u32 — the gathered u16-PACKED precomputed
    planes (h = ceil(L/2) words each of Y+X, Y-X, 2d·XY; see
    `te_path.pack_u16`).  mask: (1, n_lanes) u32, bit0 = valid,
    bit1 = digit sign.  Unpack + sign/identity selection happen in-kernel
    so the HBM gather stays one ~160B contiguous row per lane.
    `kmul_mode` selects the multiply schedule for the 7 multiplies
    (see `_kmul_mode`)."""
    f = curve.field
    n = f.n_limbs
    h = (n + 1) // 2
    rows_n = 3 * h + (-3 * h) % 8      # sublane-pad the packed rows to 8
    assert n_lanes % tile == 0
    if kmul_mode is None:
        kmul_mode = _kmul_mode()
    kbase, kdiag = _parse_kmul_mode(kmul_mode)
    if kbase == "mxu":
        smat_np, fmat_np, _, _ = fk.mxu_tables(f)
        extra_np = (smat_np, fmat_np)
    elif kbase == "hybrid":
        _, fmat_np, _, _ = fk.mxu_tables(f)
        extra_np = (fmat_np,)
    else:
        extra_np = ()

    def kernel(*refs):
        # refs = (ft, neg2, rows, mask, x, y, z, t, [smat][, fmat],
        #         ox, oy, oz, ot) — pallas passes all inputs, then outputs
        (ft_ref, neg2_ref, rows_ref, mask_ref,
         x_ref, y_ref, z_ref, t_ref) = refs[:8]
        ox_ref, oy_ref, oz_ref, ot_ref = refs[-4:]
        ft, neg2 = ft_ref[...], neg2_ref[...]
        if kbase == "mxu":
            smat, fmat = refs[8][...], refs[9][...]
            km = lambda u, v: fk.kmul_mxu(f, u, v, smat, fmat, ft)
        elif kbase == "hybrid":
            fmat = refs[8][...]
            km = lambda u, v: fk.kmul_hybrid(f, u, v, fmat, ft, diag=kdiag)
        elif kdiag != "flat":
            km = lambda u, v: fk.kmul(f, u, v, ft, diag=kdiag)
        else:
            km = None
        rows = rows_ref[...]
        m = mask_ref[...]                       # (1, T)
        valid = (m & 1) != 0
        sign = (m & 2) != 0

        def unpack(sl):                          # (h, T) -> (n, T)
            return jnp.concatenate([sl & 0xFFFF, sl >> 16], axis=0)[:n]

        yp = unpack(rows[0:h])
        ym = unpack(rows[h:2 * h])
        kt = unpack(rows[2 * h:3 * h])
        # sign: -(X,Y) swaps (Y+X, Y-X) and negates the kT plane; fold the
        # negation into the C product below (cheaper than negating kt).
        yp, ym = (jnp.where(sign, ym, yp), jnp.where(sign, yp, ym))
        # identity operand (1, 1, 0) for invalid lanes
        one = (jax.lax.broadcasted_iota(jnp.uint32, (n, yp.shape[1]), 0)
               == 0).astype(jnp.uint32)
        yp = jnp.where(valid, yp, one)
        ym = jnp.where(valid, ym, one)
        c = km(t_ref[...], kt) if km else fk.kmul(f, t_ref[...], kt, ft)
        c = jnp.where(sign, fk.kneg(f, c, ft, neg2), c)
        c = jnp.where(valid, c, jnp.zeros_like(c))
        x, y, z, t = _te_madd_body(curve, x_ref[...], y_ref[...], z_ref[...],
                                   t_ref[...], yp, ym, c, ft, neg2,
                                   kmul_fn=km)
        ox_ref[...] = x
        oy_ref[...] = y
        oz_ref[...] = z
        ot_ref[...] = t

    lane_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((rows_n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((n, n + 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    neg2_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [ft_spec, neg2_spec, rows_spec, mask_spec,
                lane_spec, lane_spec, lane_spec, lane_spec]
    in_specs += [pl.BlockSpec(m.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for m in extra_np]
    call = pl.pallas_call(
        kernel,
        grid=(n_lanes // tile,),
        in_specs=in_specs,
        out_specs=(lane_spec, lane_spec, lane_spec, lane_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((n, n_lanes), jnp.uint32)
                        for _ in range(4)),
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )
    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)

    def fn(x, y, z, t, rows, mask):
        extra = tuple(jnp.asarray(m) for m in extra_np)
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    rows, mask, x, y, z, t, *extra)

    return fn


def _te_full_add_body(curve: CurveSpec, x1, y1, z1, t1, x2, y2, z2, t2,
                      skip_mask, ft, neg2, kcol, kmul_fn=None):
    """add-2008-hwcd-3 (a=-1) full add: 9 kmul (one against the constant
    2d column `kcol` (N, 1)); skip lanes pass operand 1 through."""
    f = curve.field
    km = kmul_fn or (lambda u, v: fk.kmul(f, u, v, ft))
    a = km(fk.ksub(f, y1, x1, ft, neg2), fk.ksub(f, y2, x2, ft, neg2))
    b = km(fk.kadd(f, y1, x1, ft), fk.kadd(f, y2, x2, ft))
    c = km(km(t1, t2), jnp.broadcast_to(kcol, t1.shape))
    zz = km(z1, z2)
    d = fk.kadd(f, zz, zz, ft)
    e = fk.ksub(f, b, a, ft, neg2)
    ff_ = fk.ksub(f, d, c, ft, neg2)
    g = fk.kadd(f, d, c, ft)
    h = fk.kadd(f, b, a, ft)
    x3 = km(e, ff_)
    y3 = km(g, h)
    z3 = km(ff_, g)
    t3 = km(e, h)
    sel = lambda new, old: jnp.where(skip_mask != 0, old, new)
    return sel(x3, x1), sel(y3, y1), sel(z3, z1), sel(t3, t1)


@functools.lru_cache(maxsize=None)
def make_te_full_add(curve: CurveSpec, n_lanes: int, tile: int,
                     interpret: bool = False, kmul_mode: str | None = None):
    """fn(x1,y1,z1,t1, x2,y2,z2,t2, skip) -> (x,y,z,t); limb-major planes.
    `kmul_mode` selects the multiply schedule for the 9 multiplies."""
    from ..curve import te as te_mod
    f = curve.field
    n = f.n_limbs
    assert n_lanes % tile == 0
    k_int = te_mod.te_params(curve).k
    if kmul_mode is None:
        kmul_mode = _kmul_mode()
    kbase, kdiag = _parse_kmul_mode(kmul_mode)
    if kbase == "mxu":
        smat_np, fmat_np, _, _ = fk.mxu_tables(f)
        extra_np = (smat_np, fmat_np)
    elif kbase == "hybrid":
        _, fmat_np, _, _ = fk.mxu_tables(f)
        extra_np = (fmat_np,)
    else:
        extra_np = ()

    def kernel(*refs):
        (ft_ref, neg2_ref, kcol_ref, x2_ref, y2_ref, z2_ref, t2_ref,
         skip_ref, x_ref, y_ref, z_ref, t_ref) = refs[:12]
        ox_ref, oy_ref, oz_ref, ot_ref = refs[-4:]
        if kbase == "mxu":
            smat, fmat = refs[12][...], refs[13][...]
            ftv = ft_ref[...]
            km = lambda u, v: fk.kmul_mxu(f, u, v, smat, fmat, ftv)
        elif kbase == "hybrid":
            fmat = refs[12][...]
            ftv = ft_ref[...]
            km = lambda u, v: fk.kmul_hybrid(f, u, v, fmat, ftv, diag=kdiag)
        elif kdiag != "flat":
            ftv = ft_ref[...]
            km = lambda u, v: fk.kmul(f, u, v, ftv, diag=kdiag)
        else:
            km = None
        x, y, z, t = _te_full_add_body(
            curve, x_ref[...], y_ref[...], z_ref[...], t_ref[...],
            x2_ref[...], y2_ref[...], z2_ref[...], t2_ref[...],
            skip_ref[...], ft_ref[...], neg2_ref[...], kcol_ref[...],
            kmul_fn=km)
        ox_ref[...] = x
        oy_ref[...] = y
        oz_ref[...] = z
        ot_ref[...] = t

    lane_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((n, n + 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [ft_spec, neg2_spec := col_spec, col_spec,
                lane_spec, lane_spec, lane_spec, lane_spec, mask_spec,
                lane_spec, lane_spec, lane_spec, lane_spec]
    in_specs += [pl.BlockSpec(m.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for m in extra_np]
    call = pl.pallas_call(
        kernel,
        grid=(n_lanes // tile,),
        in_specs=in_specs,
        out_specs=(lane_spec, lane_spec, lane_spec, lane_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((n, n_lanes), jnp.uint32)
                        for _ in range(4)),
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
        interpret=interpret,
    )
    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)
    kcol_np = np.asarray(limbs_from_int(k_int, n), np.uint32)[:, None]

    def fn(x1, y1, z1, t1, x2, y2, z2, t2, skip):
        extra = tuple(jnp.asarray(m) for m in extra_np)
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    jnp.asarray(kcol_np), x2, y2, z2, t2, skip,
                    x1, y1, z1, t1, *extra)

    return fn


def _te_dbl_body(curve: CurveSpec, x, y, z, t, ft, neg2, kmul_fn=None):
    """dbl-2008-hwcd (a=-1) in kernel form: 4M + 4S + adds.  Mirrors
    `te.dbl` (keep in lockstep)."""
    f = curve.field
    km = kmul_fn or (lambda u, v: fk.kmul(f, u, v, ft))
    a = km(x, x)
    b = km(y, y)
    zz = km(z, z)
    cc = fk.kadd(f, zz, zz, ft)
    d = fk.kneg(f, a, ft, neg2)                        # a_te = -1
    xy = fk.kadd(f, x, y, ft)
    e = fk.ksub(f, fk.ksub(f, km(xy, xy), a, ft, neg2), b, ft, neg2)
    g = fk.kadd(f, d, b, ft)
    ff_ = fk.ksub(f, g, cc, ft, neg2)
    h = fk.ksub(f, d, b, ft, neg2)
    return km(e, ff_), km(g, h), km(ff_, g), km(e, h)


@functools.lru_cache(maxsize=None)
def make_te_dbl_chain(curve: CurveSpec, n_lanes: int, tile: int,
                      n_dbls: int, interpret: bool = False,
                      kmul_mode: str | None = None):
    """fn(x, y, z, t) -> (x, y, z, t) after `n_dbls` sequential doublings;
    limb-major (N, n_lanes) planes.

    The init-stage workhorse: the window-precompute table
    (`te_path.prepare_points_collapsed`, the `PrecomputePoints.cu:11` role)
    needs (m-1)*shift sequential doublings of every point — as XLA ops each
    dbl round-trips 8 limb planes through HBM (measured: 133.6 s prep at
    2^18/m=16, ~20x the kernel form's per-row cost); in-kernel the whole
    chain state lives in VMEM and HBM sees one read + one write per chain."""
    f = curve.field
    n = f.n_limbs
    assert n_lanes % tile == 0
    if kmul_mode is None:
        kmul_mode = _kmul_mode()
    kbase, kdiag = _parse_kmul_mode(kmul_mode)
    if kbase == "mxu":
        smat_np, fmat_np, _, _ = fk.mxu_tables(f)
        extra_np = (smat_np, fmat_np)
    elif kbase == "hybrid":
        _, fmat_np, _, _ = fk.mxu_tables(f)
        extra_np = (fmat_np,)
    else:
        extra_np = ()

    def kernel(*refs):
        (ft_ref, neg2_ref, x_ref, y_ref, z_ref, t_ref) = refs[:6]
        ox_ref, oy_ref, oz_ref, ot_ref = refs[-4:]
        ft, neg2 = ft_ref[...], neg2_ref[...]
        if kbase == "mxu":
            smat, fmat = refs[6][...], refs[7][...]
            km = lambda u, v: fk.kmul_mxu(f, u, v, smat, fmat, ft)
        elif kbase == "hybrid":
            fmat = refs[6][...]
            km = lambda u, v: fk.kmul_hybrid(f, u, v, fmat, ft, diag=kdiag)
        elif kdiag != "flat":
            km = lambda u, v: fk.kmul(f, u, v, ft, diag=kdiag)
        else:
            km = None

        def body(_, a):
            return _te_dbl_body(curve, *a, ft, neg2, kmul_fn=km)

        x, y, z, t = jax.lax.fori_loop(
            0, n_dbls, body,
            (x_ref[...], y_ref[...], z_ref[...], t_ref[...]))
        ox_ref[...] = x
        oy_ref[...] = y
        oz_ref[...] = z
        ot_ref[...] = t

    lane_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((n, n + 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    neg2_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [ft_spec, neg2_spec, lane_spec, lane_spec, lane_spec,
                lane_spec]
    in_specs += [pl.BlockSpec(m_.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for m_ in extra_np]
    call = pl.pallas_call(
        kernel,
        grid=(n_lanes // tile,),
        in_specs=in_specs,
        out_specs=(lane_spec, lane_spec, lane_spec, lane_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((n, n_lanes), jnp.uint32)
                        for _ in range(4)),
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        interpret=interpret,
    )
    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)

    def fn(x, y, z, t):
        extra = tuple(jnp.asarray(m_) for m_ in extra_np)
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    x, y, z, t, *extra)

    return fn


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def te_dbl_chain_pallas(curve: CurveSpec, n_dbls: int, interpret: bool,
                        pt):
    """`n_dbls` doublings of a TePoint with (n, L) row-major planes, via
    the chain kernel (lane pad + limb-major transposes at the boundary)."""
    from ..curve import te as te_mod
    n = pt.x.shape[0]
    tile = 512 if n >= 512 else 128
    pad = (-n) % tile
    planes = []
    for a in pt:
        a = a.T                                     # (L, n)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        planes.append(a)
    fn = make_te_dbl_chain(curve, n + pad, tile, n_dbls, interpret)
    out = fn(*planes)
    return te_mod.TePoint(*(a[:, :n].T for a in out))


@functools.lru_cache(maxsize=None)
def make_te_combine(curve: CurveSpec, n_win: int, c: int,
                    interpret: bool = False, kmul_mode: str | None = None):
    """fn(planes) -> (x, y, z, t) single-point limb-major (N, TILE) planes
    (result in every lane; read lane 0).

    Fuses the ENTIRE window combine  sum_w 2^(cw) W_w  (MSB-first: c dbls +
    1 add per window) into ONE kernel: the XLA form (`_combine_core_te`)
    runs ~n_win*(c+1) sequential single-lane field ops each paying an HBM
    round trip (~88 ms at c=17 measured on v5e); in-kernel the whole state
    lives in registers/VMEM.  `planes`: (n_win, 4, N, TILE) — window w's
    (x, y, z, t) broadcast across the lane tile."""
    from ..curve import te as te_mod
    f = curve.field
    n = f.n_limbs
    tile = 128
    k_int = te_mod.te_params(curve).k
    if kmul_mode is None:
        kmul_mode = _kmul_mode()
    kbase, kdiag = _parse_kmul_mode(kmul_mode)
    if kbase in ("mxu", "hybrid"):
        # single-lane work: the MXU fold matmul pays more in operand
        # staging than it saves at T=128 — use the pure-VPU schedule
        kbase, kdiag = "vpu", "flat"

    def kernel(ft_ref, neg2_ref, kcol_ref, pl_ref, ox, oy, oz, ot):
        ft, neg2 = ft_ref[...], neg2_ref[...]
        km = ((lambda u, v: fk.kmul(f, u, v, ft, diag=kdiag))
              if kdiag != "flat" else None)
        kmf = km or (lambda u, v: fk.kmul(f, u, v, ft))
        kcol = kcol_ref[...]
        zero_skip = jnp.zeros((1, tile), jnp.uint32)

        def win_body(i, acc):
            w = n_win - 1 - i

            def dbl_body(_, a):
                return _te_dbl_body(curve, *a, ft, neg2, kmul_fn=km)

            x, y, z, t = jax.lax.fori_loop(0, c, dbl_body, acc)
            return _te_full_add_body(
                curve, x, y, z, t,
                pl_ref[w, 0], pl_ref[w, 1], pl_ref[w, 2], pl_ref[w, 3],
                zero_skip, ft, neg2, kcol, kmul_fn=km)

        init = (pl_ref[n_win - 1, 0], pl_ref[n_win - 1, 1],
                pl_ref[n_win - 1, 2], pl_ref[n_win - 1, 3])
        x, y, z, t = jax.lax.fori_loop(1, n_win, win_body, init)
        ox[...] = x
        oy[...] = y
        oz[...] = z
        ot[...] = t

    vspec = lambda shape: pl.BlockSpec(shape, lambda: tuple([0] * len(shape)),
                                       memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[vspec((n, n + 2)), vspec((n, 1)), vspec((n, 1)),
                  vspec((n_win, 4, n, tile))],
        out_specs=tuple(vspec((n, tile)) for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((n, tile), jnp.uint32)
                        for _ in range(4)),
        interpret=interpret,
    )
    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)
    kcol_np = np.asarray(limbs_from_int(k_int, n), np.uint32)[:, None]

    def fn(planes):
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    jnp.asarray(kcol_np), planes)

    return fn


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def combine_te_pallas(curve: CurveSpec, c: int, interpret: bool,
                      window_sums):
    """Pallas form of `te_path._combine_core_te`: window_sums is a TePoint
    of (n_win, L) planes; returns the combined single TePoint ((L,) planes)."""
    from ..curve import te as te_mod
    n_win = window_sums.x.shape[0]
    nl = curve.field.n_limbs
    tile = 128
    # (n_win, 4, N, tile): limb-major, broadcast across the lane tile
    planes = jnp.stack(
        [jnp.broadcast_to(a.reshape(n_win, nl, 1)[:, None], (n_win, 1, nl, tile))
         for a in window_sums], axis=1).reshape(n_win, 4, nl, tile)
    fn = make_te_combine(curve, n_win, c, interpret)
    x, y, z, t = fn(planes)
    return te_mod.TePoint(x[:, 0], y[:, 0], z[:, 0], t[:, 0])


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def combine_te_batch_pallas(curve: CurveSpec, c: int, interpret: bool,
                            window_sums):
    """Lane-BATCHED window combine: window_sums is a TePoint of
    (n_steps, B, L) planes with B <= 128 independent combines riding the
    lane axis; returns a TePoint of (B, L) planes.  Same kernel as
    `combine_te_pallas` (the body is lane-parallel already) — used for the
    per-window fold chains of the merge tails, where the XLA form's
    sequential tiny ops are pure per-op overhead."""
    from ..curve import te as te_mod
    n_steps, b = window_sums.x.shape[:2]
    assert b <= 128, b
    nl = curve.field.n_limbs
    tile = 128
    planes = jnp.stack(
        [jnp.moveaxis(jnp.pad(a, ((0, 0), (0, tile - b), (0, 0))), -1, 1)
         for a in window_sums], axis=1)              # (steps, 4, nl, tile)
    fn = make_te_combine(curve, n_steps, c, interpret)
    x, y, z, t = fn(planes)
    return te_mod.TePoint(x.T[:b], y.T[:b], z.T[:b], t.T[:b])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 8, 9, 10))
def accumulate_te_pallas(curve: CurveSpec, c: int, cap: int, packed,
                         digits, perm, starts, counts, n_buckets_eff=None,
                         interpret=False, tier_depths=None):
    """TE-form tiered accumulate (Pallas): mirrors the tiered branch of
    `accumulate_pass_pallas` with (1) the single-row packed gather and
    (2) the 7M unified TE kernel.  Returns a TePoint of (n_win,
    n_buckets_eff) lanes."""
    from ..curve import te as te_mod
    n = packed.shape[1]                    # packed: column-major (3h, N)
    if n_buckets_eff is None:
        n_buckets_eff = 1 << (c - 1)
    n_win = digits.shape[0]
    lanes = n_win * n_buckets_eff
    tile = 512 if lanes >= 512 else 128
    pad_lanes = (-lanes) % tile
    total = lanes + pad_lanes
    f = curve.field
    nl = f.n_limbs
    h = (nl + 1) // 2
    rows_n = 3 * h + (-3 * h) % 8
    # sublane-pad AFTER the gather, not before: padding the whole packed
    # table materializes a full (rows_n, N) HLO temp copy per accumulate
    # dispatch — 10 GB at 2^26 next to the 10.47 GB resident table, the
    # r5 first-MSM OOM (and ~2.7 GB of pure HBM traffic per chunk at
    # 2^24).  Padding the gathered (3h, p_len) rows costs ~10 MB and
    # fuses into the gather.
    pad_rows = max(0, rows_n - packed.shape[0])

    starts_b = starts[:, 1:n_buckets_eff + 1].reshape(-1)
    counts_b = counts[:, 1:n_buckets_eff + 1].reshape(-1)
    if pad_lanes:
        starts_b = jnp.pad(starts_b, (0, pad_lanes))
        counts_b = jnp.pad(counts_b, (0, pad_lanes))
    win_of_lane = jnp.pad(
        jnp.repeat(jnp.arange(n_win, dtype=jnp.int32), n_buckets_eff),
        (0, pad_lanes))

    one = jnp.broadcast_to(
        jnp.asarray(limbs_from_int(1, nl))[:, None], (nl, total))
    if tier_depths is None:
        tier_depths = (cap,)

    order = jnp.argsort(-counts_b)
    st_s = starts_b[order]
    ct_s = counts_b[order]
    wol_s = win_of_lane[order]

    # Tier structure: the prefix-halving ladder is a function of (total,
    # tile) alone — STATIC — while the per-tier depth bounds may be traced
    # (`tier_depths="traced"`), computed here from the sorted counts
    # exactly as `tier_schedule` does on the host.  Traced depths mean ONE
    # compile serves every occupancy profile (a prover commits dozens of
    # polynomials, each a different profile: static depths retraced and
    # recompiled the whole fused MSM graph per commit), and the
    # dispatch->host->dispatch sync for the schedule disappears.
    prefixes = [total]
    while _next_prefix(prefixes[-1], tile) < prefixes[-1]:
        prefixes.append(_next_prefix(prefixes[-1], tile))
    if tier_depths == "traced":
        depths = [ct_s[p] for p in prefixes[1:]] + [ct_s[0]]
        running = depths[0]
        traced_d = [running]
        for d in depths[1:]:
            running = jnp.maximum(running, d)
            traced_d.append(running)
        tiers = [(p, None, dt) for p, dt in zip(prefixes, traced_d)]
    else:
        # a static schedule may be longer than this ladder (computed with a
        # smaller tile): the extra tiers run at the floor prefix
        ds = list(tier_depths) + [tier_depths[-1]] * (
            len(prefixes) - len(tier_depths))
        pfx = prefixes + [prefixes[-1]] * (len(ds) - len(prefixes))
        tiers = [(p, d, None) for p, d in zip(pfx, ds)]

    acc = (jnp.zeros((nl, total), jnp.uint32), one, one,
           jnp.zeros((nl, total), jnp.uint32))
    d_prev = 0           # static int, or traced once depths are traced
    for p_len, d_static, d_traced in tiers:
        d = d_traced if d_static is None else d_static
        if d_static is not None and d_static <= d_prev:
            continue
        addp = make_te_mixed_add(curve, p_len, min(tile, p_len),
                                 interpret)
        st_p, ct_p, wol_p = st_s[:p_len], ct_s[:p_len], wol_s[:p_len]

        def tbody(r, a, st_p=st_p, ct_p=ct_p, wol_p=wol_p, addp=addp):
            pos = jnp.clip(st_p + r, 0, n - 1)
            idx = perm[wol_p, pos]
            valid = (r < ct_p).astype(jnp.uint32)
            sign = (digits[wol_p, idx] < 0).astype(jnp.uint32)
            rows = jnp.take(packed, idx, axis=1)       # (3h, p)
            if pad_rows:
                rows = jnp.pad(rows, ((0, pad_rows), (0, 0)))
            mask = (valid | (sign << 1))[None, :]
            return addp(a[0], a[1], a[2], a[3], rows, mask)

        sub = tuple(a[:, :p_len] for a in acc)
        sub = jax.lax.fori_loop(d_prev, d, tbody, sub)
        acc = tuple(acc[k].at[:, :p_len].set(sub[k]) for k in range(4))
        d_prev = d
    inv = jnp.argsort(order)
    out = tuple(a[:, inv] for a in acc)
    return te_mod.TePoint(
        *(o.T[:lanes].reshape(n_win, n_buckets_eff, nl) for o in out))


@functools.lru_cache(maxsize=None)
def make_te_mixed_add_slab(curve: CurveSpec, n_lanes: int, tile: int,
                           s_ranks: int, interpret: bool = False,
                           kmul_mode: str | None = None):
    """Slab-consuming TE mixed add: fn(x, y, z, t, slab, valid) -> (x,y,z,t).

    slab: (s_ranks, rows_pad, n_lanes) u32 — `s_ranks` PRE-FETCHED packed
    rows per lane (from the bucket-major SORTED table, so the XLA-side fetch
    is a contiguous S-row strip per lane: ~2.5x cheaper than per-rank row
    gathers, measured scripts/microbench_shuffle.py).  Row `_SLAB_SIGN_ROW`
    carries the digit sign (sorted alongside the point).  valid:
    (s_ranks, 1, n_lanes) u32.  The kernel runs the s_ranks sequential
    unified mixed adds in VMEM."""
    f = curve.field
    n = f.n_limbs
    h = (n + 1) // 2
    rows_pad = _slab_rows(n)
    srow = _sign_row(n)
    assert n_lanes % tile == 0
    if kmul_mode is None:
        kmul_mode = _kmul_mode()
    kbase, kdiag = _parse_kmul_mode(kmul_mode)
    if kbase == "mxu":
        smat_np, fmat_np, _, _ = fk.mxu_tables(f)
        extra_np = (smat_np, fmat_np)
    elif kbase == "hybrid":
        _, fmat_np, _, _ = fk.mxu_tables(f)
        extra_np = (fmat_np,)
    else:
        extra_np = ()

    def kernel(*refs):
        (ft_ref, neg2_ref, slab_ref, valid_ref,
         x_ref, y_ref, z_ref, t_ref) = refs[:8]
        ox_ref, oy_ref, oz_ref, ot_ref = refs[-4:]
        ft, neg2 = ft_ref[...], neg2_ref[...]
        if kbase == "mxu":
            smat, fmat = refs[8][...], refs[9][...]
            km = lambda u, v: fk.kmul_mxu(f, u, v, smat, fmat, ft)
        elif kbase == "hybrid":
            fmat = refs[8][...]
            km = lambda u, v: fk.kmul_hybrid(f, u, v, fmat, ft, diag=kdiag)
        elif kdiag != "flat":
            km = lambda u, v: fk.kmul(f, u, v, ft, diag=kdiag)
        else:
            km = None

        def unpack(sl):
            return jnp.concatenate([sl & 0xFFFF, sl >> 16], axis=0)[:n]

        def step(r, acc):
            x, y, z, t = acc
            rows = slab_ref[r]
            valid = valid_ref[r] != 0
            sign = rows[srow:srow + 1] != 0
            yp = unpack(rows[0:h])
            ym = unpack(rows[h:2 * h])
            kt = unpack(rows[2 * h:3 * h])
            yp, ym = (jnp.where(sign, ym, yp), jnp.where(sign, yp, ym))
            one = (jax.lax.broadcasted_iota(jnp.uint32, (n, yp.shape[1]), 0)
                   == 0).astype(jnp.uint32)
            yp = jnp.where(valid, yp, one)
            ym = jnp.where(valid, ym, one)
            cterm = km(t, kt) if km else fk.kmul(f, t, kt, ft)
            cterm = jnp.where(sign, fk.kneg(f, cterm, ft, neg2), cterm)
            cterm = jnp.where(valid, cterm, jnp.zeros_like(cterm))
            return _te_madd_body(curve, x, y, z, t, yp, ym, cterm, ft, neg2,
                                 kmul_fn=km)

        x, y, z, t = jax.lax.fori_loop(
            0, s_ranks, step, (x_ref[...], y_ref[...], z_ref[...],
                               t_ref[...]))
        ox_ref[...] = x
        oy_ref[...] = y
        oz_ref[...] = z
        ot_ref[...] = t

    lane_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((s_ranks, rows_pad, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    vmask_spec = pl.BlockSpec((s_ranks, 1, tile), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((n, n + 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    neg2_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [ft_spec, neg2_spec, slab_spec, vmask_spec,
                lane_spec, lane_spec, lane_spec, lane_spec]
    in_specs += [pl.BlockSpec(m_.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for m_ in extra_np]
    call = pl.pallas_call(
        kernel,
        grid=(n_lanes // tile,),
        in_specs=in_specs,
        out_specs=(lane_spec, lane_spec, lane_spec, lane_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((n, n_lanes), jnp.uint32)
                        for _ in range(4)),
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )
    ft_np, neg2_np = fk.fold_table_t(f), fk.neg2_col(f)

    def fn(x, y, z, t, slab, valid):
        extra = tuple(jnp.asarray(m_) for m_ in extra_np)
        return call(jnp.asarray(ft_np), jnp.asarray(neg2_np),
                    slab, valid, x, y, z, t, *extra)

    return fn


def _slab_rows(n_limbs: int) -> int:
    """Sorted-table row width: 3h packed words + 1 sign word, padded to a
    sublane multiple."""
    h = (n_limbs + 1) // 2
    w = 3 * h + 1
    return w + (-w) % 8


def _sign_row(n_limbs: int) -> int:
    return 3 * ((n_limbs + 1) // 2)


# ranks per fetched strip: descriptor amortization vs over-fetch waste
# (half a strip per bucket on average)
SLAB_S = 8


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def accumulate_te_sorted(curve: CurveSpec, c: int, nbe: int, s_ranks: int,
                         interpret: bool, table, starts, counts, init=None):
    """Bucket-major SORTED-table accumulate: the physical row reorder
    (one `lax.sort` with full row payload — 29 ns/row, CHEAPER than a
    single random-row gather at 74 ns/row on v5e) happened upstream in
    `sort_rows_te`; this pass reads contiguous S-row strips per (bucket)
    lane, so the descriptor-latency-bound random gather of the unsorted
    path disappears.  The reference's partition/sort pipeline
    (`Partition1024.cu`/`SortCounts.cu`) plays the same role for warp
    convergence; here it buys DMA contiguity.

    table: (R_pad/S, S*rows_pad) u32 — sorted rows, strip-reshaped.
    starts/counts: (nbe+1,) positions of each bucket's run (bucket 0 =
    dropped zero digits).  Strips are fetched at S-ALIGNED positions
    (bucket runs start mid-strip; the head overlap is masked invalid), so
    no alignment padding of the table is needed.  Returns a TePoint of
    (1, nbe) lanes (single window group — the collapsed-MSM layout).

    `init` (optional (1, nbe) TePoint): starting bucket lanes instead of
    identity — lets the streamed-sorted MSM chain row-RUNS of one window
    through repeated calls with zero extra add passes."""
    from ..curve import te as te_mod
    nl = curve.field.n_limbs
    rows_pad = _slab_rows(nl)
    S = s_ranks
    n_strip = table.shape[0]
    lanes = nbe
    tile = 512 if lanes >= 512 else 128
    pad_lanes = (-lanes) % tile
    total = lanes + pad_lanes

    starts_b = starts[1:nbe + 1]
    counts_b = counts[1:nbe + 1]
    if pad_lanes:
        starts_b = jnp.pad(starts_b, (0, pad_lanes))
        counts_b = jnp.pad(counts_b, (0, pad_lanes))

    order = jnp.argsort(-counts_b)
    st_s = starts_b[order]
    ct_s = counts_b[order]
    base_s = st_s // S                       # first strip index per lane
    off_s = st_s % S                         # rank offset within it

    one = jnp.broadcast_to(
        jnp.asarray(limbs_from_int(1, nl))[:, None], (nl, total))

    prefixes = [total]
    while _next_prefix(prefixes[-1], tile) < prefixes[-1]:
        prefixes.append(_next_prefix(prefixes[-1], tile))
    # traced per-tier strip depths: lane needs ceil((off+count)/S) strips,
    # bounded by floor(count/S)+2 for any off in [0, S)  (+2, not +1: a run
    # with count%S + off > S crosses one extra strip boundary)
    depths = [ct_s[p] // S + 2 for p in prefixes[1:]] + [ct_s[0] // S + 2]
    running = depths[0]
    traced_d = [running]
    for d in depths[1:]:
        running = jnp.maximum(running, d)
        traced_d.append(running)

    zero = jnp.zeros((nl, total), jnp.uint32)
    if init is None:
        acc = (zero, one, one, zero)
    else:
        # chain from the caller's bucket lanes: place them in natural
        # order (identity in the pad lanes), then apply this call's
        # occupancy sort
        def base_plane(p_init, fill):
            pl = jnp.moveaxis(p_init, -1, 0).reshape(nl, lanes)
            if pad_lanes:
                pl = jnp.concatenate([pl, fill[:, lanes:]], axis=1)
            return pl[:, order]
        acc = tuple(base_plane(p, fill) for p, fill in
                    zip((init.x, init.y, init.z, init.t),
                        (zero, one, one, zero)))
    d_prev = 0
    for p_len, d in zip(prefixes, traced_d):
        addp = make_te_mixed_add_slab(curve, p_len, min(tile, p_len), S,
                                      interpret)
        base_p, off_p, ct_p = base_s[:p_len], off_s[:p_len], ct_s[:p_len]

        def tbody(k, a, base_p=base_p, off_p=off_p, ct_p=ct_p, addp=addp):
            blk = jnp.clip(base_p + k, 0, n_strip - 1)
            slab = jnp.take(table, blk, axis=0)          # (p, S*rows_pad)
            slab = slab.reshape(-1, S, rows_pad).transpose(1, 2, 0)
            rr = (k * S + jnp.arange(S)[:, None]) - off_p[None, :]
            valid = ((rr >= 0) & (rr < ct_p[None, :])).astype(jnp.uint32)
            return addp(a[0], a[1], a[2], a[3], slab, valid[:, None, :])

        sub = tuple(a[:, :p_len] for a in acc)
        sub = jax.lax.fori_loop(d_prev, d, tbody, sub)
        acc = tuple(acc[q].at[:, :p_len].set(sub[q]) for q in range(4))
        d_prev = d
    inv = jnp.argsort(order)
    out = tuple(a[:, inv] for a in acc)
    return te_mod.TePoint(*(o.T[:lanes].reshape(1, nbe, nl) for o in out))


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def merge_te_triangle_pallas(curve: CurveSpec, c: int, interpret: bool,
                             bucket_sums):
    """Pallas form of `te_path.merge_buckets_te_triangle` (chunked
    running-sum bucket reduction, ~6x less add work than the
    bit-decomposition at B=2^14).  The S sequential steps run two chained
    full-add kernels over all W*C chunk lanes; the tiny (W, C) tail
    (chunk-total weighting + final fold) stays in XLA form."""
    from ..curve import te as te_mod
    from . import te_path
    n_win, n_buckets = bucket_sums.x.shape[:2]
    split = te_path.triangle_split(n_win, n_buckets)
    assert split is not None, (n_win, n_buckets)
    c_lanes, s = split
    lanes = n_win * c_lanes
    tile = 512 if lanes % 512 == 0 else 128
    nl = curve.field.n_limbs
    add_fn = make_te_full_add(curve, lanes, tile, interpret)

    # (W, B, nl) -> (nl, W*C, S) limb-major with flat bucket b-1 = q*S + j
    planes = [jnp.moveaxis(a, -1, 0).reshape(nl, lanes, s)
              for a in bucket_sums]
    zero_skip = jnp.zeros((1, lanes), jnp.uint32)

    def body(k, acc):
        j = s - 1 - k
        a_s, a_u = acc
        q = [pl[:, :, j] for pl in planes]
        a_s = add_fn(a_s[0], a_s[1], a_s[2], a_s[3], *q, zero_skip)
        a_u = add_fn(a_u[0], a_u[1], a_u[2], a_u[3], *a_s, zero_skip)
        return (a_s, a_u)

    one = jnp.broadcast_to(
        jnp.asarray(limbs_from_int(1, nl))[:, None], (nl, lanes))
    ident = (jnp.zeros((nl, lanes), jnp.uint32), one, one,
             jnp.zeros((nl, lanes), jnp.uint32))
    acc_s, acc_u = jax.lax.fori_loop(0, s, body, (ident, ident))
    t_q = te_mod.TePoint(*(a.T.reshape(n_win, c_lanes, nl) for a in acc_s))
    u_q = te_mod.TePoint(*(a.T.reshape(n_win, c_lanes, nl) for a in acc_u))
    # Tail: U_tot = sum_q U_q and the per-bit sums S_j of
    # V = sum_q q*T_q are WIDE log-depth XLA trees (fine as XLA — the
    # per-op overhead amortizes over thousands of lanes); the two
    # SEQUENTIAL fold chains (sum_j 2^j S_j, then U_tot + 2^log2(S)*V)
    # reuse the lane-batched combine KERNEL, because as XLA they are
    # ~n_bits*(dbl+add) single-lane op chains paying per-op overhead
    # (the r2 form spent ~0.1 s here per MSM).
    u_tot = te_path.sum_axis(curve, u_q, 1)                    # (W,)
    n_bits = max(1, (c_lanes - 1).bit_length())
    q_ids = np.arange(c_lanes, dtype=np.uint32)
    mask = jnp.asarray(
        np.stack([((q_ids >> j) & 1) == 1 for j in range(n_bits)]))
    expanded = te_mod.select(
        mask[None, :, :],
        te_mod.TePoint(*(a[:, None] for a in t_q)),
        te_mod.identity(curve, (n_win, n_bits, c_lanes)))
    s_sums = te_path.sum_axis(curve, expanded, 2)              # (W, bits)
    # fold MSB-first: V_w = sum_j 2^j S_jw  ==  window-combine with c=1
    # over n_bits steps, the W windows riding the kernel's lane axis
    sbt = te_mod.TePoint(*(jnp.moveaxis(a, 1, 0) for a in s_sums))
    v = combine_te_batch_pallas(curve, 1, interpret, sbt)      # (W,)
    # result_w = U_tot_w + 2^log2(S) * V_w  ==  combine with c=log2(S)
    # over the 2-step stack [U_tot; V]
    pair = te_mod.TePoint(*(jnp.stack([ut, vv])
                            for ut, vv in zip(u_tot, v)))
    return combine_te_batch_pallas(curve, max(1, s.bit_length() - 1),
                                   interpret, pair)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def merge_buckets_te_pallas(curve: CurveSpec, c: int, interpret: bool,
                            bucket_sums):
    """TE variant of `merge_buckets_pallas` (bit-decomposed merge with the
    unified full-add kernel; final 2^j fold on the XLA side)."""
    from ..curve import te as te_mod
    n_win, n_buckets_eff = bucket_sums.x.shape[:2]
    n_bits = max(1, n_buckets_eff.bit_length())
    f = curve.field
    nl = f.n_limbs

    b_ids = np.arange(1, n_buckets_eff + 1, dtype=np.uint32)
    bitmask = np.stack([((b_ids >> j) & 1) == 0 for j in range(n_bits)])
    skip_np = np.broadcast_to(bitmask[None], (n_win, n_bits, n_buckets_eff))

    group = 128
    steps = max(1, n_buckets_eff // group)
    gcols = n_buckets_eff // steps
    lanes = n_win * n_bits * gcols
    tile = 512 if lanes % 512 == 0 else (128 if lanes % 128 == 0 else None)
    assert tile is not None, (n_win, n_bits, gcols)
    add_fn = make_te_full_add(curve, lanes, tile, interpret)

    planes = [jnp.moveaxis(a, -1, 0).reshape(nl, n_win, steps, gcols)
              for a in bucket_sums]
    skip = jnp.asarray(
        skip_np.reshape(n_win, n_bits, steps, gcols).astype(np.uint32))

    def body(tv, acc):
        qs = [jnp.broadcast_to(pl_[:, :, tv, None, :],
                               (nl, n_win, n_bits, gcols)).reshape(nl, lanes)
              for pl_ in planes]
        sk = skip[:, :, tv, :].reshape(1, lanes)
        return add_fn(acc[0], acc[1], acc[2], acc[3], *qs, sk)

    one = jnp.broadcast_to(
        jnp.asarray(limbs_from_int(1, nl))[:, None], (nl, lanes))
    init = (jnp.zeros((nl, lanes), jnp.uint32), one, one,
            jnp.zeros((nl, lanes), jnp.uint32))
    acc = jax.lax.fori_loop(0, steps, body, init)
    pt = te_mod.TePoint(*(a.T.reshape(n_win, n_bits, gcols, nl)
                          for a in acc))
    # tree over the group columns, then the 2^j fold (XLA TE ops)
    from . import te_path
    s = te_path.sum_axis(curve, pt, 2)           # (n_win, n_bits)

    def fold(k, a):
        a = te_mod.TePoint(*a)
        j = n_bits - 1 - k
        a = te_mod.dbl(curve, a)
        return tuple(te_mod.add(curve, a,
                                te_mod.TePoint(*(x[:, j] for x in s))))

    init2 = te_mod.TePoint(*(x[:, n_bits - 1] for x in s))
    out = jax.lax.fori_loop(1, n_bits, fold, tuple(init2))
    return te_mod.TePoint(*out)
