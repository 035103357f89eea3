"""Twisted-Edwards MSM path: accumulate / merge / combine over the a=-1
extended-coordinate group law (`curve/te.py`).

Mirrors the structure of the short-Weierstrass path in `pippenger.py`
(rectangle accumulate, bit-decomposed bucket merge, MSB-first window
combine) with the cheaper strongly-unified TE adds — the trade the FPGA
reference made for its pipelined adder
(`prize1b-msm-fpga/hardcaml/libs/twisted_edwards/mixed_add.ml`), applied
here to wide vector lanes.  XLA forms in this module are the CPU-testable
reference; the Pallas kernel forms live in `accum_kernel.py` and must stay
in lockstep.

Point-data layout for the hot gather: the three precomputed planes
(Y+X, Y-X, 2d·XY) are u16-PACKED (two base-2^15 limbs per u32) and
interleaved into ONE (n, 3*ceil(L/2)) row per point, so each bucket-rank
gather fetches a single contiguous ~160B row instead of three 104B rows —
measured 1.7x gather throughput on v5e (row size is what matters; the
transpose after the gather fuses for free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import te
from ..curve.spec import CurveSpec
from ..field import fp


def pack_u16(plane: jax.Array) -> jax.Array:
    """(.., L) u32 normal-form limbs (< 2^16) -> (.., ceil(L/2)) u32.

    SPLIT-HALF order (limb j in the low u16 of word j, limb j+h in the
    high u16): the kernel-side unpack is then a single sublane concat
    [v & 0xffff ; v >> 16] — no interleave shuffle."""
    l = plane.shape[-1]
    h = (l + 1) // 2
    if l < 2 * h:
        plane = jnp.pad(plane, [(0, 0)] * (plane.ndim - 1) + [(0, 2 * h - l)])
    lo = plane[..., :h]
    hi = plane[..., h:2 * h]
    return lo | (hi << 16)


def unpack_u16(packed: jax.Array, l: int) -> jax.Array:
    """Inverse of pack_u16 along the last axis."""
    lo = packed & 0xFFFF
    hi = packed >> 16
    return jnp.concatenate([lo, hi], axis=-1)[..., :l]


def precompute_packed(curve: CurveSpec, pre: te.TePre) -> jax.Array:
    """(n, L) planes -> (n, 3*ceil(L/2)) packed interleaved rows."""
    return jnp.concatenate([pack_u16(pre.yp), pack_u16(pre.ym),
                            pack_u16(pre.kt)], axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def prepare_points(curve: CurveSpec, x, y, inf):
    """SW affine planes -> (packed TE rows, any_exceptional flag), one fused
    graph (the eager form costs thousands of dispatches through the Fermat
    inversion — this is the reference's untimed `multi_scalar_mult_init`
    preprocessing stage, `prize1a-msm-gpu/yrrid/src/lib.rs:38-64`).

    Returned packed table is COLUMN-major (3h, n): the (n, 3h) row-major
    form tiles its 39-wide minor dim up to 128 lanes on device (T(8,128)
    layout) — a silent 3.3x HBM blowup (the "10.5 GB" 2^26 table was
    really 34 GB, discovered when its upload threw ResourceExhausted) and
    3.3x the gather traffic.  Column-major puts N on the lane axis
    (128-aligned) and 3h on sublanes (39 -> 40 pad only)."""
    tx, ty, bad = te.sw_to_te(curve, x, y, inf)
    packed = precompute_packed(curve, te.precompute(curve, tx, ty))
    return packed.T, jnp.any(bad)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def prepare_points_collapsed(curve: CurveSpec, x, y, inf, shift: int,
                             m: int):
    """Window-precompute table (the `PrecomputePoints.cu:11` trick of the
    GPU reference, rationale `MSM.cu:373-377`): packed TE rows for the m
    blocks  2^(shift*j) * P_i,  j = 0..m-1, laid out block-major
    ((m*n, 3h); row j*n+i).  With shift = c*G the MSM collapses its
    ceil(lambda/c) digit windows onto G bucket sets — all the doubling work
    moves into this untimed init stage.

    The doubling chains run in extended coordinates (one lax.scan of
    fori-looped dbls); all m*n points are normalized back to affine with a
    single batched inversion before packing.  On TPU the per-step chain is
    the `accum_kernel.make_te_dbl_chain` Pallas kernel — the XLA-op chain
    round-trips 8 limb planes through HBM per dbl and measured 133.6 s at
    2^18/m=16 (BENCH_r03); the kernel form keeps the chain state in VMEM."""
    import os
    f = curve.field
    tx, ty, bad = te.sw_to_te(curve, x, y, inf)
    base = te.TePoint(tx, ty, fp.ones(f, tx.shape[:-1]),
                      fp.mul(f, tx, ty))
    use_kernel = (jax.default_backend() not in ("cpu",)
                  and not os.environ.get("ZPRIZE_NO_PALLAS"))

    if use_kernel:
        from .accum_kernel import te_dbl_chain_pallas

        def step(cur, _):
            nxt = tuple(te_dbl_chain_pallas(curve, shift, False,
                                            te.TePoint(*cur)))
            return nxt, nxt
    else:
        def step(cur, _):
            nxt = jax.lax.fori_loop(
                0, shift, lambda _, a: tuple(te.dbl(curve, te.TePoint(*a))),
                tuple(cur))
            return nxt, nxt

    _, rest = jax.lax.scan(step, tuple(base), None, length=m - 1)
    all_pts = te.TePoint(*(jnp.concatenate([b[None], r], axis=0)
                           for b, r in zip(base, rest)))      # (m, n, L)
    # batch-normalize to affine: z -> 1 (identity lanes keep z=1)
    zsafe = fp.select(te.is_identity(curve, all_pts),
                      fp.ones(f, all_pts.z.shape[:-1]), all_pts.z)
    zinv = fp.batch_inv(f, zsafe.reshape(-1, zsafe.shape[-1])).reshape(
        zsafe.shape)
    ax = fp.mul(f, all_pts.x, zinv)
    ay = fp.mul(f, all_pts.y, zinv)
    packed = precompute_packed(curve, te.precompute(curve, ax, ay))
    # column-major (3h, m*n) — see prepare_points for the layout rationale
    return packed.reshape(-1, packed.shape[-1]).T, jnp.any(bad)


@functools.partial(jax.jit, static_argnums=(0, 1))
def finish_te(curve: CurveSpec, c: int, stacked: te.TePoint):
    """Window combine + TE->SW conversion of the single result, jitted as
    one graph (te_to_sw alone holds two Fermat inversions)."""
    combined = _combine_core_te(curve, c, stacked)
    return te.te_to_sw(curve, combined)


def unpack_pre(curve: CurveSpec, rows: jax.Array) -> te.TePre:
    l = curve.field.n_limbs
    h = (l + 1) // 2
    return te.TePre(unpack_u16(rows[..., 0:h], l),
                    unpack_u16(rows[..., h:2 * h], l),
                    unpack_u16(rows[..., 2 * h:3 * h], l))


@functools.partial(jax.jit, static_argnums=(0, 1, 8))
def accumulate_te(curve: CurveSpec, c: int, cap, packed, digits,
                  perm, starts, counts, n_buckets_eff=None, rank0=0):
    """Rectangle bucket accumulation in TE form (XLA reference form):
    TePoint bucket sums of shape (n_win, n_buckets_eff) lanes.

    Padding / exhausted ranks use the identity precomputed operand
    (1, 1, 0) — the strongly-unified add absorbs it with no select on the
    accumulator (vs the inf-mask select the SW path needs).  `cap` may be
    a TRACED scalar (the fori trip count lowers to a while loop): callers
    pass max(counts) computed in-graph, so one compile serves every
    occupancy profile."""
    n = packed.shape[1]                      # packed: column-major (3h, N)
    n_win = digits.shape[0]
    if n_buckets_eff is None:
        n_buckets_eff = 1 << (c - 1)
    f = curve.field
    starts_b = starts[:, 1:n_buckets_eff + 1]
    counts_b = counts[:, 1:n_buckets_eff + 1]

    def body(tv, acc):
        acc = te.TePoint(*acc)
        r = rank0 + tv
        pos = jnp.clip(starts_b + r, 0, n - 1)
        valid = r < counts_b
        idx = jnp.take_along_axis(perm, pos, axis=1)          # (W, B)
        rows = jnp.moveaxis(jnp.take(packed, idx, axis=1),
                            0, -1)                            # (W, B, 3h)
        pre = unpack_pre(curve, rows)
        sign = jnp.take_along_axis(digits, idx, axis=1) < 0
        pre = te.select_neg_pre(curve, sign, pre)
        ident = te.identity_pre(curve, valid.shape)
        pre = te.TePre(fp.select(~valid, ident.yp, pre.yp),
                       fp.select(~valid, ident.ym, pre.ym),
                       fp.select(~valid, ident.kt, pre.kt))
        return tuple(te.add_mixed(curve, acc, pre))

    init = te.identity(curve, (n_win, n_buckets_eff))
    out = jax.lax.fori_loop(0, cap, body, tuple(init))
    return te.TePoint(*out)


def _merge_core_te(curve: CurveSpec, bucket_sums: te.TePoint) -> te.TePoint:
    """sum_b b * B_b via bit decomposition (TE form of
    `pippenger._merge_buckets_core`)."""
    n_buckets_eff = bucket_sums.x.shape[0]
    n_bits = max(1, n_buckets_eff.bit_length())
    b_ids = np.arange(1, n_buckets_eff + 1, dtype=np.uint32)
    mask = jnp.asarray(
        np.stack([((b_ids >> j) & 1) == 1 for j in range(n_bits)]))
    expanded = te.select(
        mask,
        te.TePoint(*(a[None] for a in bucket_sums)),
        te.identity(curve, (n_bits, n_buckets_eff)))
    s = sum_axis(curve, expanded, 1)

    def body(k, acc):
        acc = te.TePoint(*acc)
        j = n_bits - 1 - k
        acc = te.dbl(curve, acc)
        return tuple(te.add(curve, acc, te.TePoint(*(a[j] for a in s))))

    init = te.TePoint(*(a[n_bits - 1] for a in s))
    out = jax.lax.fori_loop(1, n_bits, body, tuple(init))
    return te.TePoint(*out)


def sum_axis(curve: CurveSpec, pts: te.TePoint, axis: int) -> te.TePoint:
    """Tree-reduce a TE lane block along `axis` (log-depth full adds)."""
    pts = te.TePoint(*(jnp.moveaxis(a, axis, 0) for a in pts))
    n = pts.x.shape[0]
    while n > 1:
        half = (n + 1) // 2
        a = te.TePoint(*(x[:n - half] for x in pts))
        b = te.TePoint(*(x[half:] for x in pts))
        merged = te.add(curve, a, b)
        if half > n - half:  # odd: middle column rides along unmerged
            mid = te.TePoint(*(x[n - half:half] for x in pts))
            merged = te.TePoint(*(jnp.concatenate([m, s], axis=0)
                                  for m, s in zip(merged, mid)))
        pts = merged
        n = half
    return te.TePoint(*(x[0] for x in pts))


@functools.partial(jax.jit, static_argnums=(0, 1))
def merge_buckets_te(curve: CurveSpec, c: int, bucket_sums: te.TePoint
                     ) -> te.TePoint:
    return jax.vmap(functools.partial(_merge_core_te, curve))(bucket_sums)


def triangle_split(n_win: int, n_buckets: int,
                   target_lanes: int | None = None) -> tuple[int, int] | None:
    """Pick the (chunks C, chunk size S) split for the triangle merge:
    C lanes wide (pow2, >=128 so kernel tiles align), S = B/C sequential
    steps.  None if the bucket range is too small to be worth it.

    The default width balances the strip phase (2S sequential kernel
    rounds over W*C lanes) against the XLA-form bit-decomposition tail
    (~n_bits(C) * C tree adds): wider C shortens the strip but grows the
    tail super-linearly.  Tunable for sweeps via ZPRIZE_TRI_LANES."""
    if target_lanes is None:
        import os
        target_lanes = int(os.environ.get("ZPRIZE_TRI_LANES", "4096"))
    if n_buckets < 1024:
        return None
    c_lanes = 128
    while (c_lanes * 2 <= n_buckets // 8
           and n_win * c_lanes * 2 <= target_lanes):
        c_lanes *= 2
    s = n_buckets // c_lanes
    if s < 8:
        return None
    return c_lanes, s


def merge_buckets_te_triangle(curve: CurveSpec, c: int,
                              bucket_sums: te.TePoint) -> te.TePoint:
    """sum_b b*B_b via the chunked running-sum (triangle) identity — the
    lane-parallel form of the sequential bucket reduction every GPU entry
    runs per-warp (`ReduceBuckets.cu` / `HostReduce.cpp:31-60`):

      b = q*S + (j+1):   sum_b b*B_b = sum_q U_q  +  S * sum_q q*T_q
      U_q = sum_j (j+1) B_{qS+j+1}   (running suffix, 2 adds/step, S steps,
                                      all W*C chunk lanes in parallel)
      T_q = sum_j B_{qS+j+1}

    Work: 2B + C log C adds vs the bit-decomposition's B log B — ~6x fewer
    at B=2^14 — at the price of S sequential wide steps.  XLA reference
    form; the Pallas form lives in `accum_kernel.merge_te_triangle_pallas`.
    """
    n_win, n_buckets = bucket_sums.x.shape[:2]
    split = triangle_split(n_win, n_buckets)
    assert split is not None, (n_win, n_buckets)
    c_lanes, s = split
    # bucket b at flat index b-1 -> (chunk q, j) with b-1 = q*S + j
    planes = [a.reshape(n_win, c_lanes, s, -1) for a in bucket_sums]

    def body(k, acc):
        j = s - 1 - k
        acc_s, acc_u = (te.TePoint(*acc[0]), te.TePoint(*acc[1]))
        q = te.TePoint(*(pl[:, :, j] for pl in planes))
        acc_s = te.add(curve, acc_s, q)
        acc_u = te.add(curve, acc_u, acc_s)
        return (tuple(acc_s), tuple(acc_u))

    ident = te.identity(curve, (n_win, c_lanes))
    acc_s, acc_u = jax.lax.fori_loop(0, s, body, (tuple(ident),
                                                  tuple(ident)))
    t_q = te.TePoint(*acc_s)                       # (W, C) chunk totals
    u_tot = sum_axis(curve, te.TePoint(*acc_u), 1)  # (W,)
    # V = sum_q q*T_q (coefficients 0..C-1; chunk 0 contributes nothing)
    v = jax.vmap(functools.partial(_merge_core_te, curve))(
        te.TePoint(*(a[:, 1:] for a in t_q)))
    sv = jax.lax.fori_loop(
        0, s.bit_length() - 1,
        lambda _, a: tuple(te.dbl(curve, te.TePoint(*a))), tuple(v))
    return te.add(curve, u_tot, te.TePoint(*sv))


@functools.partial(jax.jit, static_argnums=(0, 1))
def combine_windows_te(curve: CurveSpec, c: int, window_sums: te.TePoint
                       ) -> te.TePoint:
    """sum_w 2^(c*w) W_w, MSB-first (TE doublings)."""
    return _combine_core_te(curve, c, window_sums)


def _combine_core_te(curve: CurveSpec, c: int, window_sums: te.TePoint
                     ) -> te.TePoint:
    n_win = window_sums.x.shape[0]

    def body(i, acc):
        acc = te.TePoint(*acc)
        w = n_win - 1 - i
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: tuple(te.dbl(curve, te.TePoint(*a))),
            tuple(acc))
        acc = te.TePoint(*acc)
        return tuple(te.add(curve, acc,
                            te.TePoint(*(a[w] for a in window_sums))))

    init = te.TePoint(*(a[n_win - 1] for a in window_sums))
    out = jax.lax.fori_loop(1, n_win, body, tuple(init))
    return te.TePoint(*out)
