"""Pippenger bucket-method MSM, reformulated for a vector machine.

Reference algorithm surface (what we match): signed-digit windowed Pippenger
as in `prize1a-msm-gpu/yrrid/yrrid-msm/MSM.cu:387-503` (digit decomposition
`ProcessSignedDigits.cu`, bucket accumulation `ComputeBucketSums.cu`, window
reduction `ReduceBuckets.cu` + `HostReduce.cpp`).

TPU-first reformulation (how we do it — NOT a port):

* The GPU entries sort points so each warp's adds hit one bucket
  (`Partition1024.cu`/`SortCounts.cu`); the FPGA entry serializes points
  through one pipelined adder with hazard stalls.  Both schedulers are
  meaningless on a TPU.  Here bucket accumulation is a **dense rectangle
  reduction**: for each window, point indices are grouped by bucket (stable
  argsort + boundary search), packed into a static (n_buckets, cap)
  rectangle padded with identity lanes, and tree-reduced along the cap axis
  with wide branch-free complete adds.  No scatter, no conflicts, no
  data-dependent shapes inside jit.
* Bucket-weighted reduction sum_b b*B_b avoids the sequential "triangle"
  running sum (`HostReduce.cpp:31-60`): decompose b over its bits and
  tree-sum the masked buckets per bit — log-depth, fully on device.
* Multi-pass capping keeps the rectangle bounded for adversarial digit
  distributions: pass k covers per-bucket ranks [k*cap, (k+1)*cap); the
  number of passes is decided by the host from the max bucket occupancy
  (one scalar device->host sync per MSM, the analog of the reference's
  host-side launch planning in `MSM.cu:419-477`).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import sw
from ..curve.spec import CurveSpec
from ..field import fp
from ..field.spec import BASE_BITS


def _pallas_enabled() -> bool:
    """Use the Pallas kernels on real TPU backends (env override for
    debugging); the XLA path remains the CPU/test reference."""
    import os
    if os.environ.get("ZPRIZE_NO_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


def default_window_bits(n: int) -> int:
    """Heuristic window size balancing accumulation (n*w adds) against the
    per-window merge ((c-1) * 2^(c-1) adds)."""
    if n <= 0:
        return 4
    # Empirically (v5e, pallas path): growing past 13 bits inflates the
    # rectangle padding (bucket count rises faster than occupancy) and the
    # merge work; 13 is the knee for 2^16..2^20.
    return int(min(13, max(4, math.log2(max(n, 16)) - 3)))


def num_windows(curve: CurveSpec, c: int) -> int:
    # +1 window absorbs the final signed-digit carry.
    return (curve.scalar.p.bit_length() + c - 1) // c + 1


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def signed_digits(curve: CurveSpec, c: int, n_win: int, scalars: jax.Array):
    """Scalar limb planes -> (n_win, n) int32 signed digits in
    [-2^(c-1), 2^(c-1)).  Mirrors the MSB-negate signed-window trick of
    `ProcessSignedDigits.cu:71` / `MSM.cu:424-429`, vectorized."""
    digits, _ = _signed_digits_range(curve, c, 0, n_win, scalars, None)
    return digits


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def signed_digits_range(curve: CurveSpec, c: int, w0: int, w1: int,
                        scalars: jax.Array, carry_in: jax.Array):
    """Windows [w0, w1) only, resuming from `carry_in` ((n,) int32 — the
    carry left by window w0-1).  Returns (digits, carry_out); lets the
    2^26-scale orchestration stream window chunks without materializing
    the full (n_win, n) digit plane (the signed-digit carry chain is
    sequential in w, so the checkpoint is one (n,) vector)."""
    return _signed_digits_range(curve, c, w0, w1, scalars, carry_in)


def _signed_digits_range(curve: CurveSpec, c: int, w0: int, w1: int,
                         scalars, carry_in):
    if scalars.dtype == jnp.uint16:
        # compact canonical planes (fp.compact_scalars): 2 bytes/limb,
        # canonical by contract — halves the scalar HBM at 2^26 scale
        s = scalars
    else:
        s = fp.to_canonical(curve.scalar, scalars)  # limbs < 2**15
    pad = [(0, 0)] * (s.ndim - 1) + [(0, 3)]
    s = jnp.pad(s, pad)
    digits = []
    carry = (jnp.zeros(s.shape[:-1], jnp.int32) if carry_in is None
             else carry_in)
    half = 1 << (c - 1)
    # a window spans up to 3 base-2^15 limbs: bits [sh, sh+c) of the
    # 45-bit limb triple, realized in u32 (sh <= 14, so c <= 18 keeps
    # sh + c <= 32 and the third limb's contribution below bit 32)
    assert c + BASE_BITS - 1 <= 32, f"window c={c} needs >3 limbs"
    for w in range(w0, w1):
        start = w * c
        i0, sh = divmod(start, BASE_BITS)
        word = (s[..., i0].astype(jnp.uint32)
                | (s[..., i0 + 1].astype(jnp.uint32) << BASE_BITS))
        word = (word >> sh) | (s[..., i0 + 2].astype(jnp.uint32)
                               << (2 * BASE_BITS - sh))
        raw = (word & ((1 << c) - 1)).astype(jnp.int32) + carry
        over = raw >= half
        digits.append(jnp.where(over, raw - (1 << c), raw))
        carry = over.astype(jnp.int32)
    return jnp.stack(digits), carry  # (w1-w0, n), (n,)


def _bucket_counts_core(c: int, digits_w: jax.Array):
    """Per-window stable grouping: returns (perm, starts, counts, max_count)
    for buckets 1..2^(c-1) (bucket 0 contributes nothing).

    One `lax.sort` carries the index payload along with the keys — the
    argsort-then-gather formulation pays a second full-array gather for
    `b[perm]` (measured 5x the sort itself on v5e).  `ZPRIZE_SORT=u64`
    packs (bucket << 32 | index) into one u64 key instead (A/B knob)."""
    import os
    b = jnp.abs(digits_w)
    n_buckets = (1 << (c - 1)) + 1
    if os.environ.get("ZPRIZE_SORT") == "u64":
        iota64 = jax.lax.iota(jnp.uint64, b.shape[0])
        key = (b.astype(jnp.uint64) << 32) | iota64
        skey = jax.lax.sort(key)
        perm = skey.astype(jnp.uint32).astype(jnp.int32)
        sorted_b = (skey >> 32).astype(jnp.int32)
    else:
        iota = jax.lax.iota(jnp.int32, b.shape[0])
        sorted_b, perm = jax.lax.sort((b, iota), num_keys=1, is_stable=True)
    starts = jnp.searchsorted(sorted_b, jnp.arange(n_buckets, dtype=sorted_b.dtype))
    ends = jnp.searchsorted(sorted_b, jnp.arange(n_buckets, dtype=sorted_b.dtype),
                            side="right")
    counts = ends - starts
    return perm, starts, counts, jnp.max(counts[1:])


@functools.partial(jax.jit, static_argnums=0)
def bucket_counts_all(c: int, digits: jax.Array):
    """Grouping for every window at once: digits (n_win, n)."""
    return jax.vmap(functools.partial(_bucket_counts_core, c))(digits)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 9))
def accumulate_pass_all(curve: CurveSpec, c: int, cap: int, px, py,
                        digits, perm, starts, counts, n_buckets_eff=None,
                        rank0=0):
    """Rectangle pass for a stack of windows: bucket sums for per-bucket
    ranks [rank0, rank0+cap) as projective points, shape
    (n_win, n_buckets_eff) lanes.

    Structured as a fori scan along the rank axis: each step gathers one
    point per (window, bucket) lane and performs a single wide *mixed*
    complete add.  One traced add body keeps the graph small; padding ranks
    arrive as infinity lanes which the complete formulas absorb.  This is
    the TPU replacement for the GPU's sort+warp-converged bucket adds
    (`ComputeBucketSums.cu:136`).  `n_buckets_eff` restricts the bucket
    range (top carry windows have statically tiny digit ranges — giving
    them a narrow rectangle instead of the full 2^(c-1) is what keeps the
    skewed-occupancy windows cheap)."""
    n = px.shape[0]
    if n_buckets_eff is None:
        n_buckets_eff = 1 << (c - 1)  # buckets 1..2^(c-1)
    starts_b = starts[:, 1:n_buckets_eff + 1]                # (W, B)
    counts_b = counts[:, 1:n_buckets_eff + 1]

    def body(t, acc):
        acc = sw.Point(*acc)
        r = rank0 + t
        pos = jnp.clip(starts_b + r, 0, n - 1)               # (W, B)
        valid = r < counts_b
        idx = jnp.take_along_axis(perm, pos, axis=1)         # (W, B)
        gx = jnp.take(px, idx, axis=0)                       # (W, B, L)
        gy = jnp.take(py, idx, axis=0)
        sign = jnp.take_along_axis(digits, idx, axis=1) < 0
        gy = fp.select(sign, fp.neg(curve.field, gy), gy)
        aff = sw.Affine(gx, gy, ~valid)
        return tuple(sw.add_mixed(curve, acc, aff))

    init = sw.identity(curve, (digits.shape[0], n_buckets_eff))
    out = jax.lax.fori_loop(0, cap, body, tuple(init))
    return sw.Point(*out)


def _merge_buckets_core(curve: CurveSpec, c: int, bucket_sums: sw.Point
                        ) -> sw.Point:
    """sum_b b * B_b via bit-decomposition of b: ONE batched tree reduction
    over a (bits, n_buckets) masked expansion computes all per-bit sums S_j
    simultaneously (log-depth, replaces the sequential triangle reduction of
    `HostReduce.cpp:31-60`), then a small fori loop folds sum_j 2^j S_j."""
    n_buckets_eff = bucket_sums.x.shape[0]
    # buckets run 1..n_buckets_eff inclusive
    n_bits = max(1, n_buckets_eff.bit_length())
    b_ids = np.arange(1, n_buckets_eff + 1, dtype=np.uint32)
    mask = jnp.asarray(
        np.stack([((b_ids >> j) & 1) == 1 for j in range(n_bits)]))  # (bits, B)
    expanded = sw.select(
        mask,
        sw.Point(bucket_sums.x[None], bucket_sums.y[None], bucket_sums.z[None]),
        sw.identity(curve, (n_bits, n_buckets_eff)))
    s = sw.sum_points_scan(curve, expanded, axis=1)       # (bits,) points

    def body(k, acc):
        acc = sw.Point(*acc)
        j = n_bits - 1 - k
        acc = sw.dbl(curve, acc)
        return tuple(sw.add(curve, acc,
                            sw.Point(s.x[j], s.y[j], s.z[j])))

    init = sw.Point(s.x[n_bits - 1], s.y[n_bits - 1], s.z[n_bits - 1])
    out = jax.lax.fori_loop(1, n_bits, body, tuple(init))
    return sw.Point(*out)


@functools.partial(jax.jit, static_argnums=(0, 1))
def merge_buckets_all(curve: CurveSpec, c: int, bucket_sums: sw.Point
                      ) -> sw.Point:
    """Window merge for all windows at once: bucket_sums (n_win, B) lanes."""
    return jax.vmap(functools.partial(_merge_buckets_core, curve, c))(
        bucket_sums)


@functools.partial(jax.jit, static_argnums=(0, 1))
def combine_windows(curve: CurveSpec, c: int, window_sums: sw.Point) -> sw.Point:
    """result = sum_w 2^(c*w) W_w, MSB-first with c doublings per window
    (loop-structured: the graph holds one dbl and one add body)."""
    n_win = window_sums.x.shape[0]

    def body(i, acc):
        acc = sw.Point(*acc)
        w = n_win - 1 - i
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: tuple(sw.dbl(curve, sw.Point(*a))), tuple(acc))
        acc = sw.Point(*acc)
        return tuple(sw.add(curve, acc,
                            sw.Point(window_sums.x[w], window_sums.y[w],
                                     window_sums.z[w])))

    init = sw.Point(window_sums.x[n_win - 1], window_sums.y[n_win - 1],
                    window_sums.z[n_win - 1])
    out = jax.lax.fori_loop(1, n_win, body, tuple(init))
    return sw.Point(*out)


import typing


class PreparedTe(typing.NamedTuple):
    """Init-stage point preprocessing for the TE path.  `packed` holds
    m blocks of u16-packed precomputed rows (block j = 2^(c*g*j) * P),
    COLUMN-major — point j*n+i is column j*n+i (see
    `te_path.prepare_points` for why row-major (N, 39) is a 3.3x device
    HBM/gather blowup).  m == 1 means no window collapse (c/g unused
    beyond bookkeeping)."""
    packed: jax.Array      # (3h, m*n) column-major
    c: int
    g: int                 # bucket sets after collapse
    m: int                 # stored multiples per point
    n: int                 # original point count


def plan_collapse(curve: CurveSpec, n: int, c: int | None = None,
                  budget_bytes: int | None = None) -> tuple[int, int, int]:
    """Choose (c, G, m) for the window-precompute collapse: minimize
    accumulate adds (W*n mixed) + merge adds (G * bits * 2^(c-1) full)
    subject to the precompute-table memory budget (the same trade
    `MSM.cu:373-377` makes; their 2^26 config stores 6 multiples)."""
    import os
    if budget_bytes is None:
        budget_bytes = int(float(os.environ.get("ZPRIZE_PRE_GB", "4"))
                           * (1 << 30))
    h = (curve.field.n_limbs + 1) // 2
    row_bytes = 3 * h * 4
    m_cap = max(1, budget_bytes // max(1, n * row_bytes))
    best = None
    # hard ceiling: the digit extraction reads a window from at most THREE
    # base-2^15 limbs (c + BASE_BITS - 1 <= 32, `_signed_digits_range`);
    # every c in this range has a small-MSM differential test
    # (tests/test_msm.py) — r2 shipped an invalid bench from an untested
    # c=17, and the r4 2^20 run crashed on an unsupported planner c=20.
    c_max = 32 - BASE_BITS + 1          # 18 at BASE_BITS=15
    c_range = [c] if c else range(8, c_max + 1)
    assert all(8 <= cc <= c_max for cc in c_range), c_range
    for cc in c_range:
        w = num_windows(curve, cc)
        m = min(m_cap, w)
        g = -(-w // m)
        m = -(-w // g)  # shrink m back to what g actually needs
        nbe = 1 << (cc - 1)
        from . import te_path
        if te_path.triangle_split(g, nbe) is not None:
            # triangle merge: 2 full adds per bucket (9M vs the mixed 7M)
            merge = g * 2.6 * nbe
        else:
            bits = max(1, nbe.bit_length())
            merge = g * bits * nbe * 8 / 7.0
        cost = w * n + merge
        if best is None or cost < best[0]:
            best = (cost, cc, g, m)
    return best[1], best[2], best[3]


@functools.partial(jax.jit, donate_argnums=0)
def _write_block(table, block, lo):
    """In-place (donated) block write into the (3h, m, n) precompute
    table (column-major convention)."""
    return jax.lax.dynamic_update_slice(
        table, block, (jnp.int32(0), jnp.int32(0), lo))


@functools.partial(jax.jit, donate_argnums=0)
def _upload_block(table, block, lo):
    """Donated column-chunk write into the (3h, n) device table."""
    return jax.lax.dynamic_update_slice(table, block, (jnp.int32(0), lo))


def _upload_table(packed_np: np.ndarray) -> jax.Array:
    """Host (3h, n) table -> device, in column chunks.  A single bulk
    device_put of the 10.7 GB table OOMs: the transfer materializes a
    linear staging buffer AND the tiled layout copy (2x peak).  Chunked
    donated writes keep the transient at one chunk (~0.65 GB x2), with a
    per-chunk drain so the chain cannot pile up."""
    n = packed_np.shape[1]
    chunk = 1 << 22
    table = jnp.zeros(packed_np.shape, jnp.uint32)
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        blk = jnp.asarray(np.ascontiguousarray(packed_np[:, lo:hi]))
        table = _upload_block(table, blk, jnp.int32(lo))
        jax.device_get(table[0, lo])
    return table


def prepare_points(curve: CurveSpec, points: sw.Affine,
                   c: int | None = None,
                   collapse: bool | None = None) -> "PreparedTe | None":
    """Preprocess a fixed point set for repeated MSMs (the untimed
    `multi_scalar_mult_init` stage of the reference benchmark,
    `prize1a-msm-gpu/yrrid/src/lib.rs:38-64`): TE conversion + u16 row
    packing, plus (default) the window-precompute multiple table.  Returns
    None when the curve has no TE form.  The handle is passed to
    `msm(prepared=...)`."""
    import os
    if not _te_enabled(curve):
        return None
    from . import te_path
    n = points.x.shape[0]
    if collapse is None:
        collapse = os.environ.get("ZPRIZE_PRECOMPUTE", "1") != "0"
    if collapse:
        c, g, m = plan_collapse(curve, n, c)
    else:
        c = c or default_window_bits(n)
        g, m = num_windows(curve, c), 1
    # Chunked preparation: one fused convert graph holds ~14 live (B, L)
    # temporaries (batch_inv tree + TE transform) — at 2^24 points that is
    # ~28 GB of HLO temps, so blocks cap the working set (and every block
    # reuses one compiled shape).
    # default block 2^18: the m~18-multiple doubling-chain scan holds ~7 GB
    # of HLO temps per 2^18 block (measured: 28.6 GB at one 2^20 block)
    block = min(n, 1 << int(os.environ.get("ZPRIZE_PREP_BLOCK_LOG", "18")))
    # m == 1 at scale: assemble the table in HOST RAM and upload once.
    # The device-side incremental build (donated block writes) OOM'd at
    # 2^26 even with per-block syncs — through the remote axon queue the
    # bad_b transfer does not reliably drain the donated write chain, so
    # block outputs pile up next to the 10.5 GB table.  A per-block
    # device_get of the packed rows forces real completion, keeps only one
    # block's buffers live on device, and costs one bulk ~10.5 GB upload
    # at the end (untimed init).
    host_mode = (m == 1 and
                 n >= (1 << int(os.environ.get("ZPRIZE_PREP_HOST_LOG",
                                               "22"))))
    # Opt-in host-table cache (the keygen-once pattern of `pcs/storage`):
    # the 2^26 host-mode assembly costs ~19 min of untimed init — with
    # ZPRIZE_PREP_CACHE=<dir> and ZPRIZE_PREP_CACHE_KEY=<point-set tag>
    # a repeated bench run on the same point set skips straight to the
    # chunked upload.  The KEY must identify the point set (the bench
    # uses its seed); the cache is the caller's responsibility to scope.
    cache_dir = os.environ.get("ZPRIZE_PREP_CACHE")
    cache_key = os.environ.get("ZPRIZE_PREP_CACHE_KEY")
    cache_path = None
    if host_mode and cache_dir and cache_key:
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(
            cache_dir, f"prep_{curve.name}_{cache_key}_n{n}_c{c}_m{m}.npy")
        if os.path.exists(cache_path):
            packed_np = np.load(cache_path, mmap_mode="r")
            assert packed_np.shape[1] == n
            return PreparedTe(_upload_table(packed_np), c, g, m, n)
    packed = None
    packed_np = None
    bads = []
    any_bad = False
    for lo in range(0, n, block):
        hi = min(n, lo + block)
        px, py, pinf = (points.x[lo:hi], points.y[lo:hi], points.inf[lo:hi])
        if m > 1:
            # column-major (3h, m*blk) -> (3h, m, blk)
            pk_b, bad_b = te_path.prepare_points_collapsed(
                curve, px, py, pinf, c * g, m)
            pk_b = pk_b.reshape(pk_b.shape[0], m, hi - lo)
        else:
            pk_b, bad_b = te_path.prepare_points(curve, px, py, pinf)
            pk_b = pk_b[:, None, :]
        if host_mode:
            arr = np.asarray(jax.device_get(pk_b[:, 0]))
            if packed_np is None:
                packed_np = np.empty((arr.shape[0], n), arr.dtype)
            packed_np[:, lo:hi] = arr
            any_bad |= bool(np.asarray(jax.device_get(bad_b)))
            continue
        if hi - lo < n:
            # force completion before enqueueing the next chunk: the async
            # dispatch queue would otherwise hold every chunk's HLO temps
            # live at once (OOM at 2^24); device_get, not block_until_ready
            # (the latter does not await remote execution on axon)
            jax.device_get(bad_b)
        if packed is None:
            # donated in-place block writes: concatenating the block list
            # would hold 2x the table at peak
            packed = jnp.zeros((pk_b.shape[0], m, n), pk_b.dtype)
        packed = _write_block(packed, pk_b, jnp.int32(lo))
        bads.append(bad_b)
    if host_mode:
        if any_bad:
            raise ValueError(
                "input contains exceptional points with no twisted-Edwards "
                "image; rerun with ZPRIZE_TE=0 for the short-Weierstrass "
                "path")
        if cache_path is not None:
            np.save(cache_path, packed_np)
        return PreparedTe(_upload_table(packed_np), c, g, m, n)
    packed = packed.reshape(packed.shape[0], m * n)
    bad = jnp.any(jnp.stack(bads))
    if bool(np.asarray(jax.device_get(bad))):
        raise ValueError(
            "input contains exceptional points with no twisted-Edwards "
            "image; rerun with ZPRIZE_TE=0 for the short-Weierstrass path")
    return PreparedTe(packed, c, g, m, n)


def msm(curve: CurveSpec, points: sw.Affine, scalars: jax.Array,
        c: int | None = None, cap: int | None = None,
        prepared=None) -> sw.Point:
    """Multi-scalar multiplication sum_i scalars[i] * points[i].

    API parity with `multi_scalar_mult` (`prize1a-msm-gpu/yrrid/src/lib.rs:66-90`),
    single batch.  `points` is an Affine batch (inf lanes allowed); `scalars`
    is a scalar-field limb plane (n, n_limbs).

    Host-level orchestration only decides the window size and the number of
    rectangle passes (from one max-occupancy scalar); all heavy stages are
    jitted with static shapes.
    """
    te_on = _te_enabled(curve)
    if te_on and prepared is None:
        prepared = prepare_points(curve, points, c)
    # the TE path never touches points.x/.y (only .inf): callers at 2^24+
    # may pass truncated affine planes to free ~GBs of HBM
    n = prepared.n if prepared is not None else points.x.shape[0]
    if prepared is not None:
        c = prepared.c
    elif c is None:
        c = default_window_bits(n)
    n_win = num_windows(curve, c)
    use_pallas = _pallas_enabled()
    full_nbe = 1 << (c - 1)

    if te_on:
        return _msm_te(curve, prepared, points.inf, scalars, c, use_pallas)

    if cap is None:
        mean = max(1, n // (1 << (c - 1)))
        cap = 1 << int(math.ceil(math.log2(mean * 2 + 8)))
    digits = signed_digits(curve, c, n_win, scalars)
    # input identity points contribute nothing: zero their digits
    digits = jnp.where(points.inf[None, :], 0, digits)
    # Group windows by their static digit range: top carry windows cover
    # only a few scalar bits, so their buckets concentrate — give them a
    # narrow rectangle (their own effective window width) instead of the
    # full 2^(c-1) lanes at crushing depth.
    groups = _window_groups(curve, c, n_win, full_nbe)
    perm, starts, counts, max_counts = bucket_counts_all(c, digits)
    max_np = np.asarray(jax.device_get(max_counts))
    if use_pallas:
        import os
        from .accum_kernel import (accumulate_pass_pallas,
                                   accumulate_rect_pallas,
                                   merge_buckets_pallas, tier_schedule)
        # A/B on v5e: rect materialization wins at 2^16 (450 vs 508 ms) but
        # loses at 2^18 (1006 vs 870 ms) — the XLA gather+transpose glue
        # scales worse than the per-rank path.  Default: on below 2^17.
        rect_env = os.environ.get("ZPRIZE_RECT")
        if rect_env is not None:
            use_rect = rect_env != "0"
        else:
            use_rect = n < (1 << 17)

        def acc_fn(curve, c, cap, px, py, d, p, s, ct, n_buckets_eff, rank0,
                   tiers=None):
            if tiers is not None and use_rect:
                return accumulate_rect_pallas(curve, c, tiers, px, py,
                                              d, p, s, ct, n_buckets_eff)
            return accumulate_pass_pallas(curve, c, cap, px, py, d, p, s, ct,
                                          n_buckets_eff=n_buckets_eff,
                                          tier_depths=tiers, rank0=rank0)
    else:
        def acc_fn(curve, c, cap, px, py, d, p, s, ct, n_buckets_eff, rank0,
                   tiers=None):
            return accumulate_pass_all(curve, c, cap, px, py, d, p, s, ct,
                                       n_buckets_eff=n_buckets_eff,
                                       rank0=rank0)

    window_sums = [None] * n_win
    for nbe, ws in sorted(groups.items(), reverse=True):
        widx = np.asarray(ws)
        group_max = int(max_np[widx].max()) if len(widx) else 0
        gcap = min(cap if nbe == full_nbe else 1 << 30,
                   max(8, -(-group_max // 16) * 16))
        jw = jnp.asarray(widx)
        d_g, p_g = digits[jw], perm[jw]
        s_g, c_g = starts[jw], counts[jw]
        tiers = None
        if use_pallas and len(ws) * nbe >= 4096:
            # occupancy-sorted schedule (see accum_kernel.tier_schedule)
            lane_counts = np.asarray(
                jax.device_get(c_g[:, 1:nbe + 1])).reshape(-1)
            pad = (-lane_counts.size) % 512
            desc = np.sort(np.concatenate(
                [lane_counts, np.zeros(pad, lane_counts.dtype)]))[::-1]
            tiers = tier_schedule(desc)
        sums = acc_fn(curve, c, gcap, points.x, points.y,
                      d_g, p_g, s_g, c_g, nbe, 0, tiers)
        # fallback passes for occupancy beyond the cap (adversarial inputs;
        # the tiered schedule always covers the max occupancy itself)
        covered = (1 << 62) if tiers is not None else gcap
        while group_max > covered:
            cap2 = max(8, 1 << (group_max - covered - 1).bit_length())
            extra = acc_fn(curve, c, cap2, points.x, points.y,
                           d_g, p_g, s_g, c_g, nbe, covered)
            sums = sw.add(curve, sums, extra)
            covered += cap2
        lane_count = len(ws) * nbe * max(1, nbe.bit_length())
        if use_pallas and lane_count >= 4096 and (len(ws) * max(1, nbe.bit_length()) * min(nbe, 128)) % 128 == 0:
            from .accum_kernel import merge_buckets_pallas
            merged = merge_buckets_pallas(curve, c, False, sums)
        else:
            merged = merge_buckets_all(curve, c, sums)
        for k, w in enumerate(ws):
            window_sums[w] = sw.Point(merged.x[k], merged.y[k], merged.z[k])

    stacked = sw.Point(jnp.stack([p.x for p in window_sums]),
                       jnp.stack([p.y for p in window_sums]),
                       jnp.stack([p.z for p in window_sums]))
    return combine_windows(curve, c, stacked)


def _te_enabled(curve: CurveSpec) -> bool:
    """Use the twisted-Edwards accumulate path (7M unified adds) when the
    curve has a TE form; `ZPRIZE_TE=0` forces the short-Weierstrass path."""
    import os
    if os.environ.get("ZPRIZE_TE", "1") == "0":
        return False
    from ..curve import te
    try:
        te.te_params(curve)
        return True
    except ValueError:
        return False


def _window_groups(curve: CurveSpec, c: int, n_win: int,
                   full_nbe: int) -> dict[int, list[int]]:
    scalar_bits = curve.scalar.p.bit_length()
    groups: dict[int, list[int]] = {}
    for w in range(n_win):
        raw_bits = min(c, max(0, scalar_bits - w * c))
        dmax = min(full_nbe, (1 << raw_bits) + 1)  # |digit| bound
        nbe = min(full_nbe, max(4, 1 << (dmax - 1).bit_length()))
        groups.setdefault(nbe, []).append(w)
    return groups


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _digits_grouped_te(curve: CurveSpec, c: int, cspec, gspec, want_desc,
                       scalars, inf):
    """Dispatch 1 of the TE MSM: digits + bucket grouping.  `want_desc`
    additionally returns the descending lane-occupancy vectors for the
    HOST tier scheduler — only the XLA (non-Pallas) path needs them; the
    Pallas accumulate derives traced depths in-graph.
    `cspec`: None or (G, m, n) window-collapse split; `gspec`: static
    ((nbe, ws-tuple), ...) window grouping."""
    n_win = num_windows(curve, c)
    digits = signed_digits(curve, c, n_win, scalars)
    if cspec is not None:
        g, m, n = cspec
        digits = jnp.pad(digits, ((0, m * g - n_win), (0, 0)))
        digits = digits.reshape(m, g, n).transpose(1, 0, 2).reshape(g, m * n)
        digits = jnp.where(jnp.tile(inf, m)[None, :], 0, digits)
    else:
        digits = jnp.where(inf[None, :], 0, digits)
    perm, starts, counts, _ = bucket_counts_all(c, digits)
    descs = []
    if want_desc:
        for nbe, ws in gspec:
            lc = counts[jnp.asarray(ws), 1:nbe + 1].reshape(-1)
            pad = (-lc.shape[0]) % 512
            descs.append(-jnp.sort(-jnp.pad(lc, (0, pad))))
    return digits, perm, starts, counts, tuple(descs)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _msm_te_device(curve: CurveSpec, c: int, gspec, tiers_spec,
                   use_pallas: bool, packed, digits, perm, starts, counts):
    """Dispatch 2 of the TE MSM: tiered accumulate + bucket merge + window
    combine, one fused graph (the per-stage dispatch floor through the
    remote tunnel is ~30 ms — a 10-dispatch MSM pays it ten times).
    Returns the combined result as a TE extended point; the caller converts
    on the host."""
    from ..curve import te
    from . import te_path
    n_win = digits.shape[0]
    window_sums = [None] * n_win
    for (nbe, ws), tiers in zip(gspec, tiers_spec):
        if ws == tuple(range(digits.shape[0])):
            d_g, p_g, s_g, c_g = digits, perm, starts, counts
        else:
            jw = jnp.asarray(ws)
            d_g, p_g = digits[jw], perm[jw]
            s_g, c_g = starts[jw], counts[jw]
        if use_pallas:
            from .accum_kernel import (accumulate_te_pallas,
                                       merge_buckets_te_pallas,
                                       merge_te_triangle_pallas)
            sums = accumulate_te_pallas(curve, c, 1, packed, d_g, p_g,
                                        s_g, c_g, nbe, tier_depths=tiers)
            n_bits = max(1, nbe.bit_length())
            lane_count = len(ws) * n_bits * min(nbe, 128)
            if te_path.triangle_split(len(ws), nbe) is not None:
                merged = merge_te_triangle_pallas(curve, c, False, sums)
            elif len(ws) * nbe * n_bits >= 4096 and lane_count % 128 == 0:
                merged = merge_buckets_te_pallas(curve, c, False, sums)
            else:
                merged = te_path.merge_buckets_te(curve, c, sums)
        else:
            depth = jnp.maximum(1, jnp.max(c_g[:, 1:nbe + 1]))
            sums = te_path.accumulate_te(curve, c, depth, packed, d_g, p_g,
                                         s_g, c_g, nbe)
            if te_path.triangle_split(len(ws), nbe) is not None:
                merged = te_path.merge_buckets_te_triangle(curve, c, sums)
            else:
                merged = te_path.merge_buckets_te(curve, c, sums)
        for k, w in enumerate(ws):
            window_sums[w] = te.TePoint(*(a[k] for a in merged))

    stacked = te.TePoint(*(jnp.stack([getattr(p, f)
                                      for p in window_sums])
                           for f in ("x", "y", "z", "t")))
    # window combine on device; the final TE->SW conversion happens on the
    # HOST (te.te_to_sw_host): its two Fermat ladders are pure latency for
    # a single lane (~100 ms measured through the remote dispatch path).
    # Canonicalize IN-GRAPH: an eager to_canonical on the host would pay the
    # ~30 ms remote-dispatch floor for every one of its ~100 tiny ops.
    if use_pallas:
        from .accum_kernel import combine_te_pallas
        combined = combine_te_pallas(curve, c, False, stacked)
    else:
        combined = te_path._combine_core_te(curve, c, stacked)
    f = curve.field
    return tuple(fp.to_canonical(f, a) for a in
                 (combined.x, combined.y, combined.z))


def _te_result_host(curve: CurveSpec, res_can) -> sw.Point:
    """Canonical device TE (x, y, z) planes -> SW projective point via the
    exact host-int conversion (te.te_to_sw_host; see its docstring for why
    the Fermat ladders stay on the host)."""
    from ..curve import te
    from ..field.spec import int_from_limbs
    f = curve.field
    xi, yi, zi = (int_from_limbs(np.asarray(jax.device_get(a)))
                  for a in res_can)
    sx, sy, sz = te.te_to_sw_host(curve, xi, yi, zi)
    return sw.Point(fp.from_ints(f, [sx])[0], fp.from_ints(f, [sy])[0],
                    fp.from_ints(f, [sz])[0])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _sorted_table_te(curve: CurveSpec, c: int, g: int, m: int, n: int,
                     split_ops: int, packed, scalars, inf):
    """Dispatch 1 of the sorted-table TE MSM: digits -> one
    full-row-payload sort per bucket set -> strip-reshaped table +
    bucket run bounds.  The physical row sort replaces both the key+iota
    sort AND the per-rank random row gathers of the gather path (A/B:
    scripts/microbench_shuffle.py — payload sort 29 ns/row vs 74 ns/row
    per gathered row on v5e)."""
    from .accum_kernel import SLAB_S, _slab_rows
    f = curve.field
    nl = f.n_limbs
    h = (nl + 1) // 2
    rows_pad = _slab_rows(nl)
    assert 3 * h + 1 <= rows_pad
    nbe = 1 << (c - 1)
    n_win = num_windows(curve, c)
    S = SLAB_S

    digits = signed_digits(curve, c, n_win, scalars)
    digits = jnp.pad(digits, ((0, m * g - n_win), (0, 0)))
    digits = digits.reshape(m, g, n).transpose(1, 0, 2).reshape(g, m * n)
    digits = jnp.where(jnp.tile(inf, m)[None, :], 0, digits)

    r_rows = m * n
    r_pad = r_rows + (-r_rows) % S + S          # +1 safety strip of zeros
    # `split_ops`: payload operands per lax.sort call — 0 = all 41 in one
    # sort; smaller values re-run the key comparisons per chunk but give
    # the compiler small sort units.  STATIC arg, resolved from
    # ZPRIZE_SORT_OPS by the eager caller (`_msm_te_sorted_device`) so env
    # changes are never swallowed by the jit trace cache.
    tables, starts_g, counts_g = [], [], []
    for gi in range(g):
        table, starts, counts = _sort_rows_payload(
            nbe, split_ops, rows_pad, S, digits[gi], packed)
        tables.append(table)
        starts_g.append(starts)
        counts_g.append(counts)
    return (jnp.stack(tables), jnp.stack(starts_g), jnp.stack(counts_g))


def _sort_rows_payload(nbe: int, split_ops: int, rows_pad: int, S: int,
                       digits_w, packed):
    """One window's physical row sort: |digit| keys carry the full packed
    row (+ sign) as sort payload -> (strip-reshaped table, starts, counts)
    over buckets 0..nbe+1.  Chunked sorts (split_ops > 0) need a total
    order on ROWS (not just keys) or equal-key rows would be torn apart
    across chunks — the iota tiebreaker (num_keys=2) provides it; the key
    bytes moved per pass grow by 4B/row against the 160B payload.
    `split_ops == -1` (ZPRIZE_SORT_BUILD=gather) builds the table with a
    2-operand key+index sort plus ONE random row gather instead — ~2.5x
    the movement cost of the payload sort (74 vs 29 ns/row) but a
    trivially-compilable program; the slab reads downstream stay
    contiguous either way."""
    h3 = packed.shape[0]                   # packed: column-major (3h, R)
    key = jnp.abs(digits_w).astype(jnp.uint32)
    sign = (digits_w < 0).astype(jnp.uint32)
    if split_ops == -1:
        iota = jax.lax.iota(jnp.uint32, key.shape[0])
        skey, perm = jax.lax.sort((key, iota), num_keys=1, is_stable=False)
        pi = perm.astype(jnp.int32)
        rows = jnp.take(packed, pi, axis=1)              # (3h, R)
        cols = [rows[j] for j in range(h3)] + [jnp.take(sign, pi)]
    else:
        payload = tuple(packed[j] for j in range(h3)) + (sign,)
        if split_ops <= 0 or split_ops >= len(payload):
            sorted_ops = jax.lax.sort((key,) + payload, num_keys=1,
                                      is_stable=False)
            skey = sorted_ops[0]
            cols = list(sorted_ops[1:])
        else:
            iota = jax.lax.iota(jnp.uint32, key.shape[0])
            skey = None
            cols = []
            for j0 in range(0, len(payload), split_ops):
                chunk = payload[j0:j0 + split_ops]
                out = jax.lax.sort((key, iota) + chunk, num_keys=2,
                                   is_stable=False)
                if skey is None:
                    skey = out[0]
                cols.extend(out[2:])
    r_rows = key.shape[0]
    r_pad = r_rows + (-r_rows) % S + S          # +1 safety strip of zeros
    cols += [jnp.zeros_like(cols[0])] * (rows_pad - len(cols))
    table = jnp.stack(cols, axis=1)                  # (R, rows_pad)
    table = jnp.pad(table, ((0, r_pad - r_rows), (0, 0)))
    bounds = jnp.searchsorted(skey, jnp.arange(nbe + 2, dtype=skey.dtype))
    return (table.reshape(r_pad // S, S * rows_pad),
            bounds[:-1], bounds[1:] - bounds[:-1])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _sorted_accum_te(curve: CurveSpec, c: int, g: int, interpret: bool,
                     tables, starts, counts):
    """Dispatch 2 of the sorted-table TE MSM: strip-slab accumulate per
    bucket set -> triangle merge -> window combine -> canonical planes."""
    from ..curve import te
    from .accum_kernel import SLAB_S, accumulate_te_sorted
    nbe = 1 << (c - 1)
    group_sums = [accumulate_te_sorted(curve, c, nbe, SLAB_S, interpret,
                                       tables[gi], starts[gi], counts[gi])
                  for gi in range(g)]
    sums = te.TePoint(*(jnp.concatenate([getattr(s, fld) for s in group_sums],
                                        axis=0)
                        for fld in ("x", "y", "z", "t")))
    return _sorted_merge_combine(curve, c, interpret, sums)


def _msm_te_sorted_device(curve: CurveSpec, c: int, g: int, m: int,
                          n: int, interpret: bool, packed, scalars, inf):
    """Collapsed TE MSM on the SORTED-table accumulate
    (`accum_kernel.accumulate_te_sorted`), as TWO device dispatches: the
    XLA payload sort, then the Pallas strip accumulate + merge + combine.
    The split exists for the XLA:TPU compiler, not the hardware: the
    single fully-fused program hit a pathological remote compile (>35 min
    at 2^18 c=17) while the halves compile in normal time; the extra
    dispatch costs one ~24 ms tunnel round trip."""
    split_ops = _sort_build_mode()
    tables, starts, counts = _sorted_table_te(curve, c, g, m, n, split_ops,
                                              packed, scalars, inf)
    return _sorted_accum_te(curve, c, g, interpret, tables, starts, counts)


def _sort_build_mode() -> int:
    """Static sorted-table build mode for the eager callers: -1 = gather
    build (the DEFAULT — the 41-operand payload sort is a >40 min remote
    XLA:TPU compile at 2^18, r4 probe), else ZPRIZE_SORT_BUILD=payload
    with ZPRIZE_SORT_OPS chunked/full sorts (see `_sort_rows_payload`)."""
    if os.environ.get("ZPRIZE_SORT_BUILD", "gather") == "gather":
        return -1
    return int(os.environ.get("ZPRIZE_SORT_OPS", "0"))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _digits_window_dyn(curve: CurveSpec, c: int, scalars, inf, carry,
                       i0, sh):
    """ONE window's signed digits with a TRACED window position (limb index
    `i0`, bit shift `sh` — both scalars): the streamed-sorted MSM walks 16+
    windows and a static-window variant would compile the digit graph once
    per window.  Same extraction as `_signed_digits_range` (three-limb
    read, MSB-negate, sequential carry)."""
    if scalars.dtype == jnp.uint16:
        s = scalars
    else:
        s = fp.to_canonical(curve.scalar, scalars)
    pad = [(0, 0)] * (s.ndim - 1) + [(0, 3)]
    s = jnp.pad(s, pad)
    tri = jax.lax.dynamic_slice_in_dim(s, i0, 3, axis=-1).astype(jnp.uint32)
    sh = sh.astype(jnp.uint32)
    word = tri[..., 0] | (tri[..., 1] << BASE_BITS)
    word = (word >> sh) | (tri[..., 2] << (2 * BASE_BITS - sh))
    half = 1 << (c - 1)
    raw = (word & ((1 << c) - 1)).astype(jnp.int32) + carry
    over = raw >= half
    d = jnp.where(over, raw - (1 << c), raw)
    return jnp.where(inf, 0, d), over.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _sorted_run_te(curve: CurveSpec, c: int, split_ops: int,
                   packed_run, digits_run):
    """Streamed dispatch: payload-sort ONE window x ONE row-run of the
    point table -> (strips, starts, counts) for `accumulate_te_sorted`."""
    from .accum_kernel import SLAB_S, _slab_rows
    rows_pad = _slab_rows(curve.field.n_limbs)
    nbe = 1 << (c - 1)
    return _sort_rows_payload(nbe, split_ops, rows_pad, SLAB_S,
                              digits_run, packed_run)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _sorted_merge_combine(curve: CurveSpec, c: int, interpret: bool, sums):
    """Final dispatch of the streamed-sorted MSM: triangle merge over the
    stacked (g, nbe) bucket sums + window combine -> canonical planes."""
    from . import te_path
    from .accum_kernel import (combine_te_pallas, merge_buckets_te_pallas,
                               merge_te_triangle_pallas)
    g, nbe = sums.x.shape[:2]
    if te_path.triangle_split(g, nbe) is not None:
        merged = merge_te_triangle_pallas(curve, c, interpret, sums)
    elif g * nbe * max(1, nbe.bit_length()) >= 4096:
        merged = merge_buckets_te_pallas(curve, c, interpret, sums)
    else:
        merged = te_path.merge_buckets_te(curve, c, sums)
    combined = combine_te_pallas(curve, c, interpret, merged)
    f = curve.field
    return tuple(fp.to_canonical(f, a) for a in
                 (combined.x, combined.y, combined.z))


def _msm_te_sorted_streamed(curve: CurveSpec, prepared: PreparedTe, inf,
                            scalars, c: int,
                            interpret: bool = False) -> sw.Point:
    """Sorted-table MSM for the NO-COLLAPSE scale regime (m == 1, 2^24+):
    the multi-window digit plane next to per-window sorted table copies
    would blow HBM, so windows stream one at a time and each window's rows
    sort in `run`-sized chunks (ZPRIZE_SORT_RUN_LOG, default 2^23 rows) —
    the bucket accumulator chains across runs via the `init` lanes of
    `accumulate_te_sorted`, so runs cost no extra add passes.  Peak HBM:
    packed table + one run's sorted strips + one window's bucket lanes.
    Same role as the GPU reference's sort pipeline at full scale
    (`Partition1024.cu`/`SortCounts.cu` feeding `ComputeBucketSums.cu`)."""
    from ..curve import te
    from .accum_kernel import SLAB_S, accumulate_te_sorted
    assert prepared.m == 1, "streamed-sorted path serves the m=1 regime"
    n = prepared.n
    n_win = num_windows(curve, c)
    nbe = 1 << (c - 1)
    split_ops = _sort_build_mode()
    run = min(n, 1 << int(os.environ.get("ZPRIZE_SORT_RUN_LOG", "23")))
    carry = jnp.zeros(scalars.shape[:-1], jnp.int32)
    sums_list = []
    for w in range(n_win):
        i0, sh = divmod(w * c, BASE_BITS)
        d_w, carry = _digits_window_dyn(curve, c, scalars, inf, carry,
                                        jnp.int32(i0), jnp.int32(sh))
        part = None
        for lo in range(0, n, run):
            hi = min(n, lo + run)
            tbl, st, ct = _sorted_run_te(curve, c, split_ops,
                                         prepared.packed[:, lo:hi],
                                         d_w[lo:hi])
            part = accumulate_te_sorted(curve, c, nbe, SLAB_S, interpret,
                                        tbl, st, ct, part)
        # bound the in-flight dispatch window (one sorted table copy +
        # sort temps per run; see the matching sync in _msm_te_streamed)
        jax.device_get(part.x.ravel()[0])
        sums_list.append(part)
    sums = te.TePoint(*(jnp.concatenate([getattr(p, fld) for p in sums_list],
                                        axis=0)
                        for fld in ("x", "y", "z", "t")))
    res_can = _sorted_merge_combine(curve, c, interpret, sums)
    return _te_result_host(curve, res_can)


def _msm_te(curve: CurveSpec, prepared: PreparedTe, inf, scalars, c: int,
            use_pallas: bool) -> sw.Point:
    """TE-form core of `msm`: two device dispatches, no mid-MSM host
    sync (tier depths are traced in-graph) — the launch-planning role of
    `MSM.cu:419-477` reduced to static shape selection.
    At 2^24+ (digit planes past ZPRIZE_STREAM_GB) the full-width windows
    are processed in streamed chunks instead (see `_msm_te_streamed`)."""
    import os
    n_win = num_windows(curve, c)
    full_nbe = 1 << (c - 1)
    if prepared.m > 1:
        # DEFAULT since r4: the sorted-table accumulate (bucket-major
        # physical table + contiguous strip slabs) at 487.7k pts/s vs the
        # gather path's 378.1k at 2^18 on hardware.  The table builds via
        # the 2-operand key sort + one row gather (`_sort_build_mode`);
        # the r3 compile pathology was isolated to the 41-operand payload
        # SORT (>40 min standalone), not the slab kernels (87.8 s).
        # ZPRIZE_ACCUM=gather reverts to the per-rank gather accumulate.
        if use_pallas and os.environ.get("ZPRIZE_ACCUM", "sorted") == "sorted":
            res_can = _msm_te_sorted_device(
                curve, c, prepared.g, prepared.m, prepared.n, False,
                prepared.packed, scalars, inf)
            return _te_result_host(curve, res_can)
        cspec = (prepared.g, prepared.m, prepared.n)
        gdict = {full_nbe: list(range(prepared.g))}
    else:
        if use_pallas and os.environ.get("ZPRIZE_ACCUM", "gather") == "sorted":
            return _msm_te_sorted_streamed(curve, prepared, inf, scalars, c)
        cspec = None
        gdict = _window_groups(curve, c, n_win, full_nbe)
    stream_gb = float(os.environ.get("ZPRIZE_STREAM_GB", "3"))
    if (cspec is None
            and n_win * prepared.n * 8 > stream_gb * (1 << 30)):
        return _msm_te_streamed(curve, prepared, inf, scalars, c,
                                use_pallas, gdict)
    gspec = tuple(sorted(((nbe, tuple(ws)) for nbe, ws in gdict.items()),
                         reverse=True))
    digits, perm, starts, counts, _ = _digits_grouped_te(
        curve, c, cspec, gspec, False, scalars, inf)
    # traced tier depths throughout: no schedule sync, one compile per
    # shape (a prover commits dozens of polynomials, each with a different
    # occupancy profile — static depths recompiled the graph per commit)
    tiers_spec = ("traced",) * len(gspec)
    res_can = _msm_te_device(curve, c, gspec, tiers_spec, use_pallas,
                             prepared.packed, digits, perm, starts, counts)
    # single-point TE->SW on the host (exact; see te.te_to_sw_host)
    return _te_result_host(curve, res_can)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _digits_chunk_dyn(curve: CurveSpec, c: int, n_chunk: int, nbe: int,
                      scalars, inf, carry, i0s, shs):
    """Streamed dispatch 1 with TRACED window positions (`i0s`/`shs`:
    (n_chunk,) limb index / bit shift per window): the static-window form
    compiles once per chunk — 16 separate digit+sort compiles at 2^26,
    each a multi-minute remote XLA:TPU build.  One traced-position program
    serves every chunk of the same width."""
    if scalars.dtype == jnp.uint16:
        s = scalars
    else:
        s = fp.to_canonical(curve.scalar, scalars)
    pad = [(0, 0)] * (s.ndim - 1) + [(0, 3)]
    s = jnp.pad(s, pad)
    half = 1 << (c - 1)
    digits = []
    for k in range(n_chunk):
        tri = jax.lax.dynamic_slice_in_dim(s, i0s[k], 3,
                                           axis=-1).astype(jnp.uint32)
        sh = shs[k].astype(jnp.uint32)
        word = tri[..., 0] | (tri[..., 1] << BASE_BITS)
        word = (word >> sh) | (tri[..., 2] << (2 * BASE_BITS - sh))
        raw = (word & ((1 << c) - 1)).astype(jnp.int32) + carry
        over = raw >= half
        digits.append(jnp.where(over, raw - (1 << c), raw))
        carry = over.astype(jnp.int32)
    digits = jnp.where(inf[None, :], 0, jnp.stack(digits))
    perm, starts, counts, _ = bucket_counts_all(c, digits)
    return digits, perm, starts, counts, carry


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _accum_merge_chunk_te(curve: CurveSpec, c: int, nbe: int, tiers,
                          use_pallas: bool, packed, digits, perm, starts,
                          counts):
    """Streamed dispatch 2: tiered accumulate + bucket merge for one window
    chunk; returns the merged TE window sums ((w1-w0,) lanes)."""
    from . import te_path
    n_win = digits.shape[0]
    if use_pallas:
        from .accum_kernel import (accumulate_te_pallas,
                                   merge_buckets_te_pallas,
                                   merge_te_triangle_pallas)
        sums = accumulate_te_pallas(curve, c, 1, packed, digits, perm,
                                    starts, counts, nbe, tier_depths=tiers)
        n_bits = max(1, nbe.bit_length())
        lane_count = n_win * n_bits * min(nbe, 128)
        if te_path.triangle_split(n_win, nbe) is not None:
            return merge_te_triangle_pallas(curve, c, False, sums)
        if n_win * nbe * n_bits >= 4096 and lane_count % 128 == 0:
            return merge_buckets_te_pallas(curve, c, False, sums)
        return te_path.merge_buckets_te(curve, c, sums)
    depth = jnp.maximum(1, jnp.max(counts[:, 1:nbe + 1]))
    sums = te_path.accumulate_te(curve, c, depth, packed, digits, perm,
                                 starts, counts, nbe)
    if te_path.triangle_split(n_win, nbe) is not None:
        return te_path.merge_buckets_te_triangle(curve, c, sums)
    return te_path.merge_buckets_te(curve, c, sums)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _combine_finish_te(curve: CurveSpec, c: int, use_pallas: bool, stacked):
    from . import te_path
    if use_pallas:
        from .accum_kernel import combine_te_pallas
        combined = combine_te_pallas(curve, c, False, stacked)
    else:
        combined = te_path._combine_core_te(curve, c, stacked)
    f = curve.field
    return tuple(fp.to_canonical(f, a) for a in
                 (combined.x, combined.y, combined.z))


def _msm_te_streamed(curve: CurveSpec, prepared: PreparedTe, inf, scalars,
                     c: int, use_pallas: bool, gdict) -> sw.Point:
    """Window-streamed TE MSM for 2^24+ points: the (n_win, n) digit/perm
    planes would not fit HBM next to the point table (2^26: 10.7 GB table
    + 13 windows x 0.5 GB x 2), so windows are processed in chunks — two
    dispatches per chunk, one (n,) carry checkpoint riding between chunks
    (the signed-digit carry chain is sequential in w).  The memory plan:
    table (n x 160 B) + one chunk of digits/perm/sort temps + one chunk of
    bucket-sum lanes, all bounded by ZPRIZE_STREAM_GB."""
    import os
    from ..curve import te
    from ..field.spec import int_from_limbs
    n = prepared.n
    n_win = num_windows(curve, c)
    stream_gb = float(os.environ.get("ZPRIZE_STREAM_GB", "3"))
    wchunk = (int(os.environ.get("ZPRIZE_STREAM_WINDOWS", "0"))
              or max(1, int(stream_gb * (1 << 30) // (n * 8 * 2))))
    window_sums: list = [None] * n_win
    carry = jnp.zeros((n,), jnp.int32)
    # groups in ascending window order (the carry chain crosses groups)
    for nbe, ws in sorted(gdict.items(), key=lambda kv: min(kv[1])):
        assert list(ws) == list(range(min(ws), max(ws) + 1)), ws
        for lo in range(min(ws), max(ws) + 1, wchunk):
            hi = min(max(ws) + 1, lo + wchunk)
            pos = [divmod(w * c, BASE_BITS) for w in range(lo, hi)]
            digits, perm, starts, counts, carry = _digits_chunk_dyn(
                curve, c, hi - lo, nbe, scalars, inf, carry,
                jnp.asarray([p[0] for p in pos], jnp.int32),
                jnp.asarray([p[1] for p in pos], jnp.int32))
            merged = _accum_merge_chunk_te(curve, c, nbe, "traced",
                                           use_pallas, prepared.packed,
                                           digits, perm, starts, counts)
            # bound the in-flight dispatch window: without a sync the async
            # queue holds EVERY chunk's digit/perm/sort temps live at once
            # (16 x ~1.5 GB at 2^26 -> ResourceExhausted); one tiny
            # transfer per chunk costs ~24 ms against a multi-second chunk
            jax.device_get(merged.x.ravel()[0])
            for k, w in enumerate(range(lo, hi)):
                window_sums[w] = te.TePoint(*(a[k] for a in merged))
    stacked = te.TePoint(*(jnp.stack([getattr(p, f) for p in window_sums])
                           for f in ("x", "y", "z", "t")))
    res_can = _combine_finish_te(curve, c, use_pallas, stacked)
    return _te_result_host(curve, res_can)


def msm_jit_batch(curve: CurveSpec, points: sw.Affine, scalars: jax.Array,
                  c: int, cap_total: int,
                  check_occupancy: bool = True) -> sw.Point:
    """Batched fully-jittable MSM: scalars (B, n, L) against ONE shared
    point set -> a (B,)-lane projective sw.Point.

    The batch rides the WINDOW axis: digit planes stack to (B*n_win, n), so
    one accumulate/merge pass serves every instance — the commit path for
    batched provers (B proofs per dispatch; the TPU analog of the
    reference's thread-per-proof loop, `simonatsn/README.md:88`).  Same
    occupancy contract as `msm_jit_static`."""
    bsz = scalars.shape[0]
    n = points.x.shape[0]
    n_win = num_windows(curve, c)
    full_nbe = 1 << (c - 1)
    digits = jax.vmap(
        functools.partial(signed_digits, curve, c, n_win))(scalars)
    digits = jnp.where(points.inf[None, None, :], 0, digits)
    digits = digits.reshape(bsz * n_win, n)
    perm, starts, counts, _ = bucket_counts_all(c, digits)
    fine = _window_groups(curve, c, n_win, full_nbe)
    groups: dict[int, list[int]] = {}
    narrow = [(nbe, ws) for nbe, ws in fine.items() if nbe != full_nbe]
    if full_nbe in fine:
        groups[full_nbe] = fine[full_nbe]
    if narrow:
        nbe_max = max(nbe for nbe, _ in narrow)
        groups[nbe_max] = sorted(w for _, ws in narrow for w in ws)
    window_sums: list = [None] * (bsz * n_win)
    for nbe, ws in sorted(groups.items(), reverse=True):
        rows = [b * n_win + w for b in range(bsz) for w in ws]
        jw = jnp.asarray(np.asarray(rows))
        d_g, p_g = digits[jw], perm[jw]
        s_g, c_g = starts[jw], counts[jw]
        cap_g = cap_total if nbe == full_nbe else n
        if check_occupancy and cap_g < n and nbe == full_nbe:
            def _assert_cap(mc, cap=cap_g):
                worst = int(np.max(mc))
                if worst > cap:
                    raise RuntimeError(
                        f"msm_jit_batch: bucket occupancy {worst} exceeds "
                        f"cap_total {cap}; result would drop points")
            jax.debug.callback(_assert_cap,
                               jnp.max(jnp.max(c_g[:, 1:nbe + 1], axis=1)))
        sums = accumulate_pass_all(curve, c, cap_g, points.x, points.y,
                                   d_g, p_g, s_g, c_g, n_buckets_eff=nbe)
        merged = merge_buckets_all(curve, c, sums)
        for k, r in enumerate(rows):
            window_sums[r] = sw.Point(*(a[k] for a in merged))
    stacked = sw.Point(*(jnp.stack([getattr(w, f) for w in window_sums]
                                   ).reshape(bsz, n_win, -1)
                         for f in ("x", "y", "z")))
    return jax.vmap(functools.partial(combine_windows, curve, c))(stacked)


def msm_jit_static(curve: CurveSpec, points: sw.Affine, scalars: jax.Array,
                   c: int, cap_total: int,
                   check_occupancy: bool = True) -> sw.Point:
    """Fully-jittable MSM variant (no host sync): a fixed budget of
    `cap_total` per-bucket ranks is covered in one rectangle.  Correct for
    any input with max bucket occupancy <= cap_total; intended for use inside
    larger jitted pipelines (prover) where scalars are uniform field elements
    and occupancy bounds hold with overwhelming margin.

    `check_occupancy` (default on) raises loudly from a host callback if any
    bucket exceeds `cap_total` — adversarial digit distributions must fail,
    not silently drop points.  Disable only when the caller has its own
    occupancy bound (e.g. cap_total == local n)."""
    n_win = num_windows(curve, c)
    n = points.x.shape[0]
    full_nbe = 1 << (c - 1)
    digits = signed_digits(curve, c, n_win, scalars)
    digits = jnp.where(points.inf[None, :], 0, digits)
    perm, starts, counts, max_count = bucket_counts_all(c, digits)
    # Window grouping as in `msm`: top carry windows concentrate their
    # digits into few buckets (far above any occupancy heuristic), so they
    # get narrow rectangles at FULL depth (cheap: nbe is small) while the
    # uniform full-width group uses the static `cap_total` budget.
    # Collapsed to at most TWO groups (full-width + one shared narrow
    # rectangle): each group instantiates its own accumulate/merge graph,
    # and this function is compiled inside larger pipelines where XLA:CPU
    # compile time scales with the unroll.
    fine = _window_groups(curve, c, n_win, full_nbe)
    groups: dict[int, list[int]] = {}
    narrow = [(nbe, ws) for nbe, ws in fine.items() if nbe != full_nbe]
    if full_nbe in fine:
        groups[full_nbe] = fine[full_nbe]
    if narrow:
        nbe_max = max(nbe for nbe, _ in narrow)
        groups[nbe_max] = sorted(w for _, ws in narrow for w in ws)
    window_sums: list = [None] * n_win
    for nbe, ws in sorted(groups.items(), reverse=True):
        jw = jnp.asarray(np.asarray(ws))
        d_g, p_g = digits[jw], perm[jw]
        s_g, c_g = starts[jw], counts[jw]
        cap_g = cap_total if nbe == full_nbe else n
        if (check_occupancy and cap_g < n and nbe == full_nbe):
            def _assert_cap(mc, cap=cap_g):
                worst = int(np.max(mc))
                if worst > cap:
                    raise RuntimeError(
                        f"msm_jit_static: bucket occupancy {worst} exceeds "
                        f"cap_total {cap}; result would drop points")
            jax.debug.callback(_assert_cap,
                               jnp.max(jnp.max(c_g[:, 1:nbe + 1], axis=1)))
        sums = accumulate_pass_all(curve, c, cap_g, points.x, points.y,
                                   d_g, p_g, s_g, c_g, n_buckets_eff=nbe)
        merged = merge_buckets_all(curve, c, sums)
        for k, w in enumerate(ws):
            window_sums[w] = sw.Point(*(a[k] for a in merged))
    stacked = sw.Point(*(jnp.stack([getattr(w, f) for w in window_sums])
                         for f in ("x", "y", "z")))
    return combine_windows(curve, c, stacked)
