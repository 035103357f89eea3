"""Pallas Goldilocks NTT: all butterfly stages fused in VMEM.

The prize2-ntt hot path.  A whole 2^k-point transform (k <= 12) runs inside
one kernel invocation per batch tile: positions on sublanes, batch on
lanes; each stage is two sublane rolls + one packed Goldilocks multiply +
a masked add/sub select (`gl_ops.py`), with position-expanded twiddle/mask
tables passed as kernel inputs.  Data never touches HBM between stages —
the TPU analog of supranational's 192-butterfly constant-geometry engine
with on-chip twiddles (`rtl/ntt/ntt_cgram.sv`, `ntt_twiddle.sv`).

Four-step composition (2^24 = 2^12 x 2^12) reuses the kernel for the
column and row passes with an XLA transpose + elementwise twiddle pass in
between (`fourstep` semantics, bit-exact vs the generic engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.spec import GOLDILOCKS
from .domain import _bitrev_perm, primitive_root
from . import gl_ops as G

Q = G.Q


@functools.lru_cache(maxsize=None)
def _stage_tables(log_n: int, inverse: bool):
    """Position-expanded per-stage twiddles, lo-half masks, and SHIFT
    descriptors (numpy).

    Goldilocks has ord(2) = 192, so every 2^j-th root of unity for j <= 6
    lies in <2>: the butterfly twiddles of stages with m <= 64 are all
    powers of two, and their multiply reduces to a variable left shift
    plus the 2^64/2^96 fold (cosic's root-of-unity observation,
    `prize2-ntt` hardcaml docs) — no 16-piece schoolbook product.  The
    shift descriptor packs, per position: bits 0-4 = e mod 32, bits 5-6 =
    (e mod 96) >> 5, bit 7 = e >= 96 (negate, via 2^96 ≡ -1).  Rows for
    stages with m > 64 are zero (general-multiply stages)."""
    n = 1 << log_n
    w = primitive_root(GOLDILOCKS, log_n)
    if inverse:
        w = pow(w, Q - 2, Q)
    pows = [1] * (n // 2)
    for k in range(1, n // 2):
        pows[k] = pows[k - 1] * w % Q
    dlog2 = {pow(2, k, Q): k for k in range(192)}
    twlo = np.zeros((log_n, n), np.uint32)
    twhi = np.zeros((log_n, n), np.uint32)
    mask = np.zeros((log_n, n), np.uint32)
    shift = np.zeros((log_n, n), np.uint32)
    for s in range(1, log_n + 1):
        m = 1 << s
        for i in range(n):
            j = (i % (m // 2)) * (n // m)
            v = pows[j]
            twlo[s - 1, i] = v & 0xFFFFFFFF
            twhi[s - 1, i] = v >> 32
            mask[s - 1, i] = 1 if (i % m) < m // 2 else 0
            if m <= 64:
                e = dlog2[v]
                # bits 0-6 = e mod 96 (the decoder reads bits 0-4 as the
                # sub-32 shift and bits 5-6 as the 32-bit digit offset);
                # bit 7 = negate (2^96 ≡ -1)
                shift[s - 1, i] = (e % 96) | ((e >= 96) << 7)
    return twlo, twhi, mask, shift


def _gl_mul_pow2(sp, xlo, xhi):
    """x * 2^e (mod q) from the packed shift descriptor `sp` (see
    `_stage_tables`): e' = e mod 96 shifts the (lo, hi) pair into three
    base-2^32 digits placed by q = e' >> 5, folded with 2^64 ≡ 2^32 - 1 /
    2^96 ≡ -1 / 2^128 ≡ -2^32; bit 7 negates (2^96 ≡ -1).  ~45 VPU ops
    vs ~70 for the general `gl_mul` — and e = 0 passes through exactly
    (gl_add/gl_sub with 0 are bit-identity), so twiddle-1 lanes need no
    special case."""
    r = sp & 31
    q1m = (sp & 32) != 0
    q2m = (sp & 64) != 0
    neg = (sp & 128) != 0
    t0 = xlo << r
    mid = ((xlo >> (31 - r)) >> 1) | (xhi << r)
    t2 = (xhi >> (31 - r)) >> 1
    z = jnp.zeros_like(t0)
    # digits of x * 2^(32q) in base 2^32: d = [t0, mid, t2] shifted by q
    d0 = jnp.where(q1m | q2m, z, t0)
    d1 = jnp.where(q1m, t0, jnp.where(q2m, z, mid))
    d2 = jnp.where(q1m, mid, jnp.where(q2m, t0, t2))
    d3 = jnp.where(q1m, t2, jnp.where(q2m, mid, z))
    d4 = jnp.where(q2m, t2, z)
    lo, hi = G.gl_sub(d0, d1, d2, z)      # - d2        (2^64 fold, part 1)
    lo, hi = G.gl_add(lo, hi, z, d2)      # + 2^32 d2   (2^64 fold, part 2)
    lo, hi = G.gl_sub(lo, hi, d3, d4)     # - d3 - 2^32 d4
    nlo, nhi = G.gl_sub(z, z, lo, hi)
    return jnp.where(neg, nlo, lo), jnp.where(neg, nhi, hi)


def _shift_twiddle_on() -> bool:
    import os
    return os.environ.get("ZPRIZE_NTT_SHIFT", "1") != "0"


@functools.lru_cache(maxsize=None)
def _make_ntt_call(log_n: int, n_batch: int, tile: int, interpret: bool,
                   use_shift: bool = True):
    n = 1 << log_n
    assert n_batch % tile == 0

    def kernel(twlo_ref, twhi_ref, mask_ref, sh_ref, xlo_ref, xhi_ref,
               olo_ref, ohi_ref):
        xlo = xlo_ref[...]
        xhi = xhi_ref[...]
        for s in range(log_n):
            sh = 1 << s                       # m/2 for stage s+1
            mk = mask_ref[s][:, None]
            dn_lo = pltpu.roll(xlo, n - sh, axis=0)   # [i] <- x[i + sh]
            dn_hi = pltpu.roll(xhi, n - sh, axis=0)
            up_lo = pltpu.roll(xlo, sh, axis=0)       # [i] <- x[i - sh]
            up_hi = pltpu.roll(xhi, sh, axis=0)
            pick_lo = jnp.where(mk != 0, dn_lo, xlo)
            pick_hi = jnp.where(mk != 0, dn_hi, xhi)
            base_lo = jnp.where(mk != 0, xlo, up_lo)
            base_hi = jnp.where(mk != 0, xhi, up_hi)
            if use_shift and s == 0:
                # stage 1 twiddles are all 1: no multiply at all
                q_lo, q_hi = pick_lo, pick_hi
            elif use_shift and s <= 5:
                # m <= 64: every twiddle is a power of 2 (ord(2) = 192)
                q_lo, q_hi = _gl_mul_pow2(sh_ref[s][:, None],
                                          pick_lo, pick_hi)
            else:
                tl = twlo_ref[s][:, None]
                th = twhi_ref[s][:, None]
                q_lo, q_hi = G.gl_mul(tl, th, pick_lo, pick_hi)
            a_lo, a_hi = G.gl_add(base_lo, base_hi, q_lo, q_hi)
            s_lo, s_hi = G.gl_sub(base_lo, base_hi, q_lo, q_hi)
            xlo = jnp.where(mk != 0, a_lo, s_lo)
            xhi = jnp.where(mk != 0, a_hi, s_hi)
        olo_ref[...] = xlo
        ohi_ref[...] = xhi

    data_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((log_n, n), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_batch // tile,),
        in_specs=[tab_spec, tab_spec, tab_spec, tab_spec, data_spec,
                  data_spec],
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((n, n_batch), jnp.uint32),
                   jax.ShapeDtypeStruct((n, n_batch), jnp.uint32)),
        interpret=interpret,
    )


# Largest transform run as a single fused kernel; larger sizes recurse via
# the four-step split (the Mosaic compiler rejects very tall blocks —
# 4096 sublanes x 12 unrolled stages failed remote compile; 2^9 is the
# proven default).  Env knob for probing taller kernels on hardware:
# every extra level saved removes a full HBM round trip (kernel + twiddle
# + transpose pass) at 2^24 scale.
def _max_kernel_log() -> int:
    import os
    return int(os.environ.get("ZPRIZE_NTT_MAXLOG", "9"))


MAX_KERNEL_LOG = _max_kernel_log()


@functools.lru_cache(maxsize=None)
def _make_ntt_grid_call(log_n: int, n_batch: int, tile: int,
                        interpret: bool):
    """Whole-transform kernel with one butterfly STAGE per grid step.

    The (n, tile) data block is revisited across the log_n inner grid
    steps — Pallas keeps it resident in VMEM and writes it back to HBM
    only after the last visit — so the kernel body holds ONE stage of
    code instead of log_n unrolled stages.  That sidesteps the Mosaic
    tall-unroll compile failure that capped the fused kernel at 2^9
    (`MAX_KERNEL_LOG`): 2^10..2^12 transforms now run as a single Pallas
    dispatch with zero inter-stage HBM traffic, where the recursive
    split paid a full HBM round trip (bitrev gather + step-twiddle +
    transpose) per extra level.  The butterfly pairing distance is a
    dynamic roll shift (1 << s); per-stage twiddle/mask rows stream in
    via the table block index map (supranational's on-chip twiddle
    generation role, `rtl/ntt/ntt_twiddle.sv`)."""
    n = 1 << log_n

    def kernel(twlo_ref, twhi_ref, mask_ref, xlo_ref, xhi_ref,
               olo_ref, ohi_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _init():
            olo_ref[...] = xlo_ref[...]
            ohi_ref[...] = xhi_ref[...]

        xlo = olo_ref[...]
        xhi = ohi_ref[...]
        sh = jnp.int32(1) << s
        tl = twlo_ref[0, 0][:, None]
        th = twhi_ref[0, 0][:, None]
        mk = mask_ref[0, 0][:, None]
        dn_lo = pltpu.roll(xlo, n - sh, axis=0)   # [i] <- x[i + sh]
        dn_hi = pltpu.roll(xhi, n - sh, axis=0)
        up_lo = pltpu.roll(xlo, sh, axis=0)       # [i] <- x[i - sh]
        up_hi = pltpu.roll(xhi, sh, axis=0)
        pick_lo = jnp.where(mk != 0, dn_lo, xlo)
        pick_hi = jnp.where(mk != 0, dn_hi, xhi)
        base_lo = jnp.where(mk != 0, xlo, up_lo)
        base_hi = jnp.where(mk != 0, xhi, up_hi)
        q_lo, q_hi = G.gl_mul(tl, th, pick_lo, pick_hi)
        a_lo, a_hi = G.gl_add(base_lo, base_hi, q_lo, q_hi)
        s_lo, s_hi = G.gl_sub(base_lo, base_hi, q_lo, q_hi)
        olo_ref[...] = jnp.where(mk != 0, a_lo, s_lo)
        ohi_ref[...] = jnp.where(mk != 0, a_hi, s_hi)

    data_spec = pl.BlockSpec((n, tile), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM)
    # tables arrive as (log_n, 1, n): a (1, 1, n) block keeps the last two
    # dims within the Mosaic (8, 128) tiling rule ((1, n) blocks of a
    # (log_n, n) array are rejected)
    tab_spec = pl.BlockSpec((1, 1, n), lambda i, s: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_batch // tile, log_n),
        in_specs=[tab_spec, tab_spec, tab_spec, data_spec, data_spec],
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((n, n_batch), jnp.uint32),
                   jax.ShapeDtypeStruct((n, n_batch), jnp.uint32)),
        # the stage body's gl_mul temporaries need ~38 MB of scoped VMEM at
        # (4096, 128) blocks — above the 16 MB default limit but well under
        # the v5e's 128 MiB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )

    def wrapped(twlo, twhi, mask, xlo, xhi):
        return call(twlo[:, None, :], twhi[:, None, :], mask[:, None, :],
                    xlo, xhi)

    return wrapped


# Largest transform run as a single stage-grid kernel (0 disables the
# grid form and falls back to the recursive split).  Default OFF: measured
# on v5e at 2^24 the grid form is correct but slightly slower (38.3 ms vs
# 36.6 ms amortized) — the recursive split's glue passes (bitrev gathers,
# step twiddle, transpose) are cheaper than expected because the stage
# body's general gl_mul dominates; the next lever is shift-only twiddles
# (2^6 sub-blocks whose twiddles are powers of two — cosic's
# root-of-unity trick), not taller kernels.
def _grid_max_log() -> int:
    import os
    return int(os.environ.get("ZPRIZE_NTT_GRIDLOG", "0"))


def _ntt_axis0(log_n: int, xlo, xhi, inverse: bool, tile: int,
               interpret: bool):
    """Unscaled (inverse uses w^-1 only) NTT over axis 0 of (n, B) planes."""
    n, n_batch = xlo.shape
    if log_n <= max(MAX_KERNEL_LOG, _grid_max_log()):
        br = jnp.asarray(_bitrev_perm(log_n).astype(np.int32))
        xlo = jnp.take(xlo, br, axis=0)
        xhi = jnp.take(xhi, br, axis=0)
        twlo, twhi, mask, shtab = _stage_tables(log_n, inverse)
        tile = min(tile, n_batch)
        if log_n <= MAX_KERNEL_LOG:
            # small transforms: fully-unrolled single grid step
            call = _make_ntt_call(log_n, n_batch, tile, interpret,
                                  _shift_twiddle_on())
            return call(jnp.asarray(twlo), jnp.asarray(twhi),
                        jnp.asarray(mask), jnp.asarray(shtab), xlo, xhi)
        call = _make_ntt_grid_call(log_n, n_batch, tile, interpret)
        return call(jnp.asarray(twlo), jnp.asarray(twhi), jnp.asarray(mask),
                    xlo, xhi)
    # recursive four-step split along the position axis
    l1 = min(MAX_KERNEL_LOG, log_n - MAX_KERNEL_LOG) \
        if log_n > 2 * MAX_KERNEL_LOG else log_n // 2
    l2 = log_n - l1
    n1, n2 = 1 << l1, 1 << l2
    v_lo = xlo.reshape(n1, n2 * n_batch)
    v_hi = xhi.reshape(n1, n2 * n_batch)
    c_lo, c_hi = _ntt_axis0(l1, v_lo, v_hi, inverse, tile, interpret)
    c_lo = c_lo.reshape(n1, n2, n_batch)
    c_hi = c_hi.reshape(n1, n2, n_batch)
    c_lo, c_hi = _apply_step_twiddle(l1, l2, inverse, c_lo, c_hi)
    r_lo = jnp.swapaxes(c_lo, 0, 1).reshape(n2, n1 * n_batch)
    r_hi = jnp.swapaxes(c_hi, 0, 1).reshape(n2, n1 * n_batch)
    r_lo, r_hi = _ntt_axis0(l2, r_lo, r_hi, inverse, tile, interpret)
    # R[k2, k1] = C[k1, k2]; out position index = k1 + n1*k2 = row-major (k2, k1)
    return r_lo.reshape(n1 * n2, n_batch), r_hi.reshape(n1 * n2, n_batch)


def _default_tile() -> int:
    """Lane-tile width for the fused NTT kernel (env A/B knob; the MSM
    kernels run 512 — the 128 default here predates that measurement)."""
    import os
    return int(os.environ.get("ZPRIZE_NTT_TILE", "128"))


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def ntt_packed(log_n: int, xlo: jax.Array, xhi: jax.Array,
               inverse: bool = False, tile: int | None = None,
               interpret: bool = False):
    """Forward/inverse NTT over axis 0 of packed (n, B) planes.
    Inverse includes the 1/n scale.  Jitted end-to-end (the table caches
    hold numpy, so tracing never leaks)."""
    if tile is None:
        tile = _default_tile()
    n, n_batch = xlo.shape
    assert n == 1 << log_n
    olo, ohi = _ntt_axis0(log_n, xlo, xhi, inverse, tile, interpret)
    if inverse:
        n_inv = pow(n, Q - 2, Q)
        olo, ohi = G.gl_mul(
            jnp.full_like(olo, n_inv & 0xFFFFFFFF),
            jnp.full_like(ohi, n_inv >> 32), olo, ohi)
    return olo, ohi


# split point for the two-level step-twiddle tables
_TW_SPLIT_LOG = 8


@functools.lru_cache(maxsize=None)
def _twiddle_tables_two_level(log_n1: int, log_n2: int, inverse: bool):
    """numpy two-level step-twiddle tables:
    w^(k1*j2) = A[k1, j2 >> s] * B[k1, j2 & (2^s - 1)], s = min(log_n2, 8).
    Replaces the materialized (n1, n2) twiddle matrix — 64 MB per plane of
    constant HBM reads at 2^24 — with O(n1 * 2^s) tables whose product
    XLA fuses into the elementwise correction pass (the two-level omega
    table of the reference, `winderica/distributed/src/gpu/mod.rs:536-539`).
    Returns (a_lo, a_hi, b_lo, b_hi); A is None-shaped (n1, 1) of ones when
    log_n2 <= s."""
    n1 = 1 << log_n1
    s = min(log_n2, _TW_SPLIT_LOG)
    nlo, nhi = 1 << s, 1 << (log_n2 - s)
    w = primitive_root(GOLDILOCKS, log_n1 + log_n2)
    if inverse:
        w = pow(w, Q - 2, Q)

    def build(base, count):
        # T[k1, j] = base^(k1*j), running products only
        lo = np.zeros((n1, count), np.uint32)
        hi = np.zeros((n1, count), np.uint32)
        step = 1                         # base^k1
        for k1 in range(n1):
            v = 1
            for j in range(count):
                lo[k1, j] = v & 0xFFFFFFFF
                hi[k1, j] = v >> 32
                v = v * step % Q
            step = step * base % Q
        return lo, hi

    a_lo, a_hi = build(pow(w, nlo, Q), nhi)
    b_lo, b_hi = build(w, nlo)
    return a_lo, a_hi, b_lo, b_hi


def _apply_step_twiddle(log_n1: int, log_n2: int, inverse: bool,
                        c_lo, c_hi):
    """Elementwise w^(k1*k2) correction on (n1, n2, B) planes via the
    two-level tables (one or two fused gl_muls; no big constant)."""
    n1, n2, nb = c_lo.shape
    s = min(log_n2, _TW_SPLIT_LOG)
    nlo, nhi = 1 << s, 1 << (log_n2 - s)
    a_lo, a_hi, b_lo, b_hi = _twiddle_tables_two_level(log_n1, log_n2,
                                                       inverse)
    c_lo = c_lo.reshape(n1, nhi, nlo, nb)
    c_hi = c_hi.reshape(n1, nhi, nlo, nb)
    if nhi > 1:
        c_lo, c_hi = G.gl_mul(jnp.asarray(a_lo)[:, :, None, None],
                              jnp.asarray(a_hi)[:, :, None, None],
                              c_lo, c_hi)
    c_lo, c_hi = G.gl_mul(jnp.asarray(b_lo)[:, None, :, None],
                          jnp.asarray(b_hi)[:, None, :, None], c_lo, c_hi)
    return c_lo.reshape(n1, n2, nb), c_hi.reshape(n1, n2, nb)


@functools.lru_cache(maxsize=None)
def _twiddle_matrix_packed(log_n1: int, log_n2: int, inverse: bool):
    n1, n2 = 1 << log_n1, 1 << log_n2
    n = n1 * n2
    w = primitive_root(GOLDILOCKS, log_n1 + log_n2)
    if inverse:
        w = pow(w, Q - 2, Q)
    # rows: w^(k1*j2) = (w^k1)^j2; build per row with a running multiply
    lo = np.zeros((n1, n2), np.uint32)
    hi = np.zeros((n1, n2), np.uint32)
    wk1 = 1
    for k1 in range(n1):
        v = 1
        step = wk1
        for j2 in range(n2):
            lo[k1, j2] = v & 0xFFFFFFFF
            hi[k1, j2] = v >> 32
            v = v * step % Q
        wk1 = wk1 * w % Q
    return lo, hi


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def ntt_fourstep_packed(log_n1: int, log_n2: int, xlo, xhi,
                        interpret: bool = False):
    """Forward NTT of packed (n,) planes via four-step; returns natural
    order (same convention as `fourstep.ntt_fourstep`)."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    mlo = xlo.reshape(n1, n2)
    mhi = xhi.reshape(n1, n2)
    # column transforms: positions along axis 0 already
    clo, chi = ntt_packed(log_n1, mlo, mhi, interpret=interpret)
    clo, chi = _apply_step_twiddle(log_n1, log_n2, False,
                                   clo[:, :, None], chi[:, :, None])
    clo, chi = clo[:, :, 0], chi[:, :, 0]
    # row transforms: transpose so positions are on axis 0
    rlo, rhi = ntt_packed(log_n2, clo.T, chi.T, interpret=interpret)
    # rlo is (n2, n1) = C^T with C[k1, k2]; A[k1 + n1 k2] = C[k1, k2]
    return rlo.reshape(n1 * n2), rhi.reshape(n1 * n2)
