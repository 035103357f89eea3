"""Kernel-form field arithmetic for Pallas bodies (limb-major layout).

The jnp engine in `fp.py` is built around XLA-scale ops (one MXU matmul per
schoolbook product).  Inside a Pallas kernel we want the opposite shape:
register-resident VPU arithmetic with zero HBM intermediates.  These ops
work on **limb-major** planes `(N, T)` — limbs on sublanes (26 -> 32 rows,
81% utilization), lanes = batch tile — using only ops Mosaic lowers well
(elementwise u32 mul/shift/mask, sublane-shifted adds via concatenate).

Same representation and the same statically-planned reduction bounds as
`fp.py` (normal form: limbs < 2**16, base 2**15); results are bit-identical.
Bounds constants are re-derived here with the per-column logic of the main
engine; the test-suite checks kernel vs jnp paths exhaustively.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .spec import BASE_BITS, LIMB_MASK, FieldSpec

_MASK = np.uint32(LIMB_MASK)
_U32_LIM = 1 << 32
_NF = 1 << 16


def _shift_rows(x: jax.Array, down: int, total: int) -> jax.Array:
    """Place the rows of x at row offset `down` within `total` rows."""
    n = x.shape[0]
    parts = []
    if down:
        parts.append(jnp.zeros((down,) + x.shape[1:], x.dtype))
    parts.append(x)
    tail = total - down - n
    if tail:
        parts.append(jnp.zeros((tail,) + x.shape[1:], x.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else x


def _carry_pass_k(c, bounds):
    lo = c & _MASK
    hi = c >> BASE_BITS
    w = len(bounds)
    top_spill = (bounds[-1] - 1) >> BASE_BITS
    nb = [min(bounds[0], LIMB_MASK + 1)]
    for k in range(1, w):
        nb.append(min(bounds[k], LIMB_MASK + 1) + ((bounds[k - 1] - 1) >> BASE_BITS))
    if top_spill > 0:
        new = _shift_rows(lo, 0, w + 1) + _shift_rows(hi, 1, w + 1)
        nb.append(top_spill + 1)
    else:
        new = jnp.concatenate([lo[:1], lo[1:] + hi[:-1]], axis=0)
    return new, nb


def _fold_pass_k(c, bounds, spec: FieldSpec, ft):
    n = spec.n_limbs
    n_tail = len(bounds) - n
    Tnp = spec.fold_table.astype(np.int64)
    out = c[:n]
    out_b = list(bounds[:n])
    spill = None
    spill_b = 1
    tail = c[n:]
    lo_b = [min(b, LIMB_MASK + 1) for b in bounds[n:]]
    hi_b = [((b - 1) >> BASE_BITS) + 1 for b in bounds[n:]]
    lo_t = tail & _MASK
    hi_t = tail >> BASE_BITS

    for part, part_b, row0 in ((lo_t, lo_b, 0), (hi_t, hi_b, 1)):
        if all(b <= 1 for b in part_b):
            continue
        rows = Tnp[row0:row0 + n_tail]
        pb = (np.array([b - 1 for b in part_b], np.int64)[:, None] * rows)
        assert int(pb.max()) < _U32_LIM
        col_tot = pb.sum(axis=0)
        direct = all(int(col_tot[k]) + out_b[k] <= _U32_LIM for k in range(n))
        for j in range(n_tail):
            trow = ft[:, row0 + j:row0 + j + 1]               # (n, 1)
            pj = part[j:j + 1] * trow                         # (n, T) exact
            if direct:
                out = out + pj
                for k in range(n):
                    out_b[k] += int(pb[j][k])
            else:
                out = out + (pj & _MASK)
                phi = pj >> BASE_BITS
                out = jnp.concatenate([out[:1], out[1:] + phi[:-1]], axis=0)
                top_b = int(pb[j][n - 1]) >> BASE_BITS
                if top_b > 0:
                    spill = phi[n - 1:n] if spill is None else spill + phi[n - 1:n]
                    spill_b += top_b
                for k in range(n):
                    out_b[k] += min(int(pb[j][k]), LIMB_MASK)
                    if k >= 1:
                        out_b[k] += int(pb[j][k - 1]) >> BASE_BITS
    if spill is not None:
        out = jnp.concatenate([out, spill], axis=0)
        out_b.append(spill_b)
    return out, out_b


def _normalize_k(c, bounds: Sequence[int], spec: FieldSpec, ft):
    bounds = list(bounds)
    n = spec.n_limbs
    guard = 0
    while not (len(bounds) == n and all(v <= _NF for v in bounds)):
        guard += 1
        assert guard < 32, f"kernel reduction plan failed: {bounds}"
        if len(bounds) > n:
            c, bounds = _fold_pass_k(c, bounds, spec, ft)
        else:
            c, bounds = _carry_pass_k(c, bounds)
    return c


def _diag_flat(a, b, n):
    """Schoolbook diagonal sum, flat accumulation: 2n full-height shifted
    adds into the (2n, T) accumulator."""
    c = jnp.zeros((2 * n,) + a.shape[1:], jnp.uint32)
    for i in range(n):
        pp = a[i:i + 1] * b                       # (n, T) exact in u32
        c = c + _shift_rows(pp & _MASK, i, 2 * n)
        c = c + _shift_rows(pp >> BASE_BITS, i + 1, 2 * n)
    return c


def _diag_tree(a, b, n):
    """Schoolbook diagonal sum, pairwise-tree accumulation: per-i lo/hi
    combine into an (n+1)-row block at offset i, then log2(n) levels of
    staggered block adds.  Touches ~n^2/2 add-rows total vs the flat
    form's ~2n^2 (zero-row padding grows only with the stagger, not the
    full 2n accumulator height).  Bit-identical to `_diag_flat` (exact
    commutative u32 adds of the same terms)."""
    zrow = jnp.zeros((1,) + a.shape[1:], jnp.uint32)
    parts, offs = [], []
    for i in range(n):
        pp = a[i:i + 1] * b                       # (n, T) exact in u32
        comb = (jnp.concatenate([pp & _MASK, zrow], axis=0)
                + jnp.concatenate([zrow, pp >> BASE_BITS], axis=0))
        parts.append(comb)                        # rows i .. i+n
        offs.append(i)
    while len(parts) > 1:
        nparts, noffs = [], []
        for j in range(0, len(parts) - 1, 2):
            x, y = parts[j], parts[j + 1]
            d = offs[j + 1] - offs[j]
            total = max(x.shape[0], d + y.shape[0])
            nparts.append(_shift_rows(x, 0, total) + _shift_rows(y, d, total))
            noffs.append(offs[j])
        if len(parts) % 2:
            nparts.append(parts[-1])
            noffs.append(offs[-1])
        parts, offs = nparts, noffs
    return _shift_rows(parts[0], offs[0], 2 * n)


def _diag_sum(a, b, n, diag):
    return _diag_tree(a, b, n) if diag == "tree" else _diag_flat(a, b, n)


def kmul(spec: FieldSpec, a, b, ft, diag: str = "flat"):
    """(N, T) x (N, T) -> (N, T), normal form, pure VPU ops.
    `ft` is the transposed fold table (N, N+2) — passed in (Pallas kernels
    cannot capture array constants).  `diag` selects the schoolbook
    accumulation schedule (bit-identical either way)."""
    n = spec.n_limbs
    c = _diag_sum(a, b, n, diag)
    return _normalize_k(c, _diag_bounds(n), spec, ft)


def kadd(spec: FieldSpec, a, b, ft):
    return _normalize_k(a + b, [2 * (_NF - 1) + 1] * spec.n_limbs, spec, ft)


def kneg_raw(spec: FieldSpec, a, neg2):
    """neg2: (N, 1) column of 2*neg_helper, passed in."""
    return neg2 - a, [2 * 0xFFFF + 1] * spec.n_limbs


def ksub(spec: FieldSpec, a, b, ft, neg2):
    nb, bounds = kneg_raw(spec, b, neg2)
    return _normalize_k(a + nb, [v + (_NF - 1) for v in bounds], spec, ft)


def kneg(spec: FieldSpec, a, ft, neg2):
    c, b = kneg_raw(spec, a, neg2)
    return _normalize_k(c, b, spec, ft)


def kmul_const(spec: FieldSpec, a, k: int, ft):
    assert 0 <= k * (_NF - 1) < _U32_LIM
    if k == 0:
        return jnp.zeros_like(a)
    if k == 1:
        return a
    return _normalize_k(a * jnp.uint32(k), [k * (_NF - 1) + 1] * spec.n_limbs,
                        spec, ft)


def fold_table_t(spec: FieldSpec) -> np.ndarray:
    """Transposed fold table (N, N+2) for passing into kernels."""
    return np.ascontiguousarray(spec.fold_table.T)


# ---------------------------------------------------------------------------
# MXU-form multiply: the schoolbook's anti-diagonal accumulation AND the
# fold reduction as exact f32 matmuls against constant matrices, inside the
# kernel.  Exactness argument (mirrors fp._mul_wide's XLA-side trick):
# every partial sum stays an integer < 2^24, the f32 mantissa — the
# diag-sum accumulates <= 2N terms of < 2^17 (< 2^22.7 total) and the fold
# matmul <= 4N terms of < 2^14 (< 2^20.7).  VPU work drops to the N
# row-products + piece extraction; the ~2x-the-schoolbook fold multiplies
# of `_fold_pass_k` disappear onto the (otherwise idle) MXU.
# ---------------------------------------------------------------------------

def _f32(x: jax.Array) -> jax.Array:
    """uint32 -> float32 via int32 (values < 2^31; Mosaic has no direct
    u32->f32 lowering on TPU)."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _u32(x: jax.Array) -> jax.Array:
    """float32 -> uint32 via int32 (exact integers < 2^31; Mosaic has no
    direct f32->u32 lowering on TPU)."""
    return x.astype(jnp.int32).astype(jnp.uint32)


def _pad_to(x: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), x.dtype)
    out[:x.shape[0], :x.shape[1]] = x
    return out


# tail pieces: 6-bit (tail column bounds stay < 2^24 = 4 pieces)
MXU_PIECE_BITS = 6
MXU_N_PIECES = 4


def mxu_tables(spec: FieldSpec) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(smat, fmat, k_pad, f_pad) constant matrices for `kmul_mxu`.

    smat (2N_pad8 x K_pad128) f32 0/1: anti-diagonal selector mapping the
    flattened (lo | hi) partial-product plane to the 2N product columns
    (lo block row-major (i, j) -> column i+j; hi -> column i+j+1).

    fmat (2N_pad8 x F_pad128) f32: fold matrix over 6-bit tail pieces.
    Column (q, jt) holds limb k of  2^(6q) * 2^(15*(N+jt)) mod p,  split
    into 8-bit halves: rows 0..N-1 = low byte, rows N..2N-1 = high byte
    (recombined in-kernel as lo + (hi << 8))."""
    n = spec.n_limbs
    k_dim = 2 * n * n
    smat = np.zeros((2 * n, k_dim), np.float32)
    for i in range(n):
        for j in range(n):
            smat[i + j, i * n + j] = 1.0
            smat[i + j + 1, n * n + i * n + j] = 1.0
    p = spec.p
    f_dim = MXU_N_PIECES * n
    fmat = np.zeros((2 * n, f_dim), np.float32)
    for q in range(MXU_N_PIECES):
        for jt in range(n):
            rep = (1 << (MXU_PIECE_BITS * q + BASE_BITS * (n + jt))) % p
            # rep as N base-2^15 limbs, each split 8/7
            for k in range(n):
                limb = (rep >> (BASE_BITS * k)) & LIMB_MASK
                fmat[k, q * n + jt] = float(limb & 0xFF)
                fmat[n + k, q * n + jt] = float(limb >> 8)
    k_pad = -(-k_dim // 128) * 128
    f_pad = -(-f_dim // 128) * 128
    rows = -(-2 * n // 8) * 8
    return (_pad_to(smat, rows, k_pad), _pad_to(fmat, rows, f_pad),
            k_pad, f_pad)


def _diag_bounds(n: int) -> list[int]:
    """Per-column bounds of the schoolbook diagonal sum (2n columns)."""
    lo_max, hi_max = LIMB_MASK, (_U32_LIM - 1) >> BASE_BITS
    bounds = []
    for k in range(2 * n):
        n_lo = max(0, min(k, n - 1) - max(0, k - n + 1) + 1)
        n_hi = max(0, min(k - 1, n - 1) - max(0, k - n) + 1)
        bounds.append(n_lo * lo_max + n_hi * hi_max + 1)
    return bounds


def _fold_tail_mxu(spec: FieldSpec, c, bounds, fmat, ft):
    """Fold the (2n, T) diag-sum `c` to normal form: tail pieces reduced by
    the exact-f32 fold matmul (`fmat` from `mxu_tables`), head combined on
    the VPU, then the static-bounds normalize."""
    n = spec.n_limbs
    t = c.shape[1]
    f_pad = fmat.shape[1]
    tail = c[n:]
    tail_bound = max(bounds[n:])
    assert tail_bound <= 1 << (MXU_PIECE_BITS * MXU_N_PIECES), tail_bound
    pieces = [_f32((tail >> (MXU_PIECE_BITS * q)) & ((1 << MXU_PIECE_BITS) - 1))
              for q in range(MXU_N_PIECES)]
    pvec = jnp.concatenate(pieces, axis=0)          # (4n, T)
    if pvec.shape[0] < f_pad:
        pvec = jnp.concatenate(
            [pvec, jnp.zeros((f_pad - pvec.shape[0], t), jnp.float32)],
            axis=0)
    g_f = jax.lax.dot_general(fmat, pvec, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    g = _u32(g_f[:2 * n])                           # sums < 2^20.7, exact
    out = c[:n] + g[:n] + (g[n:2 * n] << 8)
    # bounds: head + lo-byte sums + hi-byte sums << 8
    gmax = MXU_N_PIECES * n * ((1 << MXU_PIECE_BITS) - 1)
    out_bounds = [bounds[k] + gmax * 255 + ((gmax * 127) << 8)
                  for k in range(n)]
    assert all(bv < _U32_LIM for bv in out_bounds), out_bounds
    return _normalize_k(out, out_bounds, spec, ft)


def kmul_mxu(spec: FieldSpec, a, b, smat, fmat, ft):
    """(N, T) x (N, T) -> (N, T) normal form; value-identical to `kmul`
    mod p (the fold path differs, so redundant representatives may differ —
    bit-identical to `kmul_hybrid`, which shares the fold).
    `smat`/`fmat` from `mxu_tables`, `ft` = fold_table_t — all passed in
    (Pallas kernels cannot capture array constants)."""
    n = spec.n_limbs
    t = a.shape[1]
    k_pad = smat.shape[1]

    # partial products, f32 pieces (lo | hi), flattened row-major over (i, j)
    pp, hi = [], []
    for i in range(n):
        prod = a[i:i + 1] * b                       # (n, T) exact u32
        pp.append(_f32(prod & _MASK))
        hi.append(_f32(prod >> BASE_BITS))
    plane = jnp.concatenate(pp + hi, axis=0)        # (2n^2, T)
    if plane.shape[0] < k_pad:
        plane = jnp.concatenate(
            [plane, jnp.zeros((k_pad - plane.shape[0], t), jnp.float32)],
            axis=0)
    c_f = jax.lax.dot_general(smat, plane, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    c = _u32(c_f[:2 * n])                           # exact: sums < 2^22.7
    return _fold_tail_mxu(spec, c, _diag_bounds(n), fmat, ft)


def kmul_hybrid(spec: FieldSpec, a, b, fmat, ft, diag: str = "flat"):
    """(N, T) x (N, T) -> (N, T) normal form; bit-identical to `kmul_mxu`,
    value-identical to `kmul` mod p.

    Hybrid schedule: the schoolbook diagonal sum stays on the VPU as
    shifted u32 adds (as in `kmul` — the `smat` matmul of `kmul_mxu` burns
    ~2N·N^2 MXU MACs to realize columns with only TWO nonzeros each), while
    the tail fold rides the small exact-f32 `fmat` matmul (the part the VPU
    form pays ~2x the schoolbook for in `_fold_pass_k`)."""
    n = spec.n_limbs
    c = _diag_sum(a, b, n, diag)
    return _fold_tail_mxu(spec, c, _diag_bounds(n), fmat, ft)


def neg2_col(spec: FieldSpec) -> np.ndarray:
    """(N, 1) column of 2*neg_helper for passing into kernels."""
    return (spec.neg_helper.astype(np.uint32) * 2)[:, None]


def kconst(spec: FieldSpec, value: int, t: int):
    from .spec import limbs_from_int
    return jnp.broadcast_to(
        jnp.asarray(limbs_from_int(value % spec.p, spec.n_limbs))[:, None],
        (spec.n_limbs, t))
