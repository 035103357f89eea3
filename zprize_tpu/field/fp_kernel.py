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


def kmul(spec: FieldSpec, a, b, ft):
    """(N, T) x (N, T) -> (N, T), normal form, pure VPU ops.
    `ft` is the transposed fold table (N, N+2) — passed in (Pallas kernels
    cannot capture array constants)."""
    n = spec.n_limbs
    c = jnp.zeros((2 * n,) + a.shape[1:], jnp.uint32)
    for i in range(n):
        pp = a[i:i + 1] * b                       # (n, T) exact in u32
        c = c + _shift_rows(pp & _MASK, i, 2 * n)
        c = c + _shift_rows(pp >> BASE_BITS, i + 1, 2 * n)
    lo_max, hi_max = LIMB_MASK, (_U32_LIM - 1) >> BASE_BITS
    bounds = []
    for k in range(2 * n):
        n_lo = max(0, min(k, n - 1) - max(0, k - n + 1) + 1)
        n_hi = max(0, min(k - 1, n - 1) - max(0, k - n) + 1)
        bounds.append(n_lo * lo_max + n_hi * hi_max + 1)
    return _normalize_k(c, bounds, spec, ft)


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


def neg2_col(spec: FieldSpec) -> np.ndarray:
    """(N, 1) column of 2*neg_helper for passing into kernels."""
    return (spec.neg_helper.astype(np.uint32) * 2)[:, None]


def kconst(spec: FieldSpec, value: int, t: int):
    from .spec import limbs_from_int
    return jnp.broadcast_to(
        jnp.asarray(limbs_from_int(value % spec.p, spec.n_limbs))[:, None],
        (spec.n_limbs, t))
