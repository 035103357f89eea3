"""Packed Goldilocks arithmetic on (lo, hi) u32 plane pairs.

The specialized fast path for q = 2^64 - 2^32 + 1 (the prize2-ntt field):
elements are 64-bit values held as two u32 planes, reduced modulo q only
lazily (any value < 2^64 is a legal representative).  All ops are wrap-safe
u32 vector arithmetic with explicit carry/borrow compensation via the
identity 2^64 ≡ 2^32 - 1 (mod q) — the same shift-reduce structure the
FPGA entries exploit in RTL (`supranational rtl/ntt/ntt_butterfly.sv`,
hardcaml `gf.ml`), expressed as branch-free VPU ops.  Usable both in XLA
and inside Pallas kernel bodies (pure jnp on u32).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Q = (1 << 64) - (1 << 32) + 1
_M16 = np.uint32(0xFFFF)
_EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 ≡ 2^64 mod q


def _addc(a, b):
    """u32 wrap add with carry-out (0/1)."""
    s = a + b
    return s, (s < a).astype(jnp.uint32)


def _subb(a, b):
    """u32 wrap sub with borrow-out (0/1)."""
    d = a - b
    return d, (a < b).astype(jnp.uint32)


def add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out."""
    lo, c0 = _addc(alo, blo)
    hi1, c1 = _addc(ahi, bhi)
    hi, c2 = _addc(hi1, c0)
    return lo, hi, c1 + c2


def gl_add(alo, ahi, blo, bhi):
    """a + b (mod q), inputs/outputs any 64-bit representatives.
    A 2^64 wrap is compensated by adding eps = 2^32 - 1."""
    lo, hi, carry = add64(alo, ahi, blo, bhi)
    # + carry * eps; eps addition cannot re-carry past 2^64 twice:
    lo2, c0 = _addc(lo, carry * _EPS)
    hi2, c1 = _addc(hi, c0)
    # extremely rare second wrap (value was ≥ 2^64 - eps): compensate again
    lo3, c2 = _addc(lo2, (c1) * _EPS)
    hi3 = hi2 + c2
    return lo3, hi3


def gl_sub(alo, ahi, blo, bhi):
    """a - b (mod q): a 2^64 borrow is compensated by subtracting eps."""
    lo, b0 = _subb(alo, blo)
    hi1, b1 = _subb(ahi, bhi)
    hi, b2 = _subb(hi1, b0)
    borrow = b1 + b2
    lo2, b3 = _subb(lo, borrow * _EPS)
    hi2, b4 = _subb(hi, b3)
    lo3, b5 = _subb(lo2, b4 * _EPS)
    hi3 = hi2 - b5
    return lo3, hi3


def gl_mul(alo, ahi, blo, bhi):
    """a * b (mod q): 16-bit-piece schoolbook product to 128 bits, then the
    2^64 ≡ 2^32-1 / 2^96 ≡ -1 fold."""
    a = (alo & _M16, alo >> 16, ahi & _M16, ahi >> 16)
    b = (blo & _M16, blo >> 16, bhi & _M16, bhi >> 16)
    # column sums, base 2^16; each term < 2^16, ≤ 8 terms -> < 2^19
    cols = [None] * 8
    for i in range(4):
        for j in range(4):
            p = a[i] * b[j]                      # exact in u32
            lo16, hi16 = p & _M16, p >> 16
            k = i + j
            cols[k] = lo16 if cols[k] is None else cols[k] + lo16
            cols[k + 1] = hi16 if cols[k + 1] is None else cols[k + 1] + hi16
    # assemble four 32-bit words w0..w3 with sequential carries
    ws = []
    carry = jnp.zeros_like(alo)
    for k in range(0, 8, 2):
        lo_col = cols[k] + carry                 # < 2^19 + 2^4
        w, c_ov = _addc(lo_col, (cols[k + 1] & _M16) << 16)
        carry = (cols[k + 1] >> 16) + c_ov
        ws.append(w)
    w0, w1, w2, w3 = ws
    # n = A + B*2^64 + C*2^96, A = (w0, w1), B = w2, C = w3 (carry into C
    # from the last column is bounded and already folded into w3? no:
    # the final `carry` after w3 is the 2^128 part — impossible: product of
    # two 64-bit values < 2^128, w3 absorbs bits 96..127, carry must be 0.
    # n mod q = A - B - C + (B << 32)
    lo, hi = gl_sub(w0, w1, w2, jnp.zeros_like(w2))
    lo, hi = gl_sub(lo, hi, w3, jnp.zeros_like(w3))
    # + (B << 32) = value (0, w2)
    lo, hi = gl_add(lo, hi, jnp.zeros_like(w2), w2)
    return lo, hi


def gl_canon(lo, hi):
    """Canonical representative < q."""
    # value >= q iff hi == 2^32-1 and lo >= 1 ... q = (2^32-1)<<32 + 1
    ge = ((hi == _EPS) & (lo >= jnp.uint32(1))).astype(jnp.uint32)
    lo2, b = _subb(lo, ge * jnp.uint32(1))
    hi2 = hi - ge * _EPS - b
    return lo2, hi2


# ---- conversions to/from the generic 5-limb base-2^15 planes -------------


def from_limbs(spec, x):
    """Generic (..., 5) canonical limb plane -> (lo, hi) u32 pair."""
    from ..field import fp
    x = fp.to_canonical(spec, x)
    l0, l1, l2, l3, l4 = (x[..., i] for i in range(5))
    lo = l0 + (l1 << 15) + ((l2 & jnp.uint32(0x3)) << 30)
    hi = (l2 >> 2) + (l3 << 13) + (l4 << 28)
    return lo, hi


def to_limbs(spec, lo, hi):
    """(lo, hi) pair -> generic (..., 5) canonical plane."""
    lo, hi = gl_canon(lo, hi)
    m15 = jnp.uint32(0x7FFF)
    l0 = lo & m15
    l1 = (lo >> 15) & m15
    l2 = ((lo >> 30) | (hi << 2)) & m15
    l3 = (hi >> 13) & m15
    l4 = (hi >> 28) & m15
    return jnp.stack([l0, l1, l2, l3, l4], axis=-1)
