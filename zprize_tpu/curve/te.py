"""Twisted-Edwards (a = -1, extended coordinates) fast path for the MSM
bucket accumulation.

The FPGA reference entry converts BLS12-377 G1 points from short-Weierstrass
to a *scaled* twisted-Edwards curve so its pipelined adder needs only
7M + 8A per unified mixed add (`prize1b-msm-fpga/hardcaml/zprize/
msm_pippenger/docs/optimizing_point_representation.md`, mixed adder
`hardcaml/libs/twisted_edwards/mixed_add.ml`).  The same trade is even
better on a vector machine: the unified formulas are branch-free AND
strongly unified (identity/doubling need no select at all), so the hot
kernel drops from 11 muls + 3 const-muls + lane select (RCB complete
Weierstrass, `sw.add_mixed`) to 7 muls.

Chain (standard, as documented in the reference doc above + EFD):

  SW  y^2 = x^3 + b          (a = 0, alpha = a cube root of -b)
  ->  Montgomery  B v^2 = u^3 + A u^2 + u
        u = s (x - alpha), v = s y,  s = 1/sqrt(3 alpha^2), A = 3 alpha s
  ->  twisted Edwards  a_te X^2 + Y^2 = 1 + d_te X^2 Y^2
        X = u / v, Y = (u - 1)/(u + 1)
        a_te = (A + 2)/B, d_te = (A - 2)/B
  ->  scaled twisted Edwards (a = -1)
        X' = ts X,  ts = sqrt(-a_te),  d = -d_te / a_te

Precomputed-affine form of a point (X, Y): (Y+X, Y-X, 2d·X·Y) — the three
planes the accumulate kernel gathers (identity = (1, 1, 0)).

Exceptional points (Montgomery v = 0 or u = -1; five points on the full
BLS12-377 curve, none expected in G1 — reference doc "it's unclear if these
points lie in the G1 subgroup") are detected at conversion and reported via
a mask; `pippenger.msm` raises loudly rather than corrupting a result.

All constants are DERIVED here (Tonelli–Shanks on the host) and validated
by the test-suite against the SW group law — nothing is copied.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..field import fp
from .spec import CurveSpec


# ---------------------------------------------------------------------------
# host-side parameter derivation
# ---------------------------------------------------------------------------


def _sqrt_mod(a: int, p: int) -> int | None:
    """Tonelli–Shanks; None if a is a non-residue."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general case
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


class TeParams(NamedTuple):
    curve: CurveSpec
    alpha: int      # 2-torsion x-coordinate (root of x^3 + b)
    s: int          # Montgomery scale
    mont_a: int
    ts: int         # x-scale onto the a=-1 curve
    d: int          # TE d parameter (a = -1)
    k: int          # 2d (folded into the precomputed T plane)

    def __hash__(self):
        return hash((self.curve.name, self.d))


@functools.lru_cache(maxsize=None)
def te_params(curve: CurveSpec) -> TeParams:
    """Derive the scaled-TE parameters for an a=0 SW curve whose -b is a
    cube with a 2-torsion point over Fp (true for BLS12-377 G1, b=1,
    alpha=-1).  Raises if any required root is missing."""
    p = curve.field.p
    b = curve.b % p
    # alpha: root of x^3 + b = 0. For b=1 alpha = -1; otherwise search the
    # three cube roots of -b via the cubic-residue structure.
    alpha = None
    if pow(p - b, (p - 1) // 3, p) == 1 if p % 3 == 1 else True:
        # x^3 = -b solvable; find a root deterministically
        if b == 1:
            alpha = p - 1
        else:
            # p = 1 mod 3: cube roots via x = (-b)^((2p-1)/9)-style exponents
            # only needed for curves beyond BLS12-377; handle the easy case
            # p = 2 mod 3 (cubing is a bijection).
            if p % 3 == 2:
                alpha = pow(p - b, (2 * p - 1) // 3, p)
    if alpha is None or (pow(alpha, 3, p) + b) % p != 0:
        raise ValueError(f"no rational 2-torsion for curve {curve.name}")
    s_inv = _sqrt_mod(3 * alpha * alpha % p, p)
    if s_inv is None:
        raise ValueError(f"sqrt(3 alpha^2) does not exist for {curve.name}")
    s = pow(s_inv, p - 2, p)
    mont_a = 3 * alpha * s % p
    mont_b = s
    binv = pow(mont_b, p - 2, p)
    a_te = (mont_a + 2) * binv % p
    d_te = (mont_a - 2) * binv % p
    ts = _sqrt_mod(p - a_te, p)
    if ts is None:
        raise ValueError(f"-a_te is a non-residue for {curve.name}")
    d = (p - d_te) * pow(a_te, p - 2, p) % p
    return TeParams(curve, alpha, s, mont_a, ts, d, 2 * d % p)


# ---------------------------------------------------------------------------
# point containers
# ---------------------------------------------------------------------------


class TePoint(NamedTuple):
    """Extended (a=-1) twisted-Edwards point (X : Y : Z : T), T = XY/Z."""
    x: jax.Array
    y: jax.Array
    z: jax.Array
    t: jax.Array

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


class TePre(NamedTuple):
    """Precomputed-affine operand: (Y+X, Y-X, 2d·X·Y); identity=(1,1,0)."""
    yp: jax.Array
    ym: jax.Array
    kt: jax.Array


def identity(curve: CurveSpec, shape=()) -> TePoint:
    f = curve.field
    return TePoint(fp.zeros(f, shape), fp.ones(f, shape),
                   fp.ones(f, shape), fp.zeros(f, shape))


def identity_pre(curve: CurveSpec, shape=()) -> TePre:
    f = curve.field
    return TePre(fp.ones(f, shape), fp.ones(f, shape), fp.zeros(f, shape))


def select(cond, a: TePoint, b: TePoint) -> TePoint:
    return TePoint(*(fp.select(cond, x, y) for x, y in zip(a, b)))


def neg_pre(curve: CurveSpec, q: TePre) -> TePre:
    """-(X, Y) = (-X, Y): swaps the (Y+X, Y-X) planes, negates the T plane."""
    return TePre(q.ym, q.yp, fp.neg(curve.field, q.kt))


def select_neg_pre(curve: CurveSpec, sign, q: TePre) -> TePre:
    """Lane select of q / -q (sign broadcast over the limb axis)."""
    return TePre(fp.select(sign, q.ym, q.yp),
                 fp.select(sign, q.yp, q.ym),
                 fp.select(sign, fp.neg(curve.field, q.kt), q.kt))


# ---------------------------------------------------------------------------
# group law (XLA form; the Pallas kernel form mirrors these in
# msm/accum_kernel.py — keep in lockstep)
# ---------------------------------------------------------------------------


def add_mixed(curve: CurveSpec, p1: TePoint, q: TePre) -> TePoint:
    """Strongly-unified mixed add (madd-2008-hwcd-3, a=-1): 7M + 8A.
    Handles doubling and either-operand-identity with no selects."""
    f = curve.field
    a = fp.mul(f, fp.sub(f, p1.y, p1.x), q.ym)
    b = fp.mul(f, fp.add(f, p1.y, p1.x), q.yp)
    c = fp.mul(f, p1.t, q.kt)
    d = fp.double(f, p1.z)
    e = fp.sub(f, b, a)
    ff = fp.sub(f, d, c)
    g = fp.add(f, d, c)
    h = fp.add(f, b, a)
    return TePoint(fp.mul(f, e, ff), fp.mul(f, g, h),
                   fp.mul(f, ff, g), fp.mul(f, e, h))


def add(curve: CurveSpec, p1: TePoint, p2: TePoint) -> TePoint:
    """Strongly-unified full add (add-2008-hwcd-3, a=-1): 8M + 1k + 8A."""
    f = curve.field
    k = te_params(curve).k
    a = fp.mul(f, fp.sub(f, p1.y, p1.x), fp.sub(f, p2.y, p2.x))
    b = fp.mul(f, fp.add(f, p1.y, p1.x), fp.add(f, p2.y, p2.x))
    c = fp.mul(f, fp.mul(f, p1.t, p2.t), fp.constant(f, k))
    d = fp.double(f, fp.mul(f, p1.z, p2.z))
    e = fp.sub(f, b, a)
    ff = fp.sub(f, d, c)
    g = fp.add(f, d, c)
    h = fp.add(f, b, a)
    return TePoint(fp.mul(f, e, ff), fp.mul(f, g, h),
                   fp.mul(f, ff, g), fp.mul(f, e, h))


def dbl(curve: CurveSpec, p1: TePoint) -> TePoint:
    """dbl-2008-hwcd (a=-1): 4M + 4S + 1 double."""
    f = curve.field
    a = fp.sqr(f, p1.x)
    b = fp.sqr(f, p1.y)
    c = fp.double(f, fp.sqr(f, p1.z))
    d = fp.neg(f, a)                                   # a = -1
    e = fp.sub(f, fp.sqr(f, fp.add(f, p1.x, p1.y)), fp.add(f, a, b))
    g = fp.add(f, d, b)
    ff = fp.sub(f, g, c)
    h = fp.sub(f, d, b)
    return TePoint(fp.mul(f, e, ff), fp.mul(f, g, h),
                   fp.mul(f, ff, g), fp.mul(f, e, h))


def is_identity(curve: CurveSpec, p1: TePoint) -> jax.Array:
    f = curve.field
    return jnp.logical_and(fp.is_zero(f, p1.x),
                           fp.eq(f, p1.y, p1.z))


# ---------------------------------------------------------------------------
# SW <-> TE conversions (batched, device)
# ---------------------------------------------------------------------------


def sw_to_te(curve: CurveSpec, x, y, inf):
    """SW affine planes -> (te_x, te_y, bad) affine TE planes.

    bad marks exceptional lanes (Montgomery v = 0 or u = -1) that have no
    TE image; callers must check it (identity lanes are NOT bad — they map
    to the TE identity (0, 1)).  One fused batched inversion."""
    f = curve.field
    pr = te_params(curve)
    s = fp.constant(f, pr.s)
    alpha = fp.constant(f, pr.alpha)
    u = fp.mul(f, s, fp.sub(f, x, alpha))
    v = fp.mul(f, s, y)
    up1 = fp.add(f, u, fp.ones(f))
    # te_x = ts * u / v, te_y = (u-1)/(u+1); invert v*(u+1) once
    bad = jnp.logical_and(~inf,
                          jnp.logical_or(fp.is_zero(f, v),
                                         fp.is_zero(f, up1)))
    denom = fp.mul(f, v, up1)
    # guard exceptional/identity lanes with denom=1 to keep inv defined
    denom = fp.select(jnp.logical_or(bad, inf), fp.ones(f, denom.shape[:-1]),
                      denom)
    dinv = fp.batch_inv(f, denom.reshape(-1, denom.shape[-1])).reshape(
        denom.shape)
    te_x = fp.mul(f, fp.mul(f, fp.constant(f, pr.ts), u),
                  fp.mul(f, up1, dinv))
    te_y = fp.mul(f, fp.sub(f, u, fp.ones(f)), fp.mul(f, v, dinv))
    zero = fp.zeros(f, te_x.shape[:-1])
    one = fp.ones(f, te_x.shape[:-1])
    te_x = fp.select(inf, zero, te_x)
    te_y = fp.select(inf, one, te_y)
    return te_x, te_y, bad


def precompute(curve: CurveSpec, te_x, te_y) -> TePre:
    """Affine TE -> precomputed accumulate operand (Y+X, Y-X, 2d·X·Y)."""
    f = curve.field
    pr = te_params(curve)
    return TePre(fp.add(f, te_y, te_x), fp.sub(f, te_y, te_x),
                 fp.mul(f, fp.constant(f, pr.k), fp.mul(f, te_x, te_y)))


def te_to_sw(curve: CurveSpec, p1: TePoint):
    """Extended TE -> SW projective `sw.Point` (single/few points; used on
    the MSM result).  Identity maps to (0 : 1 : 0)."""
    from . import sw
    f = curve.field
    pr = te_params(curve)
    zinv = fp.inv(f, fp.select(is_identity(curve, p1),
                               fp.ones(f, p1.z.shape[:-1]), p1.z))
    ax = fp.mul(f, p1.x, zinv)
    ay = fp.mul(f, p1.y, zinv)
    # unscale: X_plain = ax / ts
    x_plain = fp.mul(f, ax, fp.constant(f, pow(pr.ts, f.p - 2, f.p)))
    # TE -> Montgomery: u = (1+y)/(1-y), v = u/x
    one = fp.ones(f, ax.shape[:-1])
    num = fp.add(f, one, ay)
    den = fp.sub(f, one, ay)
    ident = is_identity(curve, p1)
    den = fp.select(ident, one, den)
    xp_safe = fp.select(jnp.logical_or(ident, fp.is_zero(f, x_plain)),
                        one, x_plain)
    dinv = fp.inv(f, fp.mul(f, den, xp_safe))          # 1/(den * x)
    u = fp.mul(f, fp.mul(f, num, xp_safe), dinv)       # num/den
    v = fp.mul(f, num, dinv)                           # num/(den*x) = u/x
    # Montgomery -> SW: x = u/s + alpha, y = v/s
    sinv = fp.constant(f, pow(pr.s, f.p - 2, f.p))
    sx = fp.add(f, fp.mul(f, u, sinv), fp.constant(f, pr.alpha))
    sy = fp.mul(f, v, sinv)
    zero = fp.zeros(f, ax.shape[:-1])
    return sw.Point(fp.select(ident, zero, sx),
                    fp.select(ident, one, sy),
                    fp.select(ident, zero, one))


def te_to_sw_host(curve: CurveSpec, x: int, y: int, z: int
                  ) -> tuple[int, int, int]:
    """Exact host-int TE->SW conversion of ONE point (the MSM result):
    the device form (`te_to_sw`) costs two ~380-squaring Fermat ladders of
    latency-bound scalar ops (~100 ms through the dispatch tunnel for a
    single lane); three python modular inverses are microseconds.  Returns
    SW projective (x, y, z) with z in {0, 1}."""
    pr = te_params(curve)
    p = curve.field.p
    x, y, z = x % p, y % p, z % p
    if x == 0 and y == z:
        return (0, 1, 0)                         # identity
    zinv = pow(z, p - 2, p)
    ax, ay = x * zinv % p, y * zinv % p
    x_plain = ax * pow(pr.ts, p - 2, p) % p
    if x_plain == 0:                             # TE (0,-1): the 2-torsion
        return (pr.alpha, 0, 1)
    num, den = (1 + ay) % p, (1 - ay) % p
    u = num * pow(den, p - 2, p) % p             # den != 0 off-identity
    v = u * pow(x_plain, p - 2, p) % p
    sinv = pow(pr.s, p - 2, p)
    return ((u * sinv + pr.alpha) % p, v * sinv % p, 1)


def sum_scan(curve: CurveSpec, p1: TePoint, axis: int = 0,
             group: int = 256) -> TePoint:
    """Tree/scan reduction along `axis` with bounded trace size (TE analog
    of `sw.sum_points_scan`)."""
    n = p1.x.shape[axis]
    if axis != 0:
        p1 = TePoint(*(jnp.moveaxis(a, axis, 0) for a in p1))
    # pad to even tree
    while n > 1:
        half = n // 2
        if n % 2:
            a = TePoint(*(x[: half + 1] for x in p1))
            b0 = TePoint(*(x[half + 1:] for x in p1))
            pad = identity(curve, (1,) + p1.x.shape[1:-1])
            b = TePoint(*(jnp.concatenate([u, v], axis=0)
                          for u, v in zip(b0, pad)))
        else:
            a = TePoint(*(x[:half] for x in p1))
            b = TePoint(*(x[half:] for x in p1))
        p1 = add(curve, a, b)
        n = p1.x.shape[0]
    return TePoint(*(x[0] for x in p1))
