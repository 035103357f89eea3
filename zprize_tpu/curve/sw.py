"""Short-Weierstrass group law, branch-free and complete.

TPU-first design: the reference GPU entries use incomplete XYZZ formulas with
divergent special-case branches (`yrrid-msm/Curve.cu:515-1303`,
`sppark/ec/xyzz_t.hpp`) — fine on SIMT hardware where the rare branch is
cheap, hostile on a vector machine where every lane pays for every branch.
We instead use the Renes–Costello–Batina *complete* homogeneous-projective
formulas for a=0 curves (eprint 2015/1060, §4): one uniform instruction
sequence handles add, double, identity and inverse cases with zero
predication — the same "uniform formula" philosophy the FPGA entry applied
with its single pipelined twisted-Edwards adder
(`prize1b-msm-fpga/hardcaml/libs/twisted_edwards/mixed_add.ml`).

A point is a NamedTuple of three limb planes (X, Y, Z), shape (..., n_limbs)
each; the identity is (0 : 1 : 0).  All ops are vectorized over leading axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp
from ..field.spec import BASE_BITS
from .spec import CurveSpec


class Point(NamedTuple):
    """Homogeneous projective point; pytree of three (..., n_limbs) planes."""
    x: jax.Array
    y: jax.Array
    z: jax.Array

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


class Affine(NamedTuple):
    """Affine point with explicit infinity mask (batch-shaped bool)."""
    x: jax.Array
    y: jax.Array
    inf: jax.Array


def identity(curve: CurveSpec, shape=()) -> Point:
    f = curve.field
    return Point(fp.zeros(f, shape), fp.ones(f, shape), fp.zeros(f, shape))


def generator(curve: CurveSpec, shape=()) -> Point:
    f = curve.field
    return Point(fp.constant(f, curve.gen_x, shape),
                 fp.constant(f, curve.gen_y, shape),
                 fp.ones(f, shape))


def from_affine(curve: CurveSpec, a: Affine) -> Point:
    f = curve.field
    one = fp.ones(f, a.x.shape[:-1])
    zero = fp.zeros(f, a.x.shape[:-1])
    # infinity -> (0 : 1 : 0)
    return Point(fp.select(a.inf, zero, a.x),
                 fp.select(a.inf, one, a.y),
                 fp.select(a.inf, zero, one))


def neg(curve: CurveSpec, p: Point) -> Point:
    return Point(p.x, fp.neg(curve.field, p.y), p.z)


def add(curve: CurveSpec, p: Point, q: Point) -> Point:
    """Complete projective addition (RCB a=0): 12M + const-muls.

    X3 = (X1Y2+X2Y1)(Y1Y2-3bZ1Z2) - 3b(Y1Z2+Y2Z1)(X1Z2+X2Z1)
    Y3 = (Y1Y2+3bZ1Z2)(Y1Y2-3bZ1Z2) + 3b(3X1X2)(X1Z2+X2Z1)
    Z3 = (Y1Z2+Y2Z1)(Y1Y2+3bZ1Z2) + (X1Y2+X2Y1)(3X1X2)
    """
    f = curve.field
    b3 = curve.b3
    t0 = fp.mul(f, p.x, q.x)
    t1 = fp.mul(f, p.y, q.y)
    t2 = fp.mul(f, p.z, q.z)
    m_xy = fp.sub(f, fp.mul(f, fp.add(f, p.x, p.y), fp.add(f, q.x, q.y)),
                  fp.add(f, t0, t1))
    m_yz = fp.sub(f, fp.mul(f, fp.add(f, p.y, p.z), fp.add(f, q.y, q.z)),
                  fp.add(f, t1, t2))
    m_xz = fp.sub(f, fp.mul(f, fp.add(f, p.x, p.z), fp.add(f, q.x, q.z)),
                  fp.add(f, t0, t2))
    return _add_tail(curve, t0, t1, t2, m_xy, m_yz, m_xz)


def add_mixed(curve: CurveSpec, p: Point, a: Affine) -> Point:
    """Complete mixed addition p + a (11M); `a.inf` lanes pass `p` through."""
    f = curve.field
    t0 = fp.mul(f, p.x, a.x)
    t1 = fp.mul(f, p.y, a.y)
    t2 = p.z
    m_xy = fp.sub(f, fp.mul(f, fp.add(f, p.x, p.y), fp.add(f, a.x, a.y)),
                  fp.add(f, t0, t1))
    m_yz = fp.add(f, fp.mul(f, a.y, p.z), p.y)
    m_xz = fp.add(f, fp.mul(f, a.x, p.z), p.x)
    out = _add_tail(curve, t0, t1, t2, m_xy, m_yz, m_xz)
    keep = a.inf
    return Point(fp.select(keep, p.x, out.x),
                 fp.select(keep, p.y, out.y),
                 fp.select(keep, p.z, out.z))


def _add_tail(curve: CurveSpec, t0, t1, t2, m_xy, m_yz, m_xz) -> Point:
    f = curve.field
    u = fp.sub(f, t1, fp.mul_const(f, t2, curve.b3))
    v = fp.add(f, t1, fp.mul_const(f, t2, curve.b3))
    w = fp.mul_const(f, m_xz, curve.b3)
    t3 = fp.mul_const(f, t0, 3)
    x3 = fp.sub(f, fp.mul(f, m_xy, u), fp.mul(f, m_yz, w))
    y3 = fp.add(f, fp.mul(f, v, u), fp.mul(f, t3, w))
    z3 = fp.add(f, fp.mul(f, m_yz, v), fp.mul(f, m_xy, t3))
    return Point(x3, y3, z3)


def dbl(curve: CurveSpec, p: Point) -> Point:
    # Complete add handles doubling; dedicated 6M+2S doubling is a later
    # optimization (cf. RCB Algorithm 9).
    return add(curve, p, p)


def select(cond: jax.Array, p: Point, q: Point) -> Point:
    """cond ? p : q, per lane."""
    return Point(fp.select(cond, p.x, q.x),
                 fp.select(cond, p.y, q.y),
                 fp.select(cond, p.z, q.z))


def is_identity(curve: CurveSpec, p: Point) -> jax.Array:
    return fp.is_zero(curve.field, p.z)


def eq(curve: CurveSpec, p: Point, q: Point) -> jax.Array:
    """Projective equality by cross-multiplication."""
    f = curve.field
    same_x = fp.eq(f, fp.mul(f, p.x, q.z), fp.mul(f, q.x, p.z))
    same_y = fp.eq(f, fp.mul(f, p.y, q.z), fp.mul(f, q.y, p.z))
    pi, qi = is_identity(curve, p), is_identity(curve, q)
    return jnp.where(pi | qi, pi == qi, same_x & same_y)


def to_affine(curve: CurveSpec, p: Point) -> Affine:
    f = curve.field
    zinv = fp.inv(f, p.z)  # 0 -> 0: infinity lanes produce (0, 0)
    return Affine(fp.mul(f, p.x, zinv), fp.mul(f, p.y, zinv),
                  is_identity(curve, p))


def affine_neg(curve: CurveSpec, a: Affine) -> Affine:
    return Affine(a.x, fp.neg(curve.field, a.y), a.inf)


def is_on_curve(curve: CurveSpec, a: Affine) -> jax.Array:
    f = curve.field
    lhs = fp.mul(f, a.y, a.y)
    rhs = fp.add(f, fp.mul(f, fp.mul(f, a.x, a.x), a.x),
                 fp.constant(f, curve.b, a.x.shape[:-1]))
    return fp.eq(f, lhs, rhs) | a.inf


def get_scalar_bit(s: jax.Array, j) -> jax.Array:
    """Bit j (traced ok) of a limb-plane scalar; returns uint32 0/1."""
    limb = jnp.take_along_axis(
        s, jnp.broadcast_to(jnp.asarray(j // BASE_BITS, jnp.int32),
                            s.shape[:-1] + (1,)), axis=-1)[..., 0]
    return (limb >> jnp.asarray(j % BASE_BITS, jnp.uint32)) & jnp.uint32(1)


def mul_scalar(curve: CurveSpec, p: Point, s: jax.Array, nbits=None) -> Point:
    """Branch-free MSB-first double-and-add; s is a scalar-field limb plane
    (any redundant encoding — canonicalized here before bit extraction).

    Used for SRS generation and tests — NOT the MSM hot path (that is
    Pippenger in `msm/`)."""
    s = fp.to_canonical(curve.scalar, s)
    nbits = nbits or curve.scalar.p.bit_length()

    def body(i, acc):
        acc = dbl(curve, acc)
        bit = get_scalar_bit(s, nbits - 1 - i)
        return select(bit == 1, add(curve, acc, p), acc)

    return jax.lax.fori_loop(0, nbits, body,
                             identity(curve, p.batch_shape))


def mul_scalar_int(curve: CurveSpec, p: Point, k: int) -> Point:
    """k * P for a fixed non-negative python-int k (k may exceed the group
    order, e.g. the order itself for subgroup checks).  fori_loop over a
    constant bit table — small graph, branch-free."""
    assert k >= 0
    if k == 0:
        return identity(curve, p.batch_shape)
    nbits = k.bit_length()
    bits = jnp.asarray(np.array(
        [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.uint32))

    def body(i, acc):
        acc = Point(*acc)
        acc = dbl(curve, acc)
        return tuple(select(bits[i] == 1, add(curve, acc, p), acc))

    # MSB is 1, so the accumulator starts at P and the loop runs bits 1..n-1.
    out = jax.lax.fori_loop(1, nbits, body, tuple(Point(p.x, p.y, p.z)))
    return Point(*out)


def sum_points_scan(curve: CurveSpec, p: Point, axis: int = 0,
                    group: int = 256) -> Point:
    """Reduce points along `axis` with bounded trace size: a fori scan over
    slabs of `group` lanes (ONE traced add) followed by an unrolled tree over
    the final group (log2(group) traced adds).  Use instead of `sum_points`
    whenever the reduced length is large — same result, same total work,
    much smaller compiled graph."""
    p = Point(jnp.moveaxis(p.x, axis, 0), jnp.moveaxis(p.y, axis, 0),
              jnp.moveaxis(p.z, axis, 0))
    m = p.x.shape[0]
    if m <= 2 * group:
        out = sum_points(curve, p, axis=0)
        return out
    steps = -(-m // group)
    pad = steps * group - m
    if pad:
        idp = identity(curve, (pad,) + p.x.shape[1:-1])
        p = Point(jnp.concatenate([p.x, idp.x]), jnp.concatenate([p.y, idp.y]),
                  jnp.concatenate([p.z, idp.z]))
    rx = p.x.reshape(steps, group, *p.x.shape[1:])
    ry = p.y.reshape(steps, group, *p.y.shape[1:])
    rz = p.z.reshape(steps, group, *p.z.shape[1:])

    def body(t, acc):
        return tuple(add(curve, Point(*acc), Point(rx[t], ry[t], rz[t])))

    init = identity(curve, rx.shape[1:-1])
    acc = Point(*jax.lax.fori_loop(0, steps, body, tuple(init)))
    return sum_points(curve, acc, axis=0)


def sum_points(curve: CurveSpec, p: Point, axis: int = 0) -> Point:
    """Log-depth tree reduction of points along `axis` (any length)."""
    p = Point(jnp.moveaxis(p.x, axis, 0), jnp.moveaxis(p.y, axis, 0),
              jnp.moveaxis(p.z, axis, 0))
    m = p.x.shape[0]
    while m > 1:
        half = m // 2
        left = Point(p.x[:half], p.y[:half], p.z[:half])
        right = Point(p.x[half:2 * half], p.y[half:2 * half], p.z[half:2 * half])
        merged = add(curve, left, right)
        if m % 2:
            tail = Point(p.x[m - 1:m], p.y[m - 1:m], p.z[m - 1:m])
            merged = Point(jnp.concatenate([merged.x, tail.x]),
                           jnp.concatenate([merged.y, tail.y]),
                           jnp.concatenate([merged.z, tail.z]))
        p, m = merged, half + (m % 2)
    return Point(p.x[0], p.y[0], p.z[0])
