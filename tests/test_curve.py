"""Curve-law tests: parameters revalidated from scratch, group ops checked
against the python affine oracle including every degenerate case the complete
formulas must absorb (identity, doubling, inverse pairs)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zprize_tpu.curve import sw
from zprize_tpu.curve.spec import ALL_CURVES, BLS12_377_G1
from zprize_tpu.field import fp

import ec_ref

CURVE_IDS = [c.name for c in ALL_CURVES]


@pytest.mark.parametrize("curve", ALL_CURVES, ids=CURVE_IDS)
def test_params_revalidated(curve):
    """Don't trust the transcribed constants: recheck everything."""
    p, r, h = curve.field.p, curve.order, curve.cofactor
    # generator is on curve
    g = (curve.gen_x, curve.gen_y)
    assert ec_ref.on_curve(g, p, curve.b), "generator not on curve"
    # |#E - (p+1)| <= 2 sqrt(p)  (Hasse), with #E = h*r
    t = p + 1 - h * r
    assert t * t <= 4 * p, "h*r violates the Hasse bound"
    # generator has order r
    assert ec_ref.ec_mul(g, r, p) is None, "generator order is not r"
    assert ec_ref.ec_mul(g, 2, p) is not None


def _to_affine_tuples(curve, pt: sw.Point):
    aff = sw.to_affine(curve, pt)
    xs = fp.to_ints(curve.field, aff.x)
    ys = fp.to_ints(curve.field, aff.y)
    infs = np.asarray(aff.inf)
    out = []
    for i in range(len(xs.reshape(-1))):
        if infs.reshape(-1)[i]:
            out.append(None)
        else:
            out.append((int(xs.reshape(-1)[i]), int(ys.reshape(-1)[i])))
    return out


def _affine_batch(curve, tuples):
    """python [(x,y) | None] -> device Affine batch."""
    xs = [0 if t is None else t[0] for t in tuples]
    ys = [1 if t is None else t[1] for t in tuples]
    infs = [t is None for t in tuples]
    return sw.Affine(fp.from_ints(curve.field, xs),
                     fp.from_ints(curve.field, ys),
                     jnp.asarray(np.array(infs)))


@pytest.mark.parametrize("curve", ALL_CURVES, ids=CURVE_IDS)
def test_add_matches_oracle(curve):
    prime = curve.field.p
    pts = ec_ref.random_subgroup_points(curve, 6, seed=3)
    g = (curve.gen_x, curve.gen_y)
    # pairs including every degenerate combination
    pairs = [
        (pts[0], pts[1]), (pts[2], pts[3]),
        (pts[4], pts[4]),                       # doubling through add
        (pts[5], ec_ref.ec_neg(pts[5], prime)),  # P + (-P) = identity
        (None, pts[0]), (pts[1], None), (None, None),
        (g, g),
    ]
    a_batch = _affine_batch(curve, [x for x, _ in pairs])
    b_batch = _affine_batch(curve, [y for _, y in pairs])
    got = sw.add(curve, sw.from_affine(curve, a_batch),
                 sw.from_affine(curve, b_batch))
    got_aff = _to_affine_tuples(curve, got)
    for i, (x, y) in enumerate(pairs):
        expect = ec_ref.ec_add(x, y, prime)
        assert got_aff[i] == expect, f"add case {i} mismatch"
    # mixed addition against the same cases (affine rhs)
    got_mixed = sw.add_mixed(curve, sw.from_affine(curve, a_batch), b_batch)
    got_mixed_aff = _to_affine_tuples(curve, got_mixed)
    for i, (x, y) in enumerate(pairs):
        expect = ec_ref.ec_add(x, y, prime)
        assert got_mixed_aff[i] == expect, f"mixed add case {i} mismatch"


@pytest.mark.parametrize("curve", ALL_CURVES, ids=CURVE_IDS)
def test_dbl_neg_eq(curve):
    prime = curve.field.p
    pts = ec_ref.random_subgroup_points(curve, 4, seed=9)
    batch = _affine_batch(curve, pts)
    proj = sw.from_affine(curve, batch)
    got_dbl = _to_affine_tuples(curve, sw.dbl(curve, proj))
    for i, p in enumerate(pts):
        assert got_dbl[i] == ec_ref.ec_add(p, p, prime)
    got_neg = _to_affine_tuples(curve, sw.neg(curve, proj))
    for i, p in enumerate(pts):
        assert got_neg[i] == ec_ref.ec_neg(p, prime)
    # eq: P == P (different projective scalings), P != Q
    doubled = sw.dbl(curve, proj)
    same = sw.eq(curve, sw.add(curve, proj, proj), doubled)
    assert bool(jnp.all(same))
    assert not bool(jnp.any(sw.eq(curve, proj, doubled)))


@pytest.mark.parametrize("curve", [BLS12_377_G1], ids=["bls377"])
def test_mul_scalar_and_sum(curve):
    prime = curve.field.p
    rng = random.Random(17)
    pts = ec_ref.random_subgroup_points(curve, 4, seed=21)
    scalars = [rng.randrange(curve.order) for _ in pts]
    batch = _affine_batch(curve, pts)
    proj = sw.from_affine(curve, batch)
    s = fp.from_ints(curve.scalar, scalars)
    got = _to_affine_tuples(curve, sw.mul_scalar(curve, proj, s))
    for i, (p, k) in enumerate(zip(pts, scalars)):
        assert got[i] == ec_ref.ec_mul(p, k, prime), f"scalar mul {i}"
    # sum_points over an odd-length axis
    total = sw.sum_points(curve, proj, axis=0)
    expect = None
    for p in pts:
        expect = ec_ref.ec_add(expect, p, prime)
    assert _to_affine_tuples(curve, sw.Point(
        total.x[None], total.y[None], total.z[None]))[0] == expect


@pytest.mark.parametrize("curve", [BLS12_377_G1], ids=["bls377"])
def test_subgroup_order_on_device(curve):
    """r * G == identity computed entirely on device."""
    g = sw.generator(curve, (1,))
    r_limbs = fp.from_ints(curve.scalar, [0])  # r ≡ 0 mod r — encode r-1 then add G
    rm1 = fp.from_ints(curve.scalar, [curve.order - 1])
    acc = sw.mul_scalar(curve, g, rm1)
    acc = sw.add(curve, acc, g)
    assert bool(jnp.all(sw.is_identity(curve, acc)))
