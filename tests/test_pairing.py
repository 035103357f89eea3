"""Pairing tower tests: parameter validation, bilinearity, KZG soundness.

Oracle chain: the G2/tower parameters are revalidated from scratch (twist
equation, subgroup order), then the pairing is checked by its defining
properties (bilinearity, non-degeneracy, GT order) — the same strategy the
reference applies to its curve constants (`snarkVM curves/src/bls12_377/
tests.rs`) without importing any reference code.
"""

import pytest

from zprize_tpu.pairing.host import g1_add, g1_mul, g1_neg, host_pairing
from zprize_tpu.pairing.params import (ALL_PAIRINGS, BLS12_377_PAIRING,
                                       BLS12_381_PAIRING)


@pytest.mark.parametrize("spec", ALL_PAIRINGS, ids=lambda s: s.name)
def test_g2_parameters(spec):
    hp = host_pairing(spec)
    g2 = hp.g2_gen
    assert hp.g2_is_on_curve(g2)
    # twist coefficient consistency: b' = b/xi (D) or b*xi (M)
    xi = hp.xi
    b = spec.curve.b
    if spec.twist_type == "D":
        expect = hp.f2_mul((b, 0), hp.f2_inv(xi))
    else:
        expect = hp.f2_muli(xi, b)
    assert expect == (spec.g2_b[0] % spec.p, spec.g2_b[1] % spec.p)
    # prime-order subgroup
    assert hp.g2_mul(g2, spec.r) is None
    assert hp.g2_mul(g2, 12345) is not None


@pytest.mark.parametrize("spec", ALL_PAIRINGS, ids=lambda s: s.name)
def test_pairing_bilinear(spec):
    hp = host_pairing(spec)
    p_mod = spec.p
    g1 = (spec.curve.gen_x, spec.curve.gen_y)
    g2 = hp.g2_gen
    e = hp.pairing(g1, g2)
    assert e != hp.one, "degenerate pairing"
    assert hp.pow(e, spec.r) == hp.one, "GT element has wrong order"
    a, b = 987654321987654321, 123456789123456789
    lhs = hp.pairing(g1_mul(p_mod, g1, a), hp.g2_mul(g2, b))
    assert lhs == hp.pow(e, a * b % spec.r)
    # e(aP, Q) * e(-aP, Q) == 1 via shared final exp
    ap = g1_mul(p_mod, g1, a)
    assert hp.multi_pairing_is_one([(ap, g2), (g1_neg(p_mod, ap), g2)])
    assert not hp.multi_pairing_is_one([(ap, g2), (g1, g2)])


def test_kzg_pairing_verify():
    """Real pairing-based KZG verify accepts a valid opening and rejects a
    tampered one (trapdoor path kept as the cross-check)."""
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.field import fp
    from zprize_tpu.pcs import kzg

    curve = BLS12_377_G1
    srs = kzg.setup_test_srs(curve, 8, seed=11)
    coeffs = fp.from_ints(curve.scalar, [5, 3, 0, 7, 1, 0, 2, 9])
    com = kzg.commit(srs, coeffs, c=5)
    z = fp.constant(curve.scalar, 4242)
    w, y = kzg.open_at(srs, coeffs, z)
    assert kzg.verify_with_trapdoor(srs, com, z, y, w)
    assert kzg.verify(srs, com, z, y, w)
    y_bad = fp.add(curve.scalar, y, fp.ones(curve.scalar))
    assert not kzg.verify(srs, com, z, y_bad, w)
    # wrong witness point
    w_bad = kzg.commit(srs, fp.from_ints(curve.scalar, [1, 2, 3]), c=4)
    assert not kzg.verify(srs, com, z, y, w_bad)
