"""Native host library tests: C++ Montgomery/EC path vs the python oracle."""

import pytest

from zprize_tpu.curve.spec import BLS12_377_G1, BLS12_381_G1
from zprize_tpu.utils import native

import ec_ref

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("curve", [BLS12_377_G1, BLS12_381_G1],
                         ids=["377", "381"])
def test_point_chain_matches_oracle(curve):
    pts = native.point_chain(curve, 0, 8)
    g = (curve.gen_x, curve.gen_y)
    acc = None
    for i, pt in enumerate(pts):
        acc = ec_ref.ec_add(acc, g, curve.field.p)
        assert pt == acc, f"chain point {i} mismatch"


def test_point_chain_offset():
    curve = BLS12_377_G1
    pts = native.point_chain(curve, 5, 3)
    g = (curve.gen_x, curve.gen_y)
    for i, pt in enumerate(pts):
        assert pt == ec_ref.ec_mul(g, 6 + i, curve.field.p)


def test_scalar_mul_oracle():
    curve = BLS12_377_G1
    g = (curve.gen_x, curve.gen_y)
    k = 0xDEADBEEF_12345678_90ABCDEF
    assert native.scalar_mul(curve, *g, k) == ec_ref.ec_mul(g, k, curve.field.p)
    assert native.scalar_mul(curve, *g, curve.order) is None


def test_host_combine_windows():
    curve = BLS12_377_G1
    p = curve.field.p
    g = (curve.gen_x, curve.gen_y)
    # windows W_w = (w+1) * G as projective (z=1); combined = sum (w+1) 2^(4w) G
    wins = [(pt[0], pt[1], 1) for pt in
            [ec_ref.ec_mul(g, w + 1, p) for w in range(3)]]
    got = native.host_combine_windows(curve, wins, 4)
    k = sum((w + 1) << (4 * w) for w in range(3))
    assert got == ec_ref.ec_mul(g, k, p)


def test_serialization_roundtrip():
    curve = BLS12_377_G1
    pts = native.point_chain(curve, 0, 4) + [None]
    data = native.serialize_points(curve, pts)
    assert len(data) == 5 * 96
    back = native.deserialize_points(curve, data)
    assert back == pts
