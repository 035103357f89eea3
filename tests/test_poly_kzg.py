"""Polynomial-layer and KZG tests against python-int polynomial algebra."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR
from zprize_tpu.pcs import kzg
from zprize_tpu.poly import ops as poly_ops

import ec_ref

SPEC = BLS12_377_FR
P = SPEC.p


def rand_poly(n, rng):
    return [rng.randrange(P) for _ in range(n)]


def test_poly_mul_matches_schoolbook():
    rng = random.Random(2)
    a, b = rand_poly(7, rng), rand_poly(12, rng)
    got = fp.to_ints(SPEC, poly_ops.mul(SPEC, fp.from_ints(SPEC, a),
                                        fp.from_ints(SPEC, b)))
    expect = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            expect[i + j] = (expect[i + j] + x * y) % P
    assert [int(v) for v in got] == expect


def test_evaluate_and_powers():
    rng = random.Random(4)
    a = rand_poly(13, rng)
    z = rng.randrange(P)
    got = fp.to_ints(SPEC, poly_ops.evaluate(
        SPEC, fp.from_ints(SPEC, a), fp.from_ints(SPEC, [z])[0]))
    expect = sum(c * pow(z, i, P) for i, c in enumerate(a)) % P
    assert int(got[()]) == expect


def test_divide_linear():
    rng = random.Random(6)
    for n in (2, 5, 16):
        a = rand_poly(n, rng)
        z = rng.randrange(P)
        q, r = poly_ops.divide_linear(SPEC, fp.from_ints(SPEC, a),
                                      fp.from_ints(SPEC, [z])[0])
        q_ints = [int(v) for v in fp.to_ints(SPEC, q)]
        r_int = int(fp.to_ints(SPEC, r)[()])
        # verify a(X) == q(X)*(X-z) + r by coefficient reconstruction
        recon = [0] * n
        for i, qc in enumerate(q_ints):
            recon[i + 1] = (recon[i + 1] + qc) % P
            recon[i] = (recon[i] - qc * z) % P
        recon[0] = (recon[0] + r_int) % P
        assert recon == [x % P for x in a]
        # remainder is a(z)
        assert r_int == sum(c * pow(z, i, P) for i, c in enumerate(a)) % P


def test_kzg_commit_open_verify():
    from zprize_tpu.curve.spec import BLS12_377_G1
    rng = random.Random(8)
    srs = kzg.setup_test_srs(BLS12_377_G1, 16, seed=1)
    # SRS sanity: powers are tau^i * G per the oracle
    g = (BLS12_377_G1.gen_x, BLS12_377_G1.gen_y)
    for i in (0, 1, 5):
        expect = ec_ref.ec_mul(g, pow(srs.tau, i, BLS12_377_G1.order),
                               BLS12_377_G1.field.p)
        got = (int(fp.to_ints(BLS12_377_G1.field, srs.g1_powers.x[i])[()]),
               int(fp.to_ints(BLS12_377_G1.field, srs.g1_powers.y[i])[()]))
        assert got == expect

    coeffs_int = rand_poly(13, rng)
    coeffs = fp.from_ints(SPEC, coeffs_int)
    com = kzg.commit(srs, coeffs, c=5)
    z_int = rng.randrange(P)
    z = fp.from_ints(SPEC, [z_int])[0]
    w, y = kzg.open_at(srs, coeffs, z)
    assert int(fp.to_ints(SPEC, y)[()]) == \
        sum(c * pow(z_int, i, P) for i, c in enumerate(coeffs_int)) % P
    assert kzg.verify_with_trapdoor(srs, com, z, y, w)
    # a wrong evaluation must fail
    y_bad = fp.add(SPEC, y, fp.ones(SPEC))
    assert not kzg.verify_with_trapdoor(srs, com, z, y_bad, w)
