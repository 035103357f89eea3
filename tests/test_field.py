"""Differential tests of the limb field engine against python big-int math.

Strategy mirrors the reference's test pattern (seeded RNG + CPU ground truth,
cf. `prize1a-msm-gpu/yrrid/tests/msm.rs:11-37`): python ints are the oracle;
every op is checked for exact agreement, including adversarial values near
0, 1, p-1, and limb-boundary patterns.
"""

import random

import numpy as np
import pytest

from zprize_tpu.field import fp
from zprize_tpu.field.spec import (ALL_SPECS, BLS12_377_FQ, BLS12_377_FR,
                                   GOLDILOCKS, FieldSpec)

SPEC_IDS = [s.name for s in ALL_SPECS]


def special_values(p: int):
    vals = [0, 1, 2, 3, p - 1, p - 2, (p - 1) // 2, p // 2 + 1]
    # limb-boundary patterns
    vals += [(1 << (15 * k)) % p for k in (1, 2, 5, 10)]
    vals += [((1 << (15 * k)) - 1) % p for k in (1, 3, 7)]
    return vals


def sample_pairs(spec: FieldSpec, n_random=64, seed=1234):
    rng = random.Random(seed)
    sv = special_values(spec.p)
    a = sv + [rng.randrange(spec.p) for _ in range(n_random)]
    b = list(reversed(sv)) + [rng.randrange(spec.p) for _ in range(n_random)]
    return a, b


@pytest.mark.parametrize("spec", ALL_SPECS, ids=SPEC_IDS)
def test_roundtrip(spec):
    a_ints, _ = sample_pairs(spec)
    a = fp.from_ints(spec, a_ints)
    back = fp.to_ints(spec, a)
    assert [int(x) for x in back] == [x % spec.p for x in a_ints]


@pytest.mark.parametrize("spec", ALL_SPECS, ids=SPEC_IDS)
def test_add_sub_neg(spec):
    a_ints, b_ints = sample_pairs(spec)
    a, b = fp.from_ints(spec, a_ints), fp.from_ints(spec, b_ints)
    got_add = fp.to_ints(spec, fp.add(spec, a, b))
    got_sub = fp.to_ints(spec, fp.sub(spec, a, b))
    got_neg = fp.to_ints(spec, fp.neg(spec, a))
    for i, (x, y) in enumerate(zip(a_ints, b_ints)):
        assert int(got_add[i]) == (x + y) % spec.p
        assert int(got_sub[i]) == (x - y) % spec.p
        assert int(got_neg[i]) == (-x) % spec.p


@pytest.mark.parametrize("spec", ALL_SPECS, ids=SPEC_IDS)
def test_mul(spec):
    a_ints, b_ints = sample_pairs(spec, n_random=128)
    a, b = fp.from_ints(spec, a_ints), fp.from_ints(spec, b_ints)
    got = fp.to_ints(spec, fp.mul(spec, a, b))
    for i, (x, y) in enumerate(zip(a_ints, b_ints)):
        assert int(got[i]) == (x * y) % spec.p, f"mul mismatch at {i}"


@pytest.mark.parametrize("spec", ALL_SPECS, ids=SPEC_IDS)
def test_mul_chain_stays_normalized(spec):
    """Repeated muls/adds on redundant values must stay exact (invariant
    closure: outputs of every op are legal inputs of every op)."""
    rng = random.Random(7)
    n = 16
    a_ints = [rng.randrange(spec.p) for _ in range(n)]
    b_ints = [rng.randrange(spec.p) for _ in range(n)]
    a, b = fp.from_ints(spec, a_ints), fp.from_ints(spec, b_ints)
    ea, eb = list(a_ints), list(b_ints)
    for step in range(8):
        a, b = fp.mul(spec, a, b), fp.add(spec, a, b)
        ea, eb = [x * y % spec.p for x, y in zip(ea, eb)], \
                 [(x + y) % spec.p for x, y in zip(ea, eb)]
        # redundant-form limbs must respect the normal-form bound
        assert int(np.asarray(a).max()) < (1 << 16)
        assert int(np.asarray(b).max()) < (1 << 16)
    assert [int(v) for v in fp.to_ints(spec, a)] == ea
    assert [int(v) for v in fp.to_ints(spec, b)] == eb


@pytest.mark.parametrize("spec", ALL_SPECS, ids=SPEC_IDS)
def test_add_many_and_mul_const(spec):
    rng = random.Random(99)
    terms_ints = [[rng.randrange(spec.p) for _ in range(8)] for _ in range(20)]
    terms = [fp.from_ints(spec, t) for t in terms_ints]
    got = fp.to_ints(spec, fp.add_many(spec, terms))
    for i in range(8):
        assert int(got[i]) == sum(t[i] for t in terms_ints) % spec.p
    a = terms[0]
    for k in (0, 1, 2, 3, 13, 0x7FFF, 1 << 20):
        gk = fp.to_ints(spec, fp.mul_const(spec, a, k))
        for i in range(8):
            assert int(gk[i]) == (terms_ints[0][i] * k) % spec.p


@pytest.mark.parametrize("spec", [BLS12_377_FR, GOLDILOCKS], ids=["fr377", "gl"])
def test_pow_inv(spec):
    rng = random.Random(5)
    a_ints = [1, 2, spec.p - 1] + [rng.randrange(1, spec.p) for _ in range(13)]
    a = fp.from_ints(spec, a_ints)
    inv = fp.to_ints(spec, fp.inv(spec, a))
    for i, x in enumerate(a_ints):
        assert (int(inv[i]) * x) % spec.p == 1
    # inverse of zero is zero
    z = fp.inv(spec, fp.zeros(spec, (2,)))
    assert all(int(v) == 0 for v in fp.to_ints(spec, z))
    # pow
    e = 0xDEADBEEF12345
    got = fp.to_ints(spec, fp.pow_const(spec, a, e))
    for i, x in enumerate(a_ints):
        assert int(got[i]) == pow(x, e, spec.p)


@pytest.mark.parametrize("spec", [BLS12_377_FQ, GOLDILOCKS], ids=["fq377", "gl"])
def test_batch_inv(spec):
    rng = random.Random(11)
    a_ints = [rng.randrange(spec.p) for _ in range(15)] + [0]
    rng.shuffle(a_ints)
    a = fp.from_ints(spec, a_ints)
    got = fp.to_ints(spec, fp.batch_inv(spec, a))
    for i, x in enumerate(a_ints):
        if x == 0:
            assert int(got[i]) == 0
        else:
            assert (int(got[i]) * x) % spec.p == 1


@pytest.mark.parametrize("spec", ALL_SPECS, ids=SPEC_IDS)
def test_eq_and_canonical_of_redundant(spec):
    """Values equal mod p but in different redundant encodings compare equal."""
    import jax.numpy as jnp
    a = fp.from_ints(spec, [1, 5, 7])
    # a + p (redundant encoding of the same residues)
    p_limbs = fp.constant(spec, 0)  # placeholder shape
    ap = fp.add(spec, a, fp.from_ints(spec, [0, 0, 0]))
    big = fp.add(spec, a, fp.constant(spec, spec.p - 1, (3,)))
    big = fp.add(spec, big, fp.ones(spec, (3,)))  # a + p ≡ a
    assert bool(jnp.all(fp.eq(spec, a, big)))
    assert not bool(jnp.any(fp.eq(spec, a, fp.add(spec, a, fp.ones(spec, (3,))))))


@pytest.mark.parametrize("spec", ALL_SPECS, ids=SPEC_IDS)
def test_field_constants_sanity(spec):
    """Prime is probably-prime; claimed generator is a quadratic non-residue
    (sufficient for exact-order 2-adic roots of unity); root_of_unity has
    exact order 2**two_adicity."""
    p = spec.p
    for base in (2, 3, 5, 7):
        if base % p != 0:
            assert pow(base, p - 1, p) == 1, f"{spec.name}: p fails Fermat base {base}"
    assert pow(spec.generator, (p - 1) // 2, p) == p - 1, \
        f"{spec.name}: generator is a QR"
    s = spec.two_adicity
    w = spec.root_of_unity
    assert pow(w, 1 << s, p) == 1
    assert pow(w, 1 << (s - 1), p) == p - 1
