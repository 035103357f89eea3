"""Marlin AHP end-to-end: index an R1CS, prove, verify (real pairing
openings) — the integration-oracle pattern of the reference's Marlin
tracks (every produced proof is verified, and corrupted proofs must be
rejected, as in `prize-marlin-verifier/src/main.rs:39` faulty-proof
injection)."""

import random

import pytest

from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field.spec import BLS12_377_FR
from zprize_tpu.marlin import ahp, indexer
from zprize_tpu.marlin.r1cs import R1CSBuilder
from zprize_tpu.pcs import kzg

CURVE = BLS12_377_G1
FR = BLS12_377_FR


def build_cubic():
    """x^3 + x + 5 = out (out public), plus filler constraints."""
    rb = R1CSBuilder(FR, num_public=1)
    x = rb.new_witness()
    x2 = rb.mul(x, x)
    x3 = rb.mul(x2, x)
    s = rb.add(x3, x)
    out = rb.add_const(s, 5)
    rb.enforce_equal(out, rb.public(0))
    return rb, x, x2, x3, s, out


def witness_for(x_val: int):
    p = FR.p
    x = x_val % p
    x2 = x * x % p
    x3 = x2 * x % p
    s = (x3 + x) % p
    out = (s + 5) % p
    # z = [1, public_out, x, x2, x3, s, out]
    return [1, out, x, x2, x3, s, out]


@pytest.fixture(scope="module")
def setup():
    rb, *_ = build_cubic()
    r1 = rb.build()
    z = witness_for(3)
    assert r1.is_satisfied(z)
    n = 1 << max(r1.num_constraints, r1.num_vars, 2).bit_length()
    k = 1 << max(len(r1.a), len(r1.b), len(r1.c), 2).bit_length()
    srs = kzg.setup_test_srs(CURVE, max(3 * k, 2 * n) + 8, seed=7)
    pk = indexer.index(CURVE, r1, srs)
    return r1, srs, pk, z


@pytest.fixture(scope="module")
def proof_of(setup):
    r1, srs, pk, z = setup
    return ahp.prove(pk, z)


def test_marlin_prove_verify(setup, proof_of):
    r1, srs, pk, z = setup
    assert ahp.verify(pk.vk, srs, z[:r1.num_public], proof_of)


def test_marlin_rejects_wrong_public(setup, proof_of):
    r1, srs, pk, z = setup
    proof = proof_of
    bad = list(z[:r1.num_public])
    bad[-1] = (bad[-1] + 1) % FR.p
    assert not ahp.verify(pk.vk, srs, bad, proof)


def test_marlin_rejects_tampered_sigma(setup, proof_of):
    r1, srs, pk, z = setup
    import copy
    proof = copy.deepcopy(proof_of)
    proof.sigmas["a"] = (proof.sigmas["a"] + 1) % FR.p
    assert not ahp.verify(pk.vk, srs, z[:r1.num_public], proof)


def test_marlin_rejects_tampered_eval(setup, proof_of):
    r1, srs, pk, z = setup
    import copy
    proof = copy.deepcopy(proof_of)
    proof.evals["z_a"] = (proof.evals["z_a"] + 1) % FR.p
    assert not ahp.verify(pk.vk, srs, z[:r1.num_public], proof)


def test_marlin_batch_verify(setup, proof_of):
    """Batch verification (one multi-pairing across instances, the
    team-prize1 amortization): accepts N good proofs, rejects a batch
    containing one tampered instance."""
    import copy
    r1, srs, pk, z = setup
    pub = z[:r1.num_public]
    good = [(pub, proof_of), (pub, proof_of)]
    assert ahp.batch_verify(pk.vk, srs, good, rng=random.Random(5))
    bad = copy.deepcopy(proof_of)
    bad.evals["h_1"] = (bad.evals["h_1"] + 1) % FR.p
    assert not ahp.batch_verify(pk.vk, srs, [(pub, proof_of), (pub, bad)],
                                rng=random.Random(6))


def test_marlin_prove_batch_lanes(setup):
    """B-lane batched prover: two different witnesses prove in one
    dispatch set; each lane verifies independently, and lane proofs are
    bit-identical to single-instance proofs (the lane-compatibility
    contract of `ahp.prove_batch`)."""
    r1, srs, pk, _ = setup
    z3, z4 = witness_for(3), witness_for(4)
    p3, p4 = ahp.prove_batch(pk, [z3, z4])
    assert ahp.verify(pk.vk, srs, z3[:r1.num_public], p3)
    assert ahp.verify(pk.vk, srs, z4[:r1.num_public], p4)
    solo = ahp.prove(pk, z4)
    assert (solo.comms, solo.sigmas, solo.evals) == (
        p4.comms, p4.sigmas, p4.evals)


def test_marlin_rejects_unsatisfied_witness(setup):
    r1, srs, pk, z = setup
    z_bad = list(z)
    z_bad[3] = (z_bad[3] + 1) % FR.p     # x2 inconsistent with x*x
    proof = ahp.prove(pk, z_bad)
    assert not ahp.verify(pk.vk, srs, z_bad[:r1.num_public], proof)
