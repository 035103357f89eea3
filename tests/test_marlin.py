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


def test_marlin_verify_group_verdicts(setup, proof_of):
    """Per-proof verdict contract of the team-prize1 harness
    (`prize-marlin-verifier/src/main.rs:37-62`): verify_group classifies
    every instance exactly — good ones True, tampered ones False — even
    when faulty proofs are mixed through the group (bisected RLC
    pairing)."""
    import copy
    r1, srs, pk, z = setup
    pub = z[:r1.num_public]
    bad_comm = copy.deepcopy(proof_of)
    x, y = bad_comm.comms["g_1"]
    bad_comm.comms["g_1"] = (x, (-y) % CURVE.field.p)   # main.rs:182 tamper
    bad_eval = copy.deepcopy(proof_of)
    bad_eval.evals["h_1"] = (bad_eval.evals["h_1"] + 1) % FR.p
    # a tamper the cheap host checks CANNOT catch (transcript and evals
    # untouched, only the opening witness broken) — must be isolated by
    # the bisected pairing path
    bad_open = copy.deepcopy(proof_of)
    ox, oy = bad_open.open_beta
    bad_open.open_beta = (ox, (-oy) % CURVE.field.p)
    group = [(pub, proof_of), (pub, bad_comm), (pub, proof_of),
             (pub, bad_eval), (pub, bad_open), (pub, proof_of)]
    verdicts = ahp.verify_group(pk.vk, srs, group, rng=random.Random(9))
    assert verdicts == [True, False, True, False, False, True]
    # all-good group: one multi-pairing, no bisection branch
    verdicts = ahp.verify_group(pk.vk, srs, [(pub, proof_of)] * 3,
                                rng=random.Random(10))
    assert verdicts == [True, True, True]


def test_marlin_group_checks_match_sequential(setup, proof_of):
    """The lane-batched Fiat–Shamir derivation (`_group_checks`, one
    broadcast transcript per bucket) must produce bit-identical opening
    tuples to the sequential `_verify_checks` — the differential contract
    between the two derivations (r5: the verify track runs the batched
    form)."""
    import copy
    r1, srs, pk, z = setup
    pub = z[:r1.num_public]
    bad = copy.deepcopy(proof_of)
    bad.evals["g_1"] = (bad.evals["g_1"] + 3) % FR.p
    insts = [(pub, proof_of), (pub, bad), (pub, proof_of)]
    grouped = ahp._group_checks(pk.vk, srs, insts)
    seq = [ahp._verify_checks(pk.vk, srs, p_, pr_) for p_, pr_ in insts]
    assert grouped == seq
    assert grouped[0] is not None and grouped[2] is not None


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


def test_marlin_zk_prove_verify(setup):
    """zk mode: mask polynomial present, proof verifies, and the witness
    commitments are randomized (two provings of the same witness differ)."""
    r1, srs, pk, z = setup
    p1 = ahp.prove(pk, z, zk_rng=random.Random(11))
    p2 = ahp.prove(pk, z, zk_rng=random.Random(12))
    assert "s" in p1.comms and p1.comms["s"] is not None
    assert ahp.verify(pk.vk, srs, z[:r1.num_public], p1)
    assert ahp.verify(pk.vk, srs, z[:r1.num_public], p2)
    # hiding blinders: same witness, fresh randomness -> fresh commitments
    for nm in ("w", "z_a", "z_b", "s"):
        assert p1.comms[nm] != p2.comms[nm], nm


def test_marlin_rejects_tampered_degree_shift(setup, proof_of):
    """The shifted degree-bound commitment is load-bearing: replacing
    g_1_shift (or a_g_shift) with a wrong point must fail verification."""
    import copy
    r1, srs, pk, z = setup
    pub = z[:r1.num_public]
    for nm in ("g_1_shift", "a_g_shift"):
        proof = copy.deepcopy(proof_of)
        assert nm in proof.comms
        proof.comms[nm] = proof.comms[nm.replace("_shift", "")]
        assert not ahp.verify(pk.vk, srs, pub, proof)


def test_kzg_degree_bound_enforced(setup):
    """Degree-bound mechanics at the KZG layer: a polynomial AT the bound
    passes the shifted-eval check; one OVER the bound cannot — its
    best-effort shifted commitment (X^sh * p truncated to the SRS degree)
    opens to the wrong value, and no exact commitment exists."""
    from zprize_tpu.field import fp
    from zprize_tpu.poly import ops as poly_ops
    _, srs, pk, _ = setup
    fr = CURVE.scalar
    p = fr.p
    rng = random.Random(31)
    bound = 6
    sh = srs.size - 1 - bound
    zpt = rng.randrange(p)

    def attempt(deg):
        coeffs_i = [rng.randrange(p) for _ in range(deg + 1)]
        coeffs = fp.from_ints(fr, coeffs_i)
        y = sum(c * pow(zpt, i, p) for i, c in enumerate(coeffs_i)) % p
        y_shift = pow(zpt, sh, p) * y % p
        # shifted polynomial, TRUNCATED to what the SRS can commit
        import jax.numpy as jnp
        full = jnp.pad(coeffs, ((sh, 0), (0, 0)))[:srs.size]
        c_shift = kzg.commit(srs, full)
        # honest-best witness: quotient of (trunc - y_shift)/(X - z)
        import jax
        q, _ = poly_ops.divide_linear(fr, full, fp.constant(fr, zpt))
        w = kzg.commit(srs, q)
        return kzg.verify_many(
            srs, [(kzg.point_ints(CURVE, c_shift), zpt, y_shift,
                   kzg.point_ints(CURVE, w))], rng=random.Random(7))

    assert attempt(bound)          # deg == bound: exact fit, check passes
    assert not attempt(bound + 1)  # over bound: truncation breaks the check
