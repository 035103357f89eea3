"""End-to-end PLONK test: build a circuit, prove, verify — the integration
oracle pattern of the reference ("the dispatcher verifies every proof it
produces", `winderica/bin/prove_dispatcher.rs:32`).  Also checks soundness
rejections: corrupted evals, wrong public inputs."""

import jax.numpy as jnp
import pytest

from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR
from zprize_tpu.pcs import kzg
from zprize_tpu.plonk import prover as plonk_prover
from zprize_tpu.plonk import verifier as plonk_verifier
from zprize_tpu.plonk.circuit import CircuitBuilder

CURVE = BLS12_377_G1
FR = BLS12_377_FR


def build_cubic_circuit():
    """Prove knowledge of x with x^3 + x + 5 == out (out public).
    Classic toy circuit; exercises mul, add, const, copies, public input."""
    cb = CircuitBuilder(FR)
    x = cb.new_var()
    x2 = cb.mul(x, x)
    x3 = cb.mul(x2, x)
    s = cb.add(x3, x)
    out = cb.add_const(s, 5)
    cb.public_input(out)
    return cb, x, x2, x3, s, out


@pytest.fixture(scope="module")
def setup_all():
    cb, x, x2, x3, s, out = build_cubic_circuit()
    cc = cb.compile()
    srs = kzg.setup_test_srs(CURVE, cc.n + 8, seed=3)
    pk, vk = plonk_prover.setup(CURVE, cc, srs)
    x_val = 3
    assignment = {x: x_val, x2: 9, x3: 27, s: 30, out: 35}
    public = [35]
    cc.check_assignment(assignment, public)
    return cc, srs, pk, vk, assignment, public


def test_prove_and_verify(setup_all):
    cc, srs, pk, vk, assignment, public = setup_all
    proof = plonk_prover.prove(pk, assignment, public)
    assert plonk_verifier.verify(vk, srs, proof, public)


def test_reject_wrong_public_input(setup_all):
    cc, srs, pk, vk, assignment, public = setup_all
    proof = plonk_prover.prove(pk, assignment, public)
    assert not plonk_verifier.verify(vk, srs, proof, [36])


def test_reject_tampered_eval(setup_all):
    cc, srs, pk, vk, assignment, public = setup_all
    proof = plonk_prover.prove(pk, assignment, public)
    bad = dict(proof.evals)
    bad["a"] = fp.add(FR, bad["a"], fp.ones(FR))
    tampered = plonk_prover.Proof(proof.wire_comms, proof.z_comm,
                                  proof.t_comms, bad, proof.w_zeta,
                                  proof.w_zeta_omega)
    assert not plonk_verifier.verify(vk, srs, tampered, public)


def test_blinding_hides_witness(setup_all):
    """Two proofs of the same witness must differ (hiding randomizers), and
    both must verify — the ZK property the round-1 build omitted."""
    import random
    cc, srs, pk, vk, assignment, public = setup_all
    p1 = plonk_prover.prove(pk, assignment, public,
                            blinding_rng=random.Random(1))
    p2 = plonk_prover.prove(pk, assignment, public,
                            blinding_rng=random.Random(2))
    import numpy as np
    c1 = np.asarray(p1.wire_comms[0].x)
    c2 = np.asarray(p2.wire_comms[0].x)
    assert not np.array_equal(c1, c2), "wire commitment not hiding"
    assert plonk_verifier.verify(vk, srs, p1, public)
    assert plonk_verifier.verify(vk, srs, p2, public)


def test_reject_unsatisfied_witness(setup_all):
    cc, srs, pk, vk, assignment, public = setup_all
    bad_assignment = dict(assignment)
    bad_assignment[max(bad_assignment)] = 99  # break the last wire
    proof = plonk_prover.prove(pk, bad_assignment, public)
    assert not plonk_verifier.verify(vk, srs, proof, public)
