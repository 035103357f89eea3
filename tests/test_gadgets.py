"""Poseidon/Merkle circuit gadgets vs the device hash implementation:
the in-circuit permutation must agree bit-for-bit with `hash/poseidon.py`
(which is itself pinned to snarkVM snapshot fixtures)."""

import random

import jax
import numpy as np

from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR
from zprize_tpu.hash import merkle, poseidon
from zprize_tpu.hash.grain import snarkvm_config
from zprize_tpu.plonk.circuit import CircuitBuilder
from zprize_tpu.plonk.gadgets import (generate_membership_circuit,
                                      hash2_gadget,
                                      poseidon_permutation_gadget)

FR = BLS12_377_FR
CFG = snarkvm_config(FR, 2)


def plane_int(x):
    return int(fp.to_ints(FR, x)[()])


def test_permutation_gadget_matches_device():
    rng = random.Random(11)
    s_in = [rng.randrange(FR.p) for _ in range(3)]
    cb = CircuitBuilder(FR)
    vin = [cb.new_var() for _ in range(3)]
    vout = poseidon_permutation_gadget(cb, CFG, vin)
    assignment = cb.compute_witness(dict(zip(vin, s_in)))
    # reference: device permutation
    st = fp.from_ints(FR, s_in)
    ref = poseidon.permute(CFG, st)
    for i in range(3):
        assert assignment[vout[i]] == plane_int(ref[i]), i
    # every gate satisfied
    cc = cb.compile()
    cc.check_assignment(assignment, [])
    # budget: 509 gates per permutation (docstring claim)
    assert len(cb.gates) == 509


def test_membership_circuit_matches_merkle():
    rng = random.Random(12)
    height, n_proofs = 3, 2
    leaves_int = [rng.randrange(FR.p) for _ in range(1 << height)]
    leaves = fp.from_ints(FR, leaves_int)
    levels = merkle.build_tree(CFG, leaves)
    root = plane_int(merkle.root(levels))

    cb, handles, indices = generate_membership_circuit(CFG, n_proofs, height)
    assignment = {}
    for (leaf_var, sib_vars), idx in zip(handles, indices):
        path = merkle.prove(levels, idx)
        assignment[leaf_var] = leaves_int[idx]
        for sv, (sib, _) in zip(sib_vars, path):
            assignment[sv] = plane_int(sib)
    assignment = cb.compute_witness(assignment)
    cc = cb.compile()
    public = [root] * n_proofs
    cc.check_assignment(assignment, public)  # root rows match the tree root
