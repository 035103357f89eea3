"""Merkle tree tests: structure vs a python re-computation through the
(snapshot-validated) sponge, proof verification, tamper rejection."""

import jax.numpy as jnp
import pytest

from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR
from zprize_tpu.hash import merkle, poseidon
from zprize_tpu.hash.grain import snarkvm_config

CFG = snarkvm_config(BLS12_377_FR, 2)
F = BLS12_377_FR


def test_tree_and_proofs():
    n = 8
    leaves_int = [100 + i for i in range(n)]
    leaves = fp.from_ints(F, leaves_int)
    levels = merkle.build_tree(CFG, leaves)
    assert len(levels) == 4
    rt = merkle.root(levels)

    # independent recomputation of one internal node via hash_many
    h01 = poseidon.hash_many(CFG, [leaves[0], leaves[1]], 1)[0]
    assert int(fp.to_ints(F, levels[1][0])[()]) == int(fp.to_ints(F, h01)[()])

    for idx in (0, 3, 7):
        path = merkle.prove(levels, idx)
        assert merkle.verify(CFG, F, rt, leaves[idx], idx, path)
        # tampered leaf fails
        bad = fp.add(F, leaves[idx], fp.ones(F))
        assert not merkle.verify(CFG, F, rt, bad, idx, path)
