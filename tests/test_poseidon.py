"""Poseidon parity tests against the reference snarkVM snapshot fixtures
(extracted as data in fixtures/poseidon_fr377_rate2.json from
`simonatsn/snarkVM/algorithms/src/crypto_hash/resources/poseidon/`)."""

import json
import os

import numpy as np
import pytest

from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR
from zprize_tpu.hash import poseidon
from zprize_tpu.hash.grain import snarkvm_config

FIX = json.load(open(os.path.join(os.path.dirname(__file__), "fixtures",
                                  "poseidon_fr377_rate2.json")))
CFG = snarkvm_config(BLS12_377_FR, 2)


def test_grain_ark_mds_match_reference():
    """Generated round constants and MDS equal snarkVM's snapshot files."""
    ark_flat = [v for row in CFG.ark for v in row]
    assert [str(v) for v in ark_flat] == FIX["ark_rate2"]
    mds_flat = [v for row in CFG.mds for v in row]
    assert [str(v) for v in mds_flat] == FIX["mds_rate2"]


@pytest.mark.parametrize("absorb_n,squeeze_n",
                         [(0, 1), (1, 1), (2, 2), (3, 5), (5, 3), (9, 9),
                          (4, 0), (0, 9)])
def test_sponge_matches_snapshots(absorb_n, squeeze_n):
    key = f"{absorb_n},{squeeze_n}"
    expect = FIX["sponge_rate2"][key]
    sponge = poseidon.Sponge(CFG)
    inputs = [fp.constant(BLS12_377_FR, 1237812) for _ in range(absorb_n)]
    sponge.absorb(inputs)
    out = sponge.squeeze(squeeze_n)
    got = [str(int(fp.to_ints(BLS12_377_FR, o)[()])) for o in out]
    assert got == expect


def test_sponge_batched_consistency():
    """A batch of sponges equals independent scalar sponges."""
    vals = [3, 1237812, 99999]
    batch_inputs = [fp.from_ints(BLS12_377_FR, vals)]
    s = poseidon.Sponge(CFG, batch_shape=(3,))
    s.absorb(batch_inputs)
    outs = s.squeeze(2)
    for lane, v in enumerate(vals):
        ss = poseidon.Sponge(CFG)
        ss.absorb([fp.constant(BLS12_377_FR, v)])
        expect = ss.squeeze(2)
        for k in range(2):
            assert int(fp.to_ints(BLS12_377_FR, outs[k][lane])[()]) == \
                int(fp.to_ints(BLS12_377_FR, expect[k])[()])


def test_hash_many():
    out = poseidon.hash_many(CFG, [fp.constant(BLS12_377_FR, 1237812)] * 2, 2)
    expect = FIX["sponge_rate2"]["2,2"]
    got = [str(int(fp.to_ints(BLS12_377_FR, o)[()])) for o in out]
    assert got == expect
