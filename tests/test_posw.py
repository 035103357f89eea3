"""PoSW mining loop: R1CS Poseidon circuit (vs device permutation),
prove-once, difficulty gate, terminator cancellation, full verification."""

import threading

import pytest

from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR as FR
from zprize_tpu.hash import poseidon
from zprize_tpu.posw import posw


def test_r1cs_poseidon_matches_device():
    circ = posw.build_circuit()
    z = posw._witness(circ, header=1234, nonce=7)
    st = fp.from_ints(FR, [0, 1234, 7])
    digest = int(fp.to_ints(FR, poseidon.permute(circ.cfg, st)[1])[()])
    assert z[1] == digest                     # public digest slot


class _CircOnlyKeys:
    """mine() touches the prover only after the terminator check."""
    def __init__(self, circ):
        self.circuit = circ
        self.pk = None


def test_terminator_cancels_immediately():
    keys = _CircOnlyKeys(posw.build_circuit())
    ev = threading.Event()
    ev.set()
    assert posw.mine(keys, header=1, target=FR.p, terminator=ev) is None


@pytest.mark.slow
def test_mine_and_verify_work():
    keys = posw.setup()
    srs = keys.pk.srs
    # batched miner (the bench path): 2 nonces in one prove_batch set
    sol = posw.mine_batch(keys, header=42, target=FR.p, max_nonces=2,
                          batch=2)
    assert sol is not None                    # target=p: first proof wins
    assert sol["nonce"] == 0                  # first qualifying in order
    assert posw.verify_work(keys, srs, sol, FR.p)
    # tighten the target so this proof no longer qualifies
    d = posw.proof_difficulty(keys, sol["proof"])
    assert not posw.verify_work(keys, srs, sol, d)
