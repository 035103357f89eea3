"""Proof-of-Succinct-Work: the Marlin-based mining loop of team-prize2.

Mirrors snarkVM's PoSW (`dpc/src/posw/posw.rs`):
* `prove_once_unchecked` (:156-168) — one unconditional Marlin proof of the
  PoSW circuit for a candidate nonce;
* the difficulty check (:170-200) — hash the serialized proof, compare
  against the target;
* the cooperative `terminator: &AtomicBool` cancellation pattern threaded
  through the prover (:159, `marlin.rs:264-275`) — here a
  `threading.Event` polled between proving iterations;
* `mine` — the retry loop the reference miners run per-thread
  (`simonatsn/README.md:88`: 1 thread = 1 proof loop).

The PoSW circuit here is Poseidon-based like snarkVM's (which proves a
Merkle root over transactions): it proves knowledge of (header, nonce) with
`digest = Poseidon2(header, nonce)` as the public input — the same
hash the rest of this framework pins to snarkVM snapshot fixtures.  The
proof hash for the difficulty check is a Poseidon sponge over the proof's
commitment coordinates (the reference hashes the serialized proof bytes
with its native hash; same role).
"""

from __future__ import annotations

import dataclasses

from ..field import fp
from ..field.spec import BLS12_377_FR
from ..hash import poseidon
from ..hash.grain import snarkvm_config
from ..marlin import ahp, indexer
from ..marlin.r1cs import R1CSBuilder
from ..pcs import kzg

FR = BLS12_377_FR


# ----------------------------------------------------------- R1CS Poseidon

def _lc_add_const(lc, k, p):
    return lc + [(0, k % p)]


def _lc_scale(lc, k, p):
    return [(v, c * k % p) for v, c in lc]


def _lc_sum(lcs, p):
    acc: dict = {}
    for lc in lcs:
        for v, c in lc:
            acc[v] = (acc.get(v, 0) + c) % p
    return [(v, c) for v, c in acc.items() if c]


def _sbox17_r1cs(rb: R1CSBuilder, lc):
    """x^17 as 5 rank-1 constraints (4 squarings + final mul); MDS/ark
    stay linear-combination-free (folded into the LCs — the standard R1CS
    Poseidon efficiency, vs the PLONK gadget's explicit MDS gates)."""
    u1 = rb.new_witness()
    rb.constrain(lc, lc, [(u1, 1)])
    u2 = rb.new_witness()
    rb.constrain([(u1, 1)], [(u1, 1)], [(u2, 1)])
    u4 = rb.new_witness()
    rb.constrain([(u2, 1)], [(u2, 1)], [(u4, 1)])
    u16 = rb.new_witness()
    rb.constrain([(u4, 1)], [(u4, 1)], [(u16, 1)])
    y = rb.new_witness()
    rb.constrain([(u16, 1)], lc, [(y, 1)])
    return [(y, 1)]


def poseidon_permutation_r1cs(rb: R1CSBuilder, cfg, state_lcs):
    """~390 constraints per permutation (8*15 full + 31*5 partial + t
    state rebinds per round); linear layers cost only the rebinds, which
    keep the AHP entry domain K small.  Same round structure as
    `hash/poseidon.py`."""
    p = cfg.spec.p
    t = cfg.t
    rf, rp = cfg.full_rounds, cfg.partial_rounds
    half = rf // 2

    def rebind(lcs):
        """Bind each state LC to a fresh witness (lc * 1 = w).  Without
        this the folded linear layers grow the LCs round over round and
        the AHP entry domain K explodes ~50x (keygen/prove time follows);
        t extra constraints per round cap every LC at O(t) terms."""
        out = []
        for lc in lcs:
            if len(lc) <= 1:
                out.append(lc)
                continue
            w = rb.new_witness()
            rb.constrain(lc, [(0, 1)], [(w, 1)])
            out.append([(w, 1)])
        return out

    def mds(ys):
        return rebind([_lc_sum([_lc_scale(ys[j], cfg.mds[i][j], p)
                                for j in range(t)], p) for i in range(t)])

    def full_round(r, st):
        ys = [_sbox17_r1cs(rb, _lc_add_const(st[i], cfg.ark[r][i], p))
              for i in range(t)]
        return mds(ys)

    def partial_round(r, st):
        ys = [_sbox17_r1cs(rb, _lc_add_const(st[0], cfg.ark[r][0], p))]
        ys += [_lc_add_const(st[i], cfg.ark[r][i], p) for i in range(1, t)]
        return mds(ys)

    for r in range(half):
        state_lcs = full_round(r, state_lcs)
    for r in range(half, half + rp):
        state_lcs = partial_round(r, state_lcs)
    for r in range(half + rp, rf + rp):
        state_lcs = full_round(r, state_lcs)
    return state_lcs


# ----------------------------------------------------------- PoSW circuit

@dataclasses.dataclass
class PoswCircuit:
    """The indexed-key-free circuit description (fast tests / keygen-once
    flows build this without touching the SRS)."""
    r1cs: object
    header_var: int
    nonce_var: int
    cfg: object


@dataclasses.dataclass
class PoswKeys:
    pk: indexer.IndexProverKey
    circuit: PoswCircuit

    @property
    def cfg(self):
        return self.circuit.cfg


def build_circuit() -> PoswCircuit:
    """The PoSW R1CS: digest (public) = Poseidon2(header, nonce)."""
    cfg = snarkvm_config(FR, 2)
    rb = R1CSBuilder(FR, num_public=1)     # public: digest
    header = rb.new_witness()
    nonce = rb.new_witness()
    state = [[], [(header, 1)], [(nonce, 1)]]   # sponge absorb into rate
    out = poseidon_permutation_r1cs(rb, cfg, state)
    # digest == state[1] after the permutation
    rb.constrain(out[1], [(0, 1)], [(rb.public(0), 1)])
    return PoswCircuit(rb.build(), header, nonce, cfg)


def setup(srs: kzg.Srs | None = None, srs_seed: int = 9,
          circuit: PoswCircuit | None = None) -> PoswKeys:
    """Index the PoSW circuit (keygen-once; proving reuses the keys)."""
    from ..curve.spec import BLS12_377_G1 as CURVE
    circ = circuit if circuit is not None else build_circuit()
    r1 = circ.r1cs
    n = 1 << max(r1.num_constraints, r1.num_vars, 2).bit_length()
    k = 1 << max(len(r1.a), len(r1.b), len(r1.c), 2).bit_length()
    if srs is None:
        srs = kzg.setup_test_srs(CURVE, max(3 * k, 2 * n) + 8, seed=srs_seed)
    pk = indexer.index(CURVE, r1, srs)
    return PoswKeys(pk, circ)


def _witness(circ: PoswCircuit, header: int, nonce: int) -> list[int]:
    """Full assignment via generic forward propagation + the digest."""
    cfg = circ.cfg
    st = fp.from_ints(FR, [0, header % FR.p, nonce % FR.p])
    digest = int(fp.to_ints(FR, poseidon.permute(cfg, st)[1])[()])
    r1 = circ.r1cs
    partial = {0: 1, 1: digest, circ.header_var: header % FR.p,
               circ.nonce_var: nonce % FR.p}
    z = _solve(r1, partial)
    assert r1.is_satisfied(z)
    return z


def _solve(r1, partial: dict) -> list[int]:
    """Forward witness propagation over rank-1 constraints whose C side is
    a single fresh variable (all of this module's constraints are)."""
    p = r1.spec.p
    vals = dict(partial)
    by_row: dict = {}
    for side, entries in (("a", r1.a), ("b", r1.b), ("c", r1.c)):
        for r, c, v in entries:
            by_row.setdefault(r, {"a": [], "b": [], "c": []})[side].append(
                (c, v))
    for r in range(r1.num_constraints):
        lcs = by_row.get(r)
        if lcs is None:
            continue
        cs = lcs["c"]
        if len(cs) == 1 and cs[0][1] == 1 and cs[0][0] not in vals:
            a = sum(vals.get(v, 0) * c for v, c in lcs["a"]) % p
            b = sum(vals.get(v, 0) * c for v, c in lcs["b"]) % p
            vals[cs[0][0]] = a * b % p
    return [vals.get(i, 0) for i in range(r1.num_vars)]


# ----------------------------------------------------------- mining loop

def prove_once_unchecked(keys: PoswKeys, header: int, nonce: int):
    """One unconditional proof (`posw.rs:156-168` role).  Returns
    (proof, digest)."""
    z = _witness(keys.circuit, header, nonce)
    return ahp.prove(keys.pk, z), z[1]


def _proof_coords(proof) -> list[int]:
    coords = []
    for name in sorted(proof.comms):
        c = proof.comms[name]
        coords.extend([0, 0] if c is None else [c[0] % FR.p, c[1] % FR.p])
    return coords


def proof_difficulty(keys: PoswKeys, proof) -> int:
    """Poseidon-sponge hash of the proof's commitment coordinates -> int
    (the difficulty hash of `posw.rs:170-200`)."""
    return proof_difficulty_batch(keys, [proof])[0]


def proof_difficulty_batch(keys: PoswKeys, proofs) -> list[int]:
    """Difficulty hashes of B proofs in ONE lane-batched sponge (the
    per-proof host round-trip would otherwise dominate a batched miner)."""
    rows = [_proof_coords(pf) for pf in proofs]
    planes = fp.from_ints(FR, rows)                  # (B, ncoords, L)
    out = poseidon.hash_many(keys.cfg,
                             [planes[:, j] for j in range(len(rows[0]))])[0]
    vals = fp.to_ints(FR, out)                       # (B,)
    return [int(v) for v in vals]


def mine(keys: PoswKeys, header: int, target: int, start_nonce: int = 0,
         max_nonces: int = 64, terminator=None):
    """Retry loop: prove nonces until the proof hash meets `target` or the
    terminator fires (returns None on cancellation/exhaustion) — the
    per-thread miner loop + cooperative cancellation of the reference."""
    for nonce in range(start_nonce, start_nonce + max_nonces):
        if terminator is not None and terminator.is_set():
            return None
        proof, digest = prove_once_unchecked(keys, header, nonce)
        if proof_difficulty(keys, proof) < target:
            return {"nonce": nonce, "digest": digest, "proof": proof}
    return None


def mine_batch(keys: PoswKeys, header: int, target: int,
               start_nonce: int = 0, max_nonces: int = 64, batch: int = 8,
               terminator=None):
    """Batched miner: B nonces proven per `ahp.prove_batch` dispatch set
    (1 batch = B proofs on the vector lanes — the TPU analog of the
    reference's 1-thread-=-1-proof loop, `simonatsn/README.md:88`), with
    the difficulty check also lane-batched.  Returns the first qualifying
    solution in nonce order."""
    nonce, end = start_nonce, start_nonce + max_nonces
    while nonce < end:
        if terminator is not None and terminator.is_set():
            return None
        bs = min(batch, end - nonce)
        zs = [_witness(keys.circuit, header, nonce + i) for i in range(bs)]
        proofs = ahp.prove_batch(keys.pk, zs)
        for i, d in enumerate(proof_difficulty_batch(keys, proofs)):
            if d < target:
                return {"nonce": nonce + i, "digest": zs[i][1],
                        "proof": proofs[i]}
        nonce += bs
    return None


def verify_work(keys: PoswKeys, srs: kzg.Srs, solution: dict,
                target: int) -> bool:
    """Full block check: difficulty + Marlin proof verification."""
    if proof_difficulty(keys, solution["proof"]) >= target:
        return False
    public = [1, solution["digest"]]
    return ahp.verify(keys.pk.vk, srs, public, solution["proof"])
