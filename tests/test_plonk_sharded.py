"""Mesh-sharded PLONK prover vs the single-device prover: identical proofs
(same blinding randomness), end-to-end verification on the 8-device CPU
mesh — the "multi-node without a cluster" strategy of the reference
(`winderica/distributed/src/config.rs:37-41`, workers on localhost)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zprize_tpu.curve import sw
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR
from zprize_tpu.parallel.mesh import make_mesh
from zprize_tpu.parallel.plonk_sharded import (ShardedProver,
                                               dist_cumprod_exclusive,
                                               dist_divide_linear,
                                               dist_eval_stack, dist_ntt,
                                               dist_powers)
from zprize_tpu.pcs import kzg
from zprize_tpu.plonk import prover as plonk_prover
from zprize_tpu.plonk import verifier as plonk_verifier
from zprize_tpu.plonk.circuit import CircuitBuilder
from zprize_tpu.poly import ops as poly_ops
from zprize_tpu.ntt.domain import Domain
from zprize_tpu.ntt.radix2 import intt, ntt

CURVE = BLS12_377_G1
FR = BLS12_377_FR


def canon(spec, a):
    return np.asarray(jax.device_get(fp.to_canonical(spec, a)))


def test_dist_ntt_matches_radix2():
    mesh = make_mesh(8)
    rng = random.Random(7)
    for log_n in (6, 9):
        n = 1 << log_n
        a = fp.from_ints(FR, [rng.randrange(FR.p) for _ in range(n)])
        dom = Domain(FR, log_n)
        ref = ntt(dom, a)
        got = dist_ntt(FR, a, mesh)
        assert (canon(FR, ref) == canon(FR, got)).all()
        refi = intt(dom, a)
        goti = dist_ntt(FR, a, mesh, inverse=True)
        assert (canon(FR, refi) == canon(FR, goti)).all()


def test_dist_scan_helpers():
    mesh = make_mesh(8)
    rng = random.Random(8)
    n = 1 << 7
    vals = [rng.randrange(1, FR.p) for _ in range(n)]
    a = fp.from_ints(FR, vals)

    # exclusive cumprod
    got = canon(FR, dist_cumprod_exclusive(FR, a, mesh))
    acc, ref = 1, []
    for v in vals:
        ref.append(acc)
        acc = acc * v % FR.p
    ref_plane = canon(FR, fp.from_ints(FR, ref))
    assert (got == ref_plane).all()

    # powers
    z = 0xABCDEF
    got = canon(FR, dist_powers(FR, fp.constant(FR, z), n, mesh))
    ref_plane = canon(FR, fp.from_ints(
        FR, [pow(z, i, FR.p) for i in range(n)]))
    assert (got == ref_plane).all()

    # eval + divide_linear vs single-device ops
    zp = dist_powers(FR, fp.constant(FR, z), n, mesh)
    ev = dist_eval_stack(FR, a[None], zp, mesh)[0]
    ref_ev = poly_ops.evaluate(FR, a, fp.constant(FR, z))
    assert (canon(FR, ev) == canon(FR, ref_ev)).all()

    q = dist_divide_linear(FR, a, fp.constant(FR, z), zp, mesh)
    ref_q, _ = poly_ops.divide_linear(FR, a, fp.constant(FR, z))
    qc, rc = canon(FR, q), canon(FR, ref_q)
    assert (qc[:n - 1] == rc[:n - 1]).all()
    assert (qc[n - 1] == 0).all()  # top coefficient of the quotient is 0


def _membership_style_circuit(n_target: int):
    """A copy/mul/add-heavy chain sized to pad to n_target gates."""
    cb = CircuitBuilder(FR)
    x = cb.new_var()
    cur = x
    while len(cb.gates) < n_target - 4:
        cur = cb.mul(cur, x) if len(cb.gates) % 3 else cb.add(cur, x)
    out = cb.add_const(cur, 7)
    cb.public_input(out)
    return cb, x, out


@pytest.mark.slow
def test_sharded_prover_matches_and_verifies():
    """Default gate count 2^16 (reference-meaningful scale on the 8-dev
    mesh; the winderica workload is 2^28 across 6 servers) — override with
    TEST_PLONK_SHARDED_LOG for quick local runs."""
    import os
    mesh = make_mesh(8)
    n_gates = 1 << int(os.environ.get("TEST_PLONK_SHARDED_LOG", "16"))
    cb, xv, out = _membership_style_circuit(n_gates)
    cc = cb.compile()
    assert cc.n == n_gates
    srs = kzg.setup_test_srs(CURVE, cc.n + 16, seed=5)
    pk, vk = plonk_prover.setup(CURVE, cc, srs)

    # witness: evaluate the chain at x=2 on the host
    x_val = 2
    assignment = {xv: x_val}
    for g_i, g in enumerate(cb.gates):
        a = assignment.get(g.a, 0)
        b = assignment.get(g.b, 0)
        if g.qm:  # mul gate
            assignment[g.c] = a * b % FR.p
        elif g.qo:  # add / add_const
            assignment[g.c] = (g.ql * a + g.qr * b + g.qc) % FR.p
    public = [assignment[out]]
    cc.check_assignment(assignment, public)

    wires = fp.from_ints(FR, cc.wire_values(assignment).tolist())

    sp = ShardedProver(pk, mesh)
    proof_s = sp.prove(wires, public, blinding_rng=random.Random(99))
    assert plonk_verifier.verify(vk, srs, proof_s, public)

    proof_1 = plonk_prover.prove_planes(pk, wires, public,
                                        blinding_rng=random.Random(99))
    # identical proofs field-by-field (same math, same blinding draws)
    for a, b in zip(proof_s.wire_comms, proof_1.wire_comms):
        assert bool(jax.device_get(sw.eq(CURVE, a, b)))
    assert bool(jax.device_get(sw.eq(CURVE, proof_s.z_comm, proof_1.z_comm)))
    for a, b in zip(proof_s.t_comms, proof_1.t_comms):
        assert bool(jax.device_get(sw.eq(CURVE, a, b)))
    for k, v in proof_1.evals.items():
        assert (canon(FR, proof_s.evals[k]) == canon(FR, v)).all(), k
    assert bool(jax.device_get(sw.eq(CURVE, proof_s.w_zeta, proof_1.w_zeta)))
    assert bool(jax.device_get(
        sw.eq(CURVE, proof_s.w_zeta_omega, proof_1.w_zeta_omega)))
