"""Competition-API wrapper and SRS persistence tests."""

import os
import random
import tempfile

import jax.numpy as jnp
import pytest

from zprize_tpu.curve import sw
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.msm import api as msm_api
from zprize_tpu.pcs import kzg, storage

import ec_ref

CURVE = BLS12_377_G1


def test_multi_scalar_mult_batched():
    rng = random.Random(12)
    n = 32
    pts = ec_ref.random_subgroup_points(CURVE, 8, seed=13)
    pts = [pts[i % 8] for i in range(n)]
    ctx = msm_api.multi_scalar_mult_init(CURVE, pts, window_bits=5)
    batches = [[rng.randrange(CURVE.order) for _ in range(n)]
               for _ in range(2)]
    s = jnp.stack([fp.from_ints(CURVE.scalar, b) for b in batches])
    results = msm_api.multi_scalar_mult(ctx, s)
    assert len(results) == 2
    for res, scalars in zip(results, batches):
        aff = sw.to_affine(CURVE, res)
        got = (int(fp.to_ints(CURVE.field, aff.x)[()]),
               int(fp.to_ints(CURVE.field, aff.y)[()]))
        assert got == ec_ref.ec_msm(pts, scalars, CURVE.field.p)


def test_srs_roundtrip(tmp_path):
    srs = kzg.setup_test_srs(CURVE, 8, seed=5)
    path = os.path.join(tmp_path, "srs.npz")
    storage.save_srs(path, srs)
    # trapdoor-bearing files are refused by default (round-1 advisory)
    import pytest
    with pytest.raises(ValueError, match="trapdoor"):
        storage.load_srs(path)
    srs2 = storage.load_srs(path, allow_trapdoor=True)
    assert srs2.tau == srs.tau
    assert srs2.curve.name == srs.curve.name
    assert srs2.h == srs.h and srs2.tau_h == srs.tau_h
    for i in range(8):
        a = int(fp.to_ints(CURVE.field, srs.g1_powers.x[i])[()])
        b = int(fp.to_ints(CURVE.field, srs2.g1_powers.x[i])[()])
        assert a == b
    # loaded SRS still verifies an opening
    coeffs = fp.from_ints(CURVE.scalar, [3, 1, 4, 1])
    com = kzg.commit(srs2, coeffs, c=4)
    z = fp.from_ints(CURVE.scalar, [77])[0]
    w, y = kzg.open_at(srs2, coeffs, z)
    assert kzg.verify_with_trapdoor(srs2, com, z, y, w)


def test_pk_roundtrip(tmp_path):
    """keygen once -> save -> load -> prove from the reloaded key; the
    proof verifies and matches the reference's SliceStorage prove-from-disk
    flow (`winderica/distributed/src/storage.rs:10-50`)."""
    from zprize_tpu.plonk import prover as plonk_prover
    from zprize_tpu.plonk import verifier as plonk_verifier
    from zprize_tpu.plonk.circuit import CircuitBuilder
    from zprize_tpu.field.spec import BLS12_377_FR

    cb = CircuitBuilder(BLS12_377_FR)
    x = cb.new_var()
    x2 = cb.mul(x, x)
    out = cb.add_const(x2, 1)
    cb.public_input(out)
    cc = cb.compile()
    srs = kzg.setup_test_srs(CURVE, cc.n + 8, seed=7)
    pk, vk = plonk_prover.setup(CURVE, cc, srs)

    pk_path = os.path.join(tmp_path, "pk.npz")
    storage.save_pk(pk_path, pk)
    pk2 = storage.load_pk(pk_path, srs)
    assert pk2.circuit.n == cc.n and pk2.circuit.k1 == cc.k1

    assignment = {x: 4, x2: 16, out: 17}
    proof = plonk_prover.prove(pk2, assignment, [17],
                               blinding_rng=random.Random(9))
    assert plonk_verifier.verify(vk, srs, proof, [17])
