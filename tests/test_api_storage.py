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
