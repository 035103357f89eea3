"""Multi-device tests on the virtual 8-device CPU mesh: sharded MSM and the
distributed four-step NTT (the shard_map/collective paths the driver's
multichip dryrun also exercises)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zprize_tpu.curve import sw
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.field.spec import GOLDILOCKS
from zprize_tpu.ntt.domain import Domain
from zprize_tpu.ntt.radix2 import ntt
from zprize_tpu.parallel.mesh import make_mesh, shard_batch
from zprize_tpu.parallel.msm_sharded import msm_sharded
from zprize_tpu.parallel.ntt_sharded import flatten_output, ntt_fourstep_sharded

import ec_ref

CURVE = BLS12_377_G1


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_msm_sharded_matches_oracle():
    mesh = make_mesh()
    n = 64
    pts = ec_ref.random_subgroup_points(CURVE, 8, seed=31)
    pts = [pts[i % 8] for i in range(n)]
    rng = random.Random(77)
    scalars = [rng.randrange(CURVE.order) for _ in range(n)]
    aff = sw.Affine(
        fp.from_ints(CURVE.field, [p[0] for p in pts]),
        fp.from_ints(CURVE.field, [p[1] for p in pts]),
        jnp.zeros((n,), bool))
    s = fp.from_ints(CURVE.scalar, scalars)
    aff = sw.Affine(shard_batch(mesh, aff.x), shard_batch(mesh, aff.y),
                    shard_batch(mesh, aff.inf))
    s = shard_batch(mesh, s)
    res = msm_sharded(CURVE, aff, s, mesh, c=6)
    expect = ec_ref.ec_msm(pts, scalars, CURVE.field.p)
    got_aff = sw.to_affine(CURVE, res)
    got = (int(fp.to_ints(CURVE.field, got_aff.x)[()]),
           int(fp.to_ints(CURVE.field, got_aff.y)[()]))
    assert got == expect


def test_ntt_sharded_matches_single_device():
    mesh = make_mesh()
    spec = GOLDILOCKS
    log_n1, log_n2 = 5, 5
    n = 1 << (log_n1 + log_n2)
    rng = random.Random(13)
    x = [rng.randrange(spec.p) for _ in range(n)]
    a = fp.from_ints(spec, x)
    expect = fp.to_ints(spec, ntt(Domain(spec, log_n1 + log_n2), a))
    m = a.reshape(1 << log_n1, 1 << log_n2, -1)
    c = ntt_fourstep_sharded(spec, m, mesh, log_n1, log_n2)
    got = fp.to_ints(spec, flatten_output(c))
    assert [int(v) for v in got] == [int(v) for v in expect]
