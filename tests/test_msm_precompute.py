"""Window-precompute collapse (PrecomputePoints.cu analog) differential
tests: the collapsed TE MSM must match the python-int oracle for several
(c, G, m) splits, including identity lanes and the no-collapse edge."""

import random
import sys

import jax.numpy as jnp
import pytest

import ec_ref
from zprize_tpu.curve import sw
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.msm import pippenger, te_path

CURVE = BLS12_377_G1
N = 48


@pytest.fixture(scope="module")
def fixture_points():
    pts = ec_ref.random_subgroup_points(CURVE, N, seed=9)
    pts[5] = None  # identity lane
    aff = sw.Affine(
        fp.from_ints(CURVE.field, [p[0] if p else 0 for p in pts]),
        fp.from_ints(CURVE.field, [p[1] if p else 1 for p in pts]),
        jnp.asarray([p is None for p in pts]))
    rng = random.Random(21)
    scal = [rng.randrange(CURVE.order) for _ in range(N)]
    exp = None
    for pt, k in zip(pts, scal):
        if pt is None:
            continue
        exp = ec_ref.ec_add(exp, ec_ref.ec_mul(pt, k, CURVE.field.p),
                            CURVE.field.p)
    return aff, fp.from_ints(CURVE.scalar, scal), exp


def _run(aff, s, c, g, m):
    if m > 1:
        packed, bad = te_path.prepare_points_collapsed(
            CURVE, aff.x, aff.y, aff.inf, c * g, m)
    else:
        packed, bad = te_path.prepare_points(CURVE, aff.x, aff.y, aff.inf)
    assert not bool(bad)
    prep = pippenger.PreparedTe(packed, c, g, m, N)
    res = pippenger.msm(CURVE, aff, s, prepared=prep)
    a = sw.to_affine(CURVE, res)
    return (int(fp.to_ints(CURVE.field, a.x)[()]),
            int(fp.to_ints(CURVE.field, a.y)[()]))


@pytest.mark.parametrize("c,g_sel", [(8, "full"), (8, "two"), (10, "three"),
                                     # production bench config (c=17, one
                                     # bucket set): windows span 3 scalar
                                     # limbs — the r2/r3 bench-mismatch
                                     # regression (wide-window digits)
                                     (17, "full")])
def test_collapse_matches_oracle(fixture_points, c, g_sel):
    aff, s, exp = fixture_points
    w = pippenger.num_windows(CURVE, c)
    if g_sel == "full":
        g, m = 1, w                      # everything in one bucket set
    elif g_sel == "two":
        g = 2
        m = -(-w // g)
    else:
        g = 3
        m = -(-w // g)
    got = _run(aff, s, c, g, m)
    assert got == exp


def test_plan_collapse_respects_budget():
    h = (CURVE.field.n_limbs + 1) // 2
    row = 3 * h * 4
    n = 1 << 16
    c, g, m = pippenger.plan_collapse(CURVE, n, None, budget_bytes=n * row * 3)
    assert m <= 3
    assert g * m >= pippenger.num_windows(CURVE, c)
    # huge budget: collapse to few bucket sets
    c2, g2, m2 = pippenger.plan_collapse(CURVE, n, None,
                                         budget_bytes=1 << 40)
    assert g2 * m2 >= pippenger.num_windows(CURVE, c2)
    assert g2 <= 4


def test_prepare_points_blocked_writes(fixture_points, monkeypatch):
    """prepare_points' donated block-write table assembly (the 2^26 memory
    plan: no 2x-table concatenate peak): multi-block m>1 and m=1 paths
    match the single-block result and the oracle."""
    aff, s, exp = fixture_points
    monkeypatch.setenv("ZPRIZE_PRECOMPUTE", "1")
    monkeypatch.setenv("ZPRIZE_PREP_BLOCK_LOG", "4")    # 16-point blocks
    prep_b = pippenger.prepare_points(CURVE, aff)
    monkeypatch.setenv("ZPRIZE_PREP_BLOCK_LOG", "18")   # one block
    prep_1 = pippenger.prepare_points(CURVE, aff)
    assert (prep_b.c, prep_b.g, prep_b.m) == (prep_1.c, prep_1.g, prep_1.m)
    # rows hold normal-form limbs whose redundant representatives depend on
    # the batch_inv grouping — compare canonical VALUES, not bits
    import numpy as np
    f = CURVE.field
    h = (f.n_limbs + 1) // 2

    def canon_rows(packed):
        # packed is column-major (3h, m*n) — view as rows for comparison
        w = np.asarray(packed).T[:, :3 * h]
        out = []
        for q in range(3):                 # coord q: words [q*h, (q+1)*h)
            wq = w[:, q * h:(q + 1) * h]
            limbs = np.concatenate([wq & 0xFFFF, wq >> 16],
                                   axis=1)[:, :f.n_limbs]
            out.append(np.asarray(jax.device_get(
                fp.to_canonical(f, jnp.asarray(limbs.astype(np.uint32))))))
        return np.stack(out, axis=1)

    import jax
    assert np.array_equal(canon_rows(prep_b.packed),
                          canon_rows(prep_1.packed))
    for prep in (prep_b, prep_1):
        res = pippenger.msm(CURVE, aff, s, prepared=prep)
        a = sw.to_affine(CURVE, res)
        got = (int(fp.to_ints(CURVE.field, a.x)[()]),
               int(fp.to_ints(CURVE.field, a.y)[()]))
        assert got == exp


def test_prepare_host_mode_matches_device(monkeypatch):
    """m=1 host-RAM table assembly (the 2^26 OOM fix: per-block device_get
    + one bulk upload) must produce the identical packed table as the
    device-side donated-write build."""
    import os

    import jax
    import numpy as np

    import ec_ref
    from zprize_tpu.curve import sw
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.field import fp
    from zprize_tpu.msm import pippenger

    curve = BLS12_377_G1
    n = 48
    pts = ec_ref.random_subgroup_points(curve, n, seed=3)
    import jax.numpy as jnp
    aff = sw.Affine(fp.from_ints(curve.field, [p[0] for p in pts]),
                    fp.from_ints(curve.field, [p[1] for p in pts]),
                    jnp.zeros((n,), bool))
    monkeypatch.setenv("ZPRIZE_PRECOMPUTE", "0")      # force m=1
    monkeypatch.setenv("ZPRIZE_PREP_BLOCK_LOG", "4")  # several blocks
    dev = pippenger.prepare_points(curve, aff, c=8)
    monkeypatch.setenv("ZPRIZE_PREP_HOST_LOG", "4")   # force host mode
    host = pippenger.prepare_points(curve, aff, c=8)
    assert host.m == dev.m == 1
    assert (np.asarray(jax.device_get(host.packed))
            == np.asarray(jax.device_get(dev.packed))).all()
