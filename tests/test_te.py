"""Twisted-Edwards path tests.

Oracle chain: python-int SW oracle (`ec_ref`) -> TE XLA forms
(`curve/te.py`, `msm/te_path.py`) -> TE Pallas kernel forms
(`msm/accum_kernel.py`, interpret mode).  Parameters are re-derived and
re-validated from scratch (curve membership, twist identities) — the
validation strategy of the reference's model tests
(`prize1b-msm-fpga/hardcaml/libs/twisted_edwards/model`), none of its code.
"""

import os
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ec_ref
from zprize_tpu.curve import sw, te
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.msm import pippenger, te_path

CURVE = BLS12_377_G1
P = CURVE.field.p


def _aff_ints(pt):
    aff = sw.to_affine(CURVE, pt)
    return (int(fp.to_ints(CURVE.field, aff.x)[()]),
            int(fp.to_ints(CURVE.field, aff.y)[()]))


@pytest.fixture(scope="module")
def pts8():
    base = ec_ref.random_subgroup_points(CURVE, 8, seed=1)
    x = fp.from_ints(CURVE.field, [q[0] for q in base])
    y = fp.from_ints(CURVE.field, [q[1] for q in base])
    inf = jnp.zeros((8,), bool)
    tx, ty, bad = te.sw_to_te(CURVE, x, y, inf)
    assert not bool(jax.device_get(jnp.any(bad)))
    return base, tx, ty


def test_params_on_curve(pts8):
    """Derived constants: mapped points satisfy -x^2+y^2 = 1 + d x^2 y^2."""
    pr = te.te_params(CURVE)
    assert (pow(pr.alpha, 3, P) + CURVE.b) % P == 0
    _, tx, ty = pts8
    for xi, yi in zip(fp.to_ints(CURVE.field, tx), fp.to_ints(CURVE.field, ty)):
        xi, yi = int(xi), int(yi)
        assert (-xi * xi + yi * yi) % P == (1 + pr.d * xi * xi * yi * yi) % P


def test_group_law_vs_oracle(pts8):
    """Mixed add, unified doubling, identity operand, full add, dbl — each
    mapped back to SW and compared against the python-int oracle."""
    base, tx, ty = pts8
    f = CURVE.field
    pre = te.precompute(CURVE, tx, ty)
    ext = te.TePoint(tx, ty, fp.ones(f, (8,)), fp.mul(f, tx, ty))
    p0 = te.TePoint(*(a[0] for a in ext))
    assert _aff_ints(te.te_to_sw(CURVE, te.add_mixed(
        CURVE, p0, te.TePre(*(a[1] for a in pre))))) == \
        ec_ref.ec_add(base[0], base[1], P)
    assert _aff_ints(te.te_to_sw(CURVE, te.add_mixed(
        CURVE, p0, te.TePre(*(a[0] for a in pre))))) == \
        ec_ref.ec_add(base[0], base[0], P)
    assert _aff_ints(te.te_to_sw(CURVE, te.add_mixed(
        CURVE, p0, te.identity_pre(CURVE, ())))) == base[0]
    assert _aff_ints(te.te_to_sw(CURVE, te.dbl(CURVE, p0))) == \
        ec_ref.ec_add(base[0], base[0], P)
    acc = te.add_mixed(CURVE, te.identity(CURVE, ()),
                       te.TePre(*(a[3] for a in pre)))
    assert _aff_ints(te.te_to_sw(CURVE, acc)) == base[3]
    # negated operand
    negd = te.select_neg_pre(CURVE, jnp.ones((8,), bool), pre)
    r = te.add_mixed(CURVE, te.dbl(CURVE, p0), te.TePre(*(a[0] for a in negd)))
    assert _aff_ints(te.te_to_sw(CURVE, r)) == base[0]


def _msm_case(n=64, c=6, seed=5, with_inf=False):
    rng = random.Random(seed)
    base = ec_ref.random_subgroup_points(CURVE, 8, seed=seed)
    px = fp.from_ints(CURVE.field, [q[0] for q in base] * (n // 8))
    py = fp.from_ints(CURVE.field, [q[1] for q in base] * (n // 8))
    inf = (jnp.arange(n) % 7 == 0) if with_inf else jnp.zeros((n,), bool)
    points = sw.Affine(px, py, inf)
    scalars_int = [rng.randrange(CURVE.order) for _ in range(n)]
    s = fp.from_ints(CURVE.scalar, scalars_int)
    expect = None
    inf_np = np.asarray(jax.device_get(inf))
    for i, k in enumerate(scalars_int):
        if inf_np[i]:
            continue
        expect = ec_ref.ec_add(expect,
                               ec_ref.ec_mul(base[i % 8], k, P), P)
    return points, s, expect


@pytest.mark.parametrize("with_inf", [False, True])
def test_msm_te_vs_oracle(with_inf):
    points, s, expect = _msm_case(with_inf=with_inf)
    assert os.environ.get("ZPRIZE_TE", "1") != "0"
    res = pippenger.msm(CURVE, points, s, c=6)
    assert _aff_ints(res) == expect


def test_te_dbl_chain_kernel_interpret(pts8):
    """Doubling-chain kernel (interpret) vs repeated te.dbl: the init-stage
    precompute chain (`prepare_points_collapsed`) rides this kernel on TPU."""
    from zprize_tpu.msm.accum_kernel import te_dbl_chain_pallas
    base, tx, ty = pts8
    f = CURVE.field
    ext = te.TePoint(tx, ty, fp.ones(f, (8,)), fp.mul(f, tx, ty))
    n_dbls = 5
    got = te_dbl_chain_pallas(CURVE, n_dbls, True, ext)
    ref = ext
    for _ in range(n_dbls):
        ref = te.dbl(CURVE, ref)
    for i in range(8):
        g = te.TePoint(*(a[i] for a in got))
        r = te.TePoint(*(a[i] for a in ref))
        assert _aff_ints(te.te_to_sw(CURVE, g)) == \
            _aff_ints(te.te_to_sw(CURVE, r))
        assert _aff_ints(te.te_to_sw(CURVE, g)) == \
            ec_ref.ec_mul(base[i], 1 << n_dbls, P)


def test_accumulate_te_pallas_interpret():
    """TE Pallas accumulate (interpret) vs the TE XLA reference, tiered."""
    from zprize_tpu.msm.accum_kernel import (accumulate_te_pallas,
                                             tier_schedule)
    points, s, _ = _msm_case()
    c, nbe = 6, 1 << 5
    n_win = pippenger.num_windows(CURVE, c)
    digits = pippenger.signed_digits(CURVE, c, n_win, s)
    perm, starts, counts, _ = pippenger.bucket_counts_all(c, digits)
    tx, ty, _ = te.sw_to_te(CURVE, points.x, points.y, points.inf)
    packed = te_path.precompute_packed(CURVE,
                                       te.precompute(CURVE, tx, ty)).T
    ref = te_path.accumulate_te(CURVE, c, 64, packed, digits, perm,
                                starts, counts, nbe)
    lane_counts = np.asarray(jax.device_get(counts[:, 1:nbe + 1])).reshape(-1)
    pad = (-lane_counts.size) % 128
    desc = np.sort(np.concatenate(
        [lane_counts, np.zeros(pad, lane_counts.dtype)]))[::-1]
    tiers = tier_schedule(desc, tile=128)
    ra = sw.to_affine(CURVE, te.te_to_sw(CURVE, ref))
    # static host schedule AND traced in-graph depths must both match
    for td in (tiers, "traced"):
        got = accumulate_te_pallas(CURVE, c, int(desc[0]), packed, digits,
                                   perm, starts, counts, nbe,
                                   interpret=True, tier_depths=td)
        for pt in (ref, got):
            assert pt.x.shape == (n_win, nbe, CURVE.field.n_limbs)
        ga = sw.to_affine(CURVE, te.te_to_sw(CURVE, got))
        assert bool(jax.device_get(jnp.all(
            (fp.eq(CURVE.field, ga.x, ra.x) | (ga.inf & ra.inf))
            & (fp.eq(CURVE.field, ga.y, ra.y) | (ga.inf & ra.inf))
            & (ga.inf == ra.inf)))), td


def test_merge_te_pallas_interpret():
    from zprize_tpu.msm.accum_kernel import merge_buckets_te_pallas
    points, s, _ = _msm_case()
    c, nbe = 6, 1 << 5
    n_win = pippenger.num_windows(CURVE, c)
    digits = pippenger.signed_digits(CURVE, c, n_win, s)
    perm, starts, counts, _ = pippenger.bucket_counts_all(c, digits)
    tx, ty, _ = te.sw_to_te(CURVE, points.x, points.y, points.inf)
    packed = te_path.precompute_packed(CURVE,
                                       te.precompute(CURVE, tx, ty)).T
    sums = te_path.accumulate_te(CURVE, c, 64, packed, digits, perm,
                                 starts, counts, nbe)
    ref = te_path.merge_buckets_te(CURVE, c, sums)
    got = merge_buckets_te_pallas(CURVE, c, True, sums)
    ga = sw.to_affine(CURVE, te.te_to_sw(CURVE, got))
    ra = sw.to_affine(CURVE, te.te_to_sw(CURVE, ref))
    assert bool(jax.device_get(jnp.all(
        (fp.eq(CURVE.field, ga.x, ra.x) | (ga.inf & ra.inf))
        & (fp.eq(CURVE.field, ga.y, ra.y) | (ga.inf & ra.inf))
        & (ga.inf == ra.inf))))


def test_merge_te_triangle():
    """Chunked running-sum merge (XLA + Pallas-interpret forms) vs the
    bit-decomposition reference at a bucket range big enough to trigger
    the triangle split (B=2^10, W=2)."""
    from zprize_tpu.msm.accum_kernel import merge_te_triangle_pallas
    points, s, _ = _msm_case()
    c, nbe = 11, 1 << 10
    n_win = pippenger.num_windows(CURVE, c)
    digits = pippenger.signed_digits(CURVE, c, n_win, s)[:2]
    perm, starts, counts, _ = pippenger.bucket_counts_all(c, digits)
    tx, ty, _ = te.sw_to_te(CURVE, points.x, points.y, points.inf)
    packed = te_path.precompute_packed(CURVE,
                                       te.precompute(CURVE, tx, ty)).T
    sums = te_path.accumulate_te(CURVE, c, 64, packed, digits, perm,
                                 starts, counts, nbe)
    assert te_path.triangle_split(2, nbe) is not None
    ref = te_path.merge_buckets_te(CURVE, c, sums)
    for got in (te_path.merge_buckets_te_triangle(CURVE, c, sums),
                merge_te_triangle_pallas(CURVE, c, True, sums)):
        ga = sw.to_affine(CURVE, te.te_to_sw(CURVE, got))
        ra = sw.to_affine(CURVE, te.te_to_sw(CURVE, ref))
        assert bool(jax.device_get(jnp.all(
            (fp.eq(CURVE.field, ga.x, ra.x) | (ga.inf & ra.inf))
            & (fp.eq(CURVE.field, ga.y, ra.y) | (ga.inf & ra.inf))
            & (ga.inf == ra.inf))))


def test_msm_te_streamed_vs_oracle(monkeypatch):
    """Window-streamed orchestration (the 2^26 memory plan) forced via a
    tiny ZPRIZE_STREAM_GB on a small case — must match the host oracle
    and the fused path bit-for-bit at the API level."""
    monkeypatch.setenv("ZPRIZE_STREAM_GB", "0.0000002")   # ~214 bytes
    monkeypatch.setenv("ZPRIZE_STREAM_WINDOWS", "3")
    monkeypatch.setenv("ZPRIZE_PRECOMPUTE", "0")          # m=1 path
    points, s, expect = _msm_case()
    res = pippenger.msm(CURVE, points, s, c=6)
    assert _aff_ints(res) == expect


def test_te_to_sw_host(pts8):
    """Host-int TE->SW conversion vs the device form, incl. identity."""
    base, tx, ty = pts8
    f = CURVE.field
    ext = te.TePoint(tx, ty, fp.ones(f, (8,)), fp.mul(f, tx, ty))
    dbl2 = te.dbl(CURVE, ext)                       # non-trivial z
    dev = sw.to_affine(CURVE, te.te_to_sw(CURVE, dbl2))
    for i in range(8):
        xi, yi, zi = (int(fp.to_ints(f, a[i])[()]) for a in
                      (dbl2.x, dbl2.y, dbl2.z))
        sx, sy, sz = te.te_to_sw_host(CURVE, xi, yi, zi)
        assert sz == 1
        assert sx == int(fp.to_ints(f, dev.x[i])[()])
        assert sy == int(fp.to_ints(f, dev.y[i])[()])
    assert te.te_to_sw_host(CURVE, 0, 1, 1) == (0, 1, 0)


def test_pack_roundtrip():
    rng = np.random.default_rng(3)
    plane = jnp.asarray(rng.integers(0, 1 << 16, (5, 26), dtype=np.uint32))
    packed = te_path.pack_u16(plane)
    assert packed.shape == (5, 13)
    out = te_path.unpack_u16(packed, 26)
    assert np.array_equal(np.asarray(out), np.asarray(plane))
