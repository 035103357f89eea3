"""Sorted-table (bucket-major) MSM accumulate path: the r3 redesign that
replaces per-rank random row gathers with ONE full-row-payload sort plus
contiguous strip reads (`accum_kernel.accumulate_te_sorted`).  Differential
tests run the full fused device graph in Pallas interpret mode against the
python-int oracle, covering the slab kernel, the fused triangle-merge tail
and the fused window-combine kernel."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ec_ref
from zprize_tpu.curve import sw, te
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.field.spec import int_from_limbs
from zprize_tpu.msm import pippenger, te_path
from zprize_tpu.msm.accum_kernel import merge_te_triangle_pallas

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


def test_sorted_path_matches_oracle(fixture_points):
    """Fused sorted-accumulate graph (interpret-mode kernels) == oracle,
    two bucket sets (g=2) so the group split and merge stack are hit."""
    aff, s, exp = fixture_points
    c, g = 8, 2
    w = pippenger.num_windows(CURVE, c)
    m = -(-w // g)
    packed, bad = te_path.prepare_points_collapsed(CURVE, aff.x, aff.y,
                                                   aff.inf, c * g, m)
    assert not bool(bad)
    res_can = pippenger._msm_te_sorted_device(
        CURVE, c, g, m, N, True, packed, s, aff.inf)
    res = pippenger._te_result_host(CURVE, res_can)
    a = sw.to_affine(CURVE, res)
    got = (int(fp.to_ints(CURVE.field, a.x)[()]),
           int(fp.to_ints(CURVE.field, a.y)[()]))
    assert got == exp


def test_sorted_table_chunked_sort_matches_oracle(fixture_points):
    """ZPRIZE_SORT_OPS>0 (chunked multi-sort with iota tiebreak): a torn
    row (equal-key rows split across sort chunks) would corrupt points
    silently on the hardware opt-in path — prove the chunked table yields
    the oracle MSM result.  (Row ORDER inside an equal-key run may legally
    differ from the single-sort table; only the accumulated result is
    contract.)"""
    aff, s, exp = fixture_points
    c, g = 8, 2
    w = pippenger.num_windows(CURVE, c)
    m = -(-w // g)
    packed, bad = te_path.prepare_points_collapsed(CURVE, aff.x, aff.y,
                                                   aff.inf, c * g, m)
    assert not bool(bad)
    tables, starts, counts = pippenger._sorted_table_te(
        CURVE, c, g, m, N, 4, packed, s, aff.inf)
    res_can = pippenger._sorted_accum_te(CURVE, c, g, True, tables, starts,
                                         counts)
    res = pippenger._te_result_host(CURVE, res_can)
    a = sw.to_affine(CURVE, res)
    got = (int(fp.to_ints(CURVE.field, a.x)[()]),
           int(fp.to_ints(CURVE.field, a.y)[()]))
    assert got == exp


def test_sorted_gather_build_matches_oracle(fixture_points):
    """ZPRIZE_SORT_BUILD=gather (split_ops == -1): 2-operand key sort +
    one row gather builds the same bucket-major table — compile-pathology
    escape hatch for the payload sort; oracle differential."""
    aff, s, exp = fixture_points
    c, g = 8, 2
    w = pippenger.num_windows(CURVE, c)
    m = -(-w // g)
    packed, bad = te_path.prepare_points_collapsed(CURVE, aff.x, aff.y,
                                                   aff.inf, c * g, m)
    assert not bool(bad)
    tables, starts, counts = pippenger._sorted_table_te(
        CURVE, c, g, m, N, -1, packed, s, aff.inf)
    res_can = pippenger._sorted_accum_te(CURVE, c, g, True, tables, starts,
                                         counts)
    res = pippenger._te_result_host(CURVE, res_can)
    a = sw.to_affine(CURVE, res)
    got = (int(fp.to_ints(CURVE.field, a.x)[()]),
           int(fp.to_ints(CURVE.field, a.y)[()]))
    assert got == exp


def test_sorted_streamed_matches_oracle(fixture_points):
    """Streamed-sorted path (m=1 scale regime: per-window dynamic digits,
    row-run payload sorts, run chaining via the accumulator `init` lanes)
    == oracle.  Run size 16 < N=48 forces three chained runs per window."""
    aff, s, exp = fixture_points
    import os
    packed, bad = te_path.prepare_points(CURVE, aff.x, aff.y, aff.inf)
    assert not bool(bad)
    c = 8
    prepared = pippenger.PreparedTe(packed, c,
                                    pippenger.num_windows(CURVE, c), 1, N)
    old = os.environ.get("ZPRIZE_SORT_RUN_LOG")
    os.environ["ZPRIZE_SORT_RUN_LOG"] = "4"
    try:
        res = pippenger._msm_te_sorted_streamed(CURVE, prepared, aff.inf,
                                                s, c, interpret=True)
    finally:
        if old is None:
            del os.environ["ZPRIZE_SORT_RUN_LOG"]
        else:
            os.environ["ZPRIZE_SORT_RUN_LOG"] = old
    a = sw.to_affine(CURVE, res)
    got = (int(fp.to_ints(CURVE.field, a.x)[()]),
           int(fp.to_ints(CURVE.field, a.y)[()]))
    assert got == exp


@pytest.mark.slow
def test_merge_tail_kernel_matches_xla_triangle():
    """Fused triangle-merge tail kernel (interpret) == the XLA reference
    form, compared projectively (the two accumulate different redundant
    representatives)."""
    f = CURVE.field
    n_win, b = 1, 1024
    pts = ec_ref.random_subgroup_points(CURVE, 64, seed=4)
    rng = random.Random(1)
    sel = [pts[rng.randrange(64)] for _ in range(n_win * b)]
    px = fp.from_ints(f, [p[0] for p in sel])
    py = fp.from_ints(f, [p[1] for p in sel])
    tx, ty, bad = te.sw_to_te(CURVE, px, py, jnp.zeros((n_win * b,), bool))
    assert not bool(np.asarray(jax.device_get(jnp.any(bad))))
    bs = te.TePoint(tx.reshape(n_win, b, -1), ty.reshape(n_win, b, -1),
                    fp.ones(f, (n_win, b)),
                    fp.mul(f, tx, ty).reshape(n_win, b, -1))
    ref = te_path.merge_buckets_te_triangle(CURVE, 10, bs)
    got = merge_te_triangle_pallas(CURVE, 10, True, bs)

    def vals(p):
        c = [np.asarray(jax.device_get(fp.to_canonical(f, a))) for a in p]
        return [[int_from_limbs(c[k][w]) for k in range(4)]
                for w in range(n_win)]

    rv, gv = vals(ref), vals(got)
    p = f.p
    for w in range(n_win):
        assert (rv[w][0] * gv[w][2] - gv[w][0] * rv[w][2]) % p == 0
        assert (rv[w][1] * gv[w][2] - gv[w][1] * rv[w][2]) % p == 0
