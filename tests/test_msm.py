"""MSM differential tests vs the python oracle, mirroring the reference's
`msm_correctness` pattern (`prize1a-msm-gpu/yrrid/tests/msm.rs:11-37`):
seeded generation, size via env knob, edge cases (zero scalars, identity
points, duplicate buckets) included deliberately."""

import os
import random

import jax.numpy as jnp
import numpy as np
import pytest

from zprize_tpu.curve import sw
from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.field import fp
from zprize_tpu.msm import pippenger

import ec_ref

TEST_NPOW = int(os.environ.get("TEST_NPOW", "8"))
MSM_SEED = int(os.environ.get("MSM_SEED", "42"))

CURVE = BLS12_377_G1


def make_inputs(n, seed, with_edge_cases=True):
    rng = random.Random(seed)
    pts = ec_ref.random_subgroup_points(CURVE, min(n, 32), seed=seed)
    # clone-extend to n (the reference's clone-doubling trick,
    # `yrrid/src/util.rs:15-29`)
    pts = [pts[i % len(pts)] for i in range(n)]
    scalars = [rng.randrange(CURVE.order) for _ in range(n)]
    if with_edge_cases and n >= 8:
        scalars[0] = 0                       # zero scalar
        scalars[1] = 1
        scalars[2] = CURVE.order - 1         # -1
        pts[3] = None                        # identity point in the input
        scalars[4] = scalars[5]              # duplicate scalar
        pts[6] = pts[5]                      # duplicate point
    return pts, scalars


def to_device(pts, scalars):
    xs = [0 if p is None else p[0] for p in pts]
    ys = [1 if p is None else p[1] for p in pts]
    infs = [p is None for p in pts]
    aff = sw.Affine(fp.from_ints(CURVE.field, xs),
                    fp.from_ints(CURVE.field, ys),
                    jnp.asarray(np.array(infs)))
    s = fp.from_ints(CURVE.scalar, scalars)
    return aff, s


def expected_msm(pts, scalars):
    return ec_ref.ec_msm(pts, scalars, CURVE.field.p)


def check(result_point, expect):
    aff = sw.to_affine(CURVE, result_point)
    if expect is None:
        assert bool(np.asarray(aff.inf))
        return
    got = (int(fp.to_ints(CURVE.field, aff.x)[()]),
           int(fp.to_ints(CURVE.field, aff.y)[()]))
    assert not bool(np.asarray(aff.inf))
    assert got == expect


@pytest.mark.parametrize("n,c", [(32, 4), (64, 6), (256, None)])
def test_msm_small(n, c):
    pts, scalars = make_inputs(n, MSM_SEED)
    aff, s = to_device(pts, scalars)
    res = pippenger.msm(CURVE, aff, s, c=c)
    check(res, expected_msm(pts, scalars))


def test_msm_env_size():
    n = 1 << TEST_NPOW
    pts, scalars = make_inputs(n, MSM_SEED + 1)
    aff, s = to_device(pts, scalars)
    res = pippenger.msm(CURVE, aff, s)
    check(res, expected_msm(pts, scalars))


def test_msm_adversarial_buckets():
    """All scalars identical: every point lands in the same buckets, forcing
    the multi-pass rectangle path."""
    n = 64
    pts, _ = make_inputs(n, MSM_SEED + 2, with_edge_cases=False)
    k = 0x1234567_89ABCDEF
    scalars = [k] * n
    aff, s = to_device(pts, scalars)
    res = pippenger.msm(CURVE, aff, s, c=6, cap=4)  # force many passes
    check(res, expected_msm(pts, scalars))


def test_msm_jit_static_matches():
    n = 128
    pts, scalars = make_inputs(n, MSM_SEED + 3)
    aff, s = to_device(pts, scalars)
    res = pippenger.msm_jit_static(CURVE, aff, s, c=6, cap_total=n)
    check(res, expected_msm(pts, scalars))


def test_msm_all_zero_scalars():
    n = 16
    pts, _ = make_inputs(n, MSM_SEED + 4, with_edge_cases=False)
    scalars = [0] * n
    aff, s = to_device(pts, scalars)
    res = pippenger.msm(CURVE, aff, s, c=5)
    check(res, None)


def test_msm_compact_u16_scalars():
    """fp.compact_scalars (uint16 canonical planes — the 2^26 memory plan)
    feeds the digit extraction identically: same digits AND the full MSM
    matches the oracle; redundant representatives canonicalize first."""
    n, c = 64, 6
    pts, scalars = make_inputs(n, MSM_SEED + 3)
    aff, s = to_device(pts, scalars)
    # redundant representative: add p to a few scalars at the limb level
    red = fp.add(CURVE.scalar, s, fp.zeros(CURVE.scalar, s.shape[:-1]))
    s16 = fp.compact_scalars(CURVE.scalar, red)
    assert s16.dtype == jnp.uint16
    n_win = pippenger.num_windows(CURVE, c)
    d32 = pippenger.signed_digits(CURVE, c, n_win, s)
    d16 = pippenger.signed_digits(CURVE, c, n_win, s16)
    assert np.array_equal(np.asarray(d32), np.asarray(d16))
    res = pippenger.msm(CURVE, aff, s16, c=c)
    check(res, expected_msm(pts, scalars))


@pytest.mark.parametrize("c", list(range(8, 19)))
def test_msm_every_plannable_window(c):
    """One small-MSM differential per plannable window width: the collapse
    planner may legally pick ANY c in [8, 18] (`plan_collapse` c_range —
    its ceiling is asserted against the digit-extraction limb-span limit),
    so every one of them must have an end-to-end oracle check, including
    the G>1 bucket-set split (r2's invalid headline bench came from the
    then-untested planner choice c=17)."""
    n = 32
    pts, scalars = make_inputs(n, MSM_SEED + 100 + c)
    aff, s = to_device(pts, scalars)
    # force a G>1 collapse split: budget for m ~= 3 multiples
    h = (CURVE.field.n_limbs + 1) // 2
    cc, g, m = pippenger.plan_collapse(CURVE, n, c,
                                       budget_bytes=3 * n * 3 * h * 4)
    assert cc == c and g > 1, (cc, g, m)
    from zprize_tpu.msm import te_path
    packed, bad = te_path.prepare_points_collapsed(CURVE, aff.x, aff.y,
                                                   aff.inf, c * g, m)
    assert not bool(bad)
    prepared = pippenger.PreparedTe(packed, c, g, m, n)
    res = pippenger.msm(CURVE, aff, s, prepared=prepared)
    check(res, expected_msm(pts, scalars))


def test_plan_collapse_rejects_unsupported_window():
    """The planner must never emit a window the digit extraction cannot
    read (c + BASE_BITS - 1 <= 32): an explicit out-of-range request dies
    loudly instead of producing silent garbage."""
    from zprize_tpu.field.spec import BASE_BITS
    c_max = 32 - BASE_BITS + 1
    with pytest.raises(AssertionError):
        pippenger.plan_collapse(CURVE, 1 << 16, c_max + 2)
    # in-range boundary still plans fine
    cc, g, m = pippenger.plan_collapse(CURVE, 1 << 16, c_max)
    assert cc == c_max


@pytest.mark.parametrize("c", [14, 15, 16, 17, 18])
def test_signed_digits_wide_windows(c):
    """Regression: a window of c >= 16 bits spans THREE base-2^15 limbs
    when its in-word shift is high (sh + c > 30); the two-limb extraction
    silently truncated the top bits (r2/r3 bench mismatch at c=17 — the
    collapse planner's production window).  Every digit vector must
    reconstruct the exact scalar, for both limb-plane and compact-u16
    scalar forms."""
    rng = random.Random(MSM_SEED + c)
    n = 64
    scalars = [rng.randrange(CURVE.order) for _ in range(n)]
    scalars[:3] = [0, 1, CURVE.order - 1]
    n_win = pippenger.num_windows(CURVE, c)
    planes = fp.from_ints(CURVE.scalar, scalars)
    for s in (planes, fp.compact_scalars(CURVE.scalar, planes)):
        d = np.asarray(pippenger.signed_digits(CURVE, c, n_win, s)).astype(object)
        for k in range(n):
            val = sum(int(d[w, k]) << (c * w) for w in range(n_win))
            assert val == scalars[k], (c, k)
