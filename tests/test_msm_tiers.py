"""Occupancy-sorted (tiered) Pallas accumulate vs the XLA reference path
(interpret mode; the tier schedule + lane sorting must be bit-exact)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zprize_tpu.curve import sw
from zprize_tpu.curve.spec import BLS12_377_G1 as CURVE
from zprize_tpu.field import fp
from zprize_tpu.msm import pippenger as pip
from zprize_tpu.msm.accum_kernel import accumulate_pass_pallas, tier_schedule

import ec_ref


def test_tiered_accumulate_matches_xla():
    rng = random.Random(9)
    n, c = 512, 12
    pts = ec_ref.random_subgroup_points(CURVE, 8, seed=11)
    pts = [pts[i % 8] for i in range(n)]
    scalars = [rng.randrange(CURVE.order) for _ in range(n)]
    aff = sw.Affine(fp.from_ints(CURVE.field, [p[0] for p in pts]),
                    fp.from_ints(CURVE.field, [p[1] for p in pts]),
                    jnp.zeros((n,), bool))
    s = fp.from_ints(CURVE.scalar, scalars)
    nw = pip.num_windows(CURVE, c)
    digits = pip.signed_digits(CURVE, c, nw, s)
    perm, starts, counts, _ = pip.bucket_counts_all(c, digits)
    jw = jnp.asarray([0, 1])
    d_g, p_g, s_g, c_g = digits[jw], perm[jw], starts[jw], counts[jw]
    nbe = 1 << (c - 1)
    lane_counts = np.asarray(jax.device_get(c_g[:, 1:nbe + 1])).reshape(-1)
    pad = (-lane_counts.size) % 512
    desc = np.sort(np.concatenate(
        [lane_counts, np.zeros(pad, lane_counts.dtype)]))[::-1]
    tiers = tier_schedule(desc)
    # depths are quantized up for compile stability — coverage, not equality
    assert tiers[-1] >= int(desc[0])
    ref = pip.accumulate_pass_all(CURVE, c, int(desc[0]), aff.x, aff.y,
                                  d_g, p_g, s_g, c_g)
    got = accumulate_pass_pallas(CURVE, c, 0, aff.x, aff.y, d_g, p_g,
                                 s_g, c_g, None, True, 1, tiers)
    assert bool(jnp.all(sw.eq(CURVE, ref, got)))
