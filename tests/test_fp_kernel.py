"""Direct differential tests for the kernel-form field engine and the
Pallas MSM kernels that previously only ran on real TPU.

Chain: python ints -> fp (XLA form) -> fp_kernel (limb-major kernel form).
The two engines must be bit-identical on normal-form inputs (limbs < 2**16,
including redundant representatives >= p).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zprize_tpu.field import fp
from zprize_tpu.field import fp_kernel as fk
from zprize_tpu.field.spec import ALL_SPECS, int_from_limbs


def _random_normal_form(rng, spec, batch):
    """Random normal-form planes, including limbs in [2**15, 2**16) and
    values >= p (redundant representatives)."""
    return rng.integers(0, 1 << 16, size=(batch, spec.n_limbs),
                        dtype=np.uint32)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_kernel_ops_match_fp(spec):
    rng = np.random.default_rng(7)
    batch = 32
    a_np = _random_normal_form(rng, spec, batch)
    b_np = _random_normal_form(rng, spec, batch)
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)
    at, bt = a.T, b.T                       # limb-major kernel layout
    ft = jnp.asarray(fk.fold_table_t(spec))
    neg2 = jnp.asarray(fk.neg2_col(spec))

    pairs = [
        ("mul", fp.mul(spec, a, b), fk.kmul(spec, at, bt, ft)),
        ("add", fp.add(spec, a, b), fk.kadd(spec, at, bt, ft)),
        ("sub", fp.sub(spec, a, b), fk.ksub(spec, at, bt, ft, neg2)),
        ("neg", fp.neg(spec, a), fk.kneg(spec, at, ft, neg2)),
        ("mulc3", fp.mul_const(spec, a, 3), fk.kmul_const(spec, at, 3, ft)),
    ]
    for name, ref, got in pairs:
        got_bm = np.asarray(jax.device_get(got)).T
        ref_np = np.asarray(jax.device_get(ref))
        assert np.array_equal(got_bm, ref_np), f"{spec.name} {name} mismatch"
        # value-level check against python ints for a few lanes
        for i in range(4):
            assert (int_from_limbs(got_bm[i]) % spec.p
                    == int_from_limbs(ref_np[i]) % spec.p)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_kmul_mxu_and_hybrid_match_kmul(spec):
    """The three multiply schedules agree: mxu/hybrid share the fold path
    (bit-identical to each other); all three are normal-form and
    value-identical mod p to the VPU form (whose reduction plan differs,
    so representatives may differ)."""
    rng = np.random.default_rng(13)
    batch = 32
    a_np = _random_normal_form(rng, spec, batch)
    b_np = _random_normal_form(rng, spec, batch)
    at, bt = jnp.asarray(a_np).T, jnp.asarray(b_np).T
    ft = jnp.asarray(fk.fold_table_t(spec))
    smat, fmat, _, _ = fk.mxu_tables(spec)
    ref = np.asarray(jax.device_get(fk.kmul(spec, at, bt, ft))).T
    got_mxu = np.asarray(jax.device_get(
        fk.kmul_mxu(spec, at, bt, jnp.asarray(smat), jnp.asarray(fmat),
                    ft))).T
    got_hyb = np.asarray(jax.device_get(
        fk.kmul_hybrid(spec, at, bt, jnp.asarray(fmat), ft))).T
    assert np.array_equal(got_mxu, got_hyb), f"{spec.name} mxu!=hybrid"
    # tree diagonal accumulation: bit-identical to the flat schedule
    tree = np.asarray(jax.device_get(
        fk.kmul(spec, at, bt, ft, diag="tree"))).T
    assert np.array_equal(tree, ref), f"{spec.name} kmul tree!=flat"
    hyb_tree = np.asarray(jax.device_get(
        fk.kmul_hybrid(spec, at, bt, jnp.asarray(fmat), ft,
                       diag="tree"))).T
    assert np.array_equal(hyb_tree, got_hyb), f"{spec.name} hybrid tree!=flat"
    assert got_mxu.max() < (1 << 16) and ref.max() < (1 << 16)
    for i in range(batch):
        expect = (int_from_limbs(a_np[i]) * int_from_limbs(b_np[i])) % spec.p
        assert int_from_limbs(ref[i]) % spec.p == expect
        assert int_from_limbs(got_mxu[i]) % spec.p == expect


def test_te_kernels_hybrid_interpret():
    """TE mixed/full add kernels across multiply modes (interpret):
    hybrid is bit-identical to mxu (shared fold path); both match the vpu
    form canonically (value mod p)."""
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.msm.accum_kernel import (make_te_full_add,
                                             make_te_mixed_add)
    curve = BLS12_377_G1
    f = curve.field
    n = f.n_limbs
    h = (n + 1) // 2
    rows_n = 3 * h + (-3 * h) % 8
    lanes = 128
    rng = np.random.default_rng(3)
    mk = lambda shape: jnp.asarray(
        rng.integers(0, 1 << 15, shape).astype(np.uint32))
    x, y, z, t = (mk((n, lanes)) for _ in range(4))
    rows = mk((rows_n, lanes))
    mask = jnp.asarray((rng.integers(0, 4, (1, lanes))).astype(np.uint32))

    def canon(planes):
        return [np.asarray(jax.device_get(fp.to_canonical(f, o.T)))
                for o in planes]

    outs, raws = {}, {}
    for mode in ("vpu", "mxu", "hybrid", "hybrid-tree", "vpu-tree"):
        add = make_te_mixed_add(curve, lanes, lanes, interpret=True,
                                kmul_mode=mode)
        raw = add(x, y, z, t, rows, mask)
        raws[mode] = [np.asarray(jax.device_get(o)) for o in raw]
        outs[mode] = canon(raw)
    for a, b in zip(raws["mxu"], raws["hybrid"]):
        assert np.array_equal(a, b), "mixed: hybrid != mxu bitwise"
    for a, b in zip(raws["hybrid"], raws["hybrid-tree"]):
        assert np.array_equal(a, b), "mixed: hybrid-tree != hybrid bitwise"
    for a, b in zip(raws["vpu"], raws["vpu-tree"]):
        assert np.array_equal(a, b), "mixed: vpu-tree != vpu bitwise"
    for a, b in zip(outs["vpu"], outs["hybrid"]):
        assert np.array_equal(a, b), "mixed: hybrid != vpu canonically"

    x2, y2, z2, t2 = (mk((n, lanes)) for _ in range(4))
    skip = jnp.asarray((rng.integers(0, 2, (1, lanes))).astype(np.uint32))
    outs, raws = {}, {}
    for mode in ("vpu", "mxu", "hybrid"):
        add = make_te_full_add(curve, lanes, lanes, interpret=True,
                               kmul_mode=mode)
        raw = add(x, y, z, t, x2, y2, z2, t2, skip)
        raws[mode] = [np.asarray(jax.device_get(o)) for o in raw]
        outs[mode] = canon(raw)
    for a, b in zip(raws["mxu"], raws["hybrid"]):
        assert np.array_equal(a, b), "full: hybrid != mxu bitwise"
    for a, b in zip(outs["vpu"], outs["hybrid"]):
        assert np.array_equal(a, b), "full: hybrid != vpu canonically"


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_kernel_mul_int_oracle(spec):
    """kmul against the python-int oracle directly."""
    rng = np.random.default_rng(11)
    a_np = _random_normal_form(rng, spec, 8)
    b_np = _random_normal_form(rng, spec, 8)
    ft = jnp.asarray(fk.fold_table_t(spec))
    out = np.asarray(jax.device_get(
        fk.kmul(spec, jnp.asarray(a_np).T, jnp.asarray(b_np).T, ft))).T
    for i in range(8):
        expect = (int_from_limbs(a_np[i]) * int_from_limbs(b_np[i])) % spec.p
        assert int_from_limbs(out[i]) % spec.p == expect
        assert out[i].max() < (1 << 16), "kernel result not normal form"


def _small_msm_case(seed=5, n=64, c=6):
    import random
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.curve import sw
    from zprize_tpu.msm import pippenger
    curve = BLS12_377_G1
    rng = random.Random(seed)
    import ec_ref
    base = ec_ref.random_subgroup_points(curve, 8, seed=seed)
    px = fp.from_ints(curve.field, [p[0] for p in base] * (n // 8))
    py = fp.from_ints(curve.field, [p[1] for p in base] * (n // 8))
    points = sw.Affine(px, py, jnp.zeros((n,), bool))
    s = fp.from_ints(curve.scalar,
                     [rng.randrange(curve.order) for _ in range(n)])
    n_win = pippenger.num_windows(curve, c)
    digits = pippenger.signed_digits(curve, c, n_win, s)
    perm, starts, counts, _ = pippenger.bucket_counts_all(c, digits)
    return curve, points, digits, perm, starts, counts


def test_merge_buckets_pallas_interpret():
    """merge_buckets_pallas (interpret mode) vs merge_buckets_all."""
    from zprize_tpu.curve import sw
    from zprize_tpu.msm import pippenger
    from zprize_tpu.msm.accum_kernel import merge_buckets_pallas

    curve, points, digits, perm, starts, counts = _small_msm_case()
    c = 6
    sums = pippenger.accumulate_pass_all(
        curve, c, 64, points.x, points.y, digits, perm, starts, counts)
    ref = pippenger.merge_buckets_all(curve, c, sums)
    got = merge_buckets_pallas(curve, c, True, sums)
    assert bool(jax.device_get(jnp.all(sw.eq(curve, ref, got))))


def test_mixed_add_multi_interpret():
    """rank-batched accumulate kernel (interpret) vs the XLA reference."""
    from zprize_tpu.curve import sw
    from zprize_tpu.msm import pippenger
    from zprize_tpu.msm.accum_kernel import accumulate_pass_pallas

    curve, points, digits, perm, starts, counts = _small_msm_case()
    c = 6
    ref = pippenger.accumulate_pass_all(
        curve, c, 8, points.x, points.y, digits, perm, starts, counts)
    for rb in (1, 2):
        got = accumulate_pass_pallas(
            curve, c, 8, points.x, points.y, digits, perm, starts, counts,
            interpret=True, rank_batch=rb)
        assert bool(jax.device_get(jnp.all(sw.eq(curve, ref, got)))), rb


def test_accumulate_rect_interpret():
    """Materialized-rectangle accumulate (interpret) vs the XLA reference,
    with an occupancy-sorted tier schedule."""
    import numpy as np
    from zprize_tpu.curve import sw
    from zprize_tpu.msm import pippenger
    from zprize_tpu.msm.accum_kernel import (accumulate_rect_pallas,
                                             tier_schedule)

    curve, points, digits, perm, starts, counts = _small_msm_case()
    c = 6
    nbe = 1 << (c - 1)
    lane_counts = np.asarray(jax.device_get(counts[:, 1:nbe + 1])).reshape(-1)
    pad = (-lane_counts.size) % 128
    desc = np.sort(np.concatenate(
        [lane_counts, np.zeros(pad, lane_counts.dtype)]))[::-1]
    tiers = tier_schedule(desc, tile=128)
    ref = pippenger.accumulate_pass_all(
        curve, c, int(desc[0]), points.x, points.y, digits, perm, starts,
        counts)
    got = accumulate_rect_pallas(curve, c, tiers, points.x, points.y,
                                 digits, perm, starts, counts, nbe,
                                 interpret=True)
    assert bool(jax.device_get(jnp.all(sw.eq(curve, ref, got))))


def test_msm_jit_static_occupancy_guard():
    """Adversarial occupancy (all scalars equal) must raise, not silently
    drop points."""
    import random
    from zprize_tpu.curve.spec import BLS12_377_G1
    from zprize_tpu.curve import sw
    from zprize_tpu.msm import pippenger
    import ec_ref

    curve = BLS12_377_G1
    n = 32
    base = ec_ref.random_subgroup_points(curve, 8, seed=3)
    px = fp.from_ints(curve.field, [p[0] for p in base] * (n // 8))
    py = fp.from_ints(curve.field, [p[1] for p in base] * (n // 8))
    points = sw.Affine(px, py, jnp.zeros((n,), bool))
    s = fp.from_ints(curve.scalar, [12345] * n)   # all in the same buckets
    with pytest.raises(Exception, match="occupancy"):
        res = pippenger.msm_jit_static(curve, points, s, c=6, cap_total=4)
        jax.block_until_ready(res)
