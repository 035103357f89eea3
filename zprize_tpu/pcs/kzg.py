"""KZG10 polynomial commitments (commit / open / pairing verify) on top of
the MSM engine.

Semantics follow the reference's KZG10 as used by both jf-plonk and snarkVM
(`snarkVM algorithms/src/polycommit/kzg10/mod.rs:216-402`): commit is an MSM
over the SRS G1 powers; the opening witness is p(X)-p(z) divided by (X-z);
`verify` is the pairing check e(C - y*G + z*W, H) * e(-W, tau*H) == 1
(`kzg10/mod.rs` `check`, `winderica/plonk/src/proof_system/verifier.rs:229`).
The pairing product runs on the host (`pairing/host.py`) — a few hundred
bytes of group elements, the direct analog of the reference's host-side final
reduction — while commit/open stay on device.

`verify_with_trapdoor` remains for tests: the identical group equation
evaluated in G1 using a test-SRS tau.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..curve import sw
from ..curve.spec import CurveSpec
from ..field import fp
from ..msm import pippenger
from ..pairing.host import g1_add, g1_mul, g1_neg, host_pairing
from ..pairing.params import pairing_for_curve
from ..poly import ops as poly_ops


@dataclasses.dataclass
class Srs:
    """G1 powers of tau plus the two G2 elements (H, tau*H) the pairing check
    needs.  `tau` is present only for test SRS (trapdoor verification);
    production SRS load drops it."""
    curve: CurveSpec
    g1_powers: sw.Affine              # (n,) affine batch: tau^i * G
    h: tuple | None = None            # G2 generator, affine Fq2 int pairs
    tau_h: tuple | None = None        # tau * H
    tau: int | None = None
    _prepared: dict = dataclasses.field(default_factory=dict, repr=False)

    @property
    def size(self):
        return self.g1_powers.x.shape[0]

    def prepared(self, n: int, shift: int = 0):
        """Cached fixed-base MSM preprocessing for the [shift, shift+n) SRS
        slice (TE conversion + window-precompute table — the analog of the
        reference's persisted `snarkvm_msm_cache`).  The SRS never changes,
        so every commit of a given size reuses the same table.  `shift > 0`
        is the sonic_pc shifted-powers slice (degree-bound commitments:
        com(X^shift * p) = MSM(srs[shift:shift+n], p) —
        `snarkVM polycommit/sonic_pc/mod.rs` shifted_powers_of_beta_g)."""
        key = (shift, n)
        if key not in self._prepared:
            pts = sw.Affine(self.g1_powers.x[shift:shift + n],
                            self.g1_powers.y[shift:shift + n],
                            self.g1_powers.inf[shift:shift + n])
            self._prepared[key] = pippenger.prepare_points(self.curve, pts)
        return self._prepared[key]


def setup_test_srs(curve: CurveSpec, size: int, seed: int = 0) -> Srs:
    """Deterministic test SRS: tau from a seeded host RNG; tau^i * G computed
    with one vectorized batch scalar-mul (253 wide complete adds — the
    device-side analog of arkworks' test `universal_setup`); G2 side on the
    host (two points)."""
    import random
    rng = random.Random(seed ^ 0x5EED)
    tau = rng.randrange(1, curve.order)
    pows = [pow(tau, i, curve.order) for i in range(size)]
    s = fp.from_ints(curve.scalar, pows)
    g = sw.generator(curve, (size,))
    proj = sw.mul_scalar(curve, g, s)
    hp = host_pairing(pairing_for_curve(curve))
    h = hp.g2_gen
    tau_h = hp.g2_mul(h, tau)
    return Srs(curve, sw.to_affine(curve, proj), h, tau_h, tau)


def commit(srs: Srs, coeffs: jax.Array, c: int | None = None,
           shift: int = 0) -> sw.Point:
    """Pedersen-free KZG commit: MSM(srs[shift:shift+n], coeffs) — with
    `shift` this commits X^shift * p(X) via the shifted-powers slice
    (degree-bound enforcement, sonic_pc role)."""
    n = coeffs.shape[0]
    assert shift + n <= srs.size, "polynomial larger than SRS"
    points = sw.Affine(srs.g1_powers.x[shift:shift + n],
                       srs.g1_powers.y[shift:shift + n],
                       srs.g1_powers.inf[shift:shift + n])
    return pippenger.msm(srs.curve, points, coeffs, c=c,
                         prepared=srs.prepared(n, shift))


def commit_batch(srs: Srs, coeffs: jax.Array, c: int | None = None,
                 cap: int | None = None, shift: int = 0) -> sw.Point:
    """Batched KZG commit: (B, n, L) coefficient planes -> (B,)-lane
    projective commitments in ONE jittable pass (no host sync) via the
    window-stacked batched MSM (`pippenger.msm_jit_batch`).  `cap` bounds
    per-bucket occupancy (default 4x the uniform mean; a loud in-graph
    check raises on overflow rather than dropping points).  `shift` selects
    the shifted-powers SRS slice (commits X^shift * p)."""
    import math
    bsz, n = coeffs.shape[:2]
    assert shift + n <= srs.size, "polynomial larger than SRS"
    points = sw.Affine(srs.g1_powers.x[shift:shift + n],
                       srs.g1_powers.y[shift:shift + n],
                       srs.g1_powers.inf[shift:shift + n])
    if c is None:
        c = pippenger.default_window_bits(n)
    if cap is None:
        mean = max(1, n // (1 << (c - 1)))
        cap = max(16, 1 << math.ceil(math.log2(mean * 4 + 8)))
    return pippenger.msm_jit_batch(srs.curve, points, coeffs, c,
                                   min(cap, n))


def open_at(srs: Srs, coeffs: jax.Array, z: jax.Array):
    """Returns (witness commitment, evaluation y = p(z))."""
    curve = srs.curve
    q, y = poly_ops.divide_linear(curve.scalar, coeffs, z)
    w = commit(srs, q)
    return w, y


def point_ints(curve: CurveSpec, p: sw.Point):
    """Device point -> host affine int pair (None for the identity)."""
    aff = sw.to_affine(curve, p)
    if bool(jax.device_get(jnp.all(aff.inf))):
        return None
    x = int(fp.to_ints(curve.field, aff.x)[()])
    y = int(fp.to_ints(curve.field, aff.y)[()])
    return (x, y)


def fr_int(curve: CurveSpec, x: jax.Array) -> int:
    return int(fp.to_ints(curve.scalar, x)[()])


def verify(srs: Srs, commitment: sw.Point, z, y, witness: sw.Point) -> bool:
    """Real KZG verification via the ate pairing:
        e(C - y*G + z*W, H) * e(-W, tau*H) == 1.
    `z`/`y` may be Fr planes or python ints; the group combination and the
    two Miller loops run on the host (a handful of points)."""
    assert srs.h is not None and srs.tau_h is not None, "SRS lacks G2 side"
    curve = srs.curve
    p = curve.field.p
    z_i = z if isinstance(z, int) else fr_int(curve, z)
    y_i = y if isinstance(y, int) else fr_int(curve, y)
    c_pt = point_ints(curve, commitment)
    w_pt = point_ints(curve, witness)
    g = (curve.gen_x, curve.gen_y)
    # A = C - y*G + z*W
    a_pt = g1_add(p, c_pt, g1_neg(p, g1_mul(p, g, y_i)))
    if w_pt is not None:
        a_pt = g1_add(p, a_pt, g1_mul(p, w_pt, z_i))
    hp = host_pairing(pairing_for_curve(curve))
    pairs = []
    if a_pt is not None:
        pairs.append((a_pt, hp.g2_gen))
    if w_pt is not None:
        pairs.append((g1_neg(p, w_pt), srs.tau_h))
    if not pairs:
        return True
    return hp.multi_pairing_is_one(pairs)


def combine_ints(curve, pts, ks):
    """sum_i ks[i] * pts[i] over host affine int pairs (None = identity;
    scalars already reduced mod the group order).  Routes to the native
    interleaved multi-exponentiation (`native.lincomb`, ~4 ms for 20
    terms) when the toolchain is available; python double-and-add fold
    otherwise (~0.5 s for the same 20 terms — the r5 verify-bench
    profile's second hotspot)."""
    from ..utils import native
    if native.available() and curve.name in native.CURVE_ID:
        return native.lincomb(curve, pts, ks)
    p = curve.field.p
    acc = None
    for pt, k in zip(pts, ks):
        if pt is None:
            continue
        acc = g1_add(p, acc, g1_mul(p, pt, k))
    return acc


def verify_many(srs: Srs, checks, rng=None) -> bool:
    """ONE multi-pairing for N KZG opening checks — the batch-verification
    trick of the team-prize1 track (sean-sn: amortize the pairing across
    rounds).  `checks` is a list of (c_pt, z, y, w_pt) with c_pt/w_pt host
    affine int pairs (None = identity) and z/y ints.  Soundness: a random
    r_i (from `rng`, default system entropy) weights each equation
        e(C_i - y_i*G + z_i*W_i, H) * e(-W_i, tau*H) == 1
    so a forged instance escapes only with probability ~1/r."""
    import random as _rnd
    assert srs.h is not None and srs.tau_h is not None, "SRS lacks G2 side"
    curve = srs.curve
    p = curve.field.p
    rng = rng if rng is not None else _rnd.SystemRandom()
    g = (curve.gen_x, curve.gen_y)
    # flatten the RLC into TWO linear combinations:
    #   acc_a = sum_i r_i*C_i + sum_i (r_i*z_i)*W_i - (sum_i r_i*y_i)*G
    #   acc_b = sum_i r_i*W_i
    # so the whole group combination is two `combine_ints` calls (native
    # multi-exp) instead of ~3 python scalar ladders per check
    a_pts, a_ks, b_pts, b_ks = [], [], [], []
    gy_sum = 0
    for c_pt, z_i, y_i, w_pt in checks:
        r = rng.randrange(1, curve.order) if len(checks) > 1 else 1
        if c_pt is not None:
            a_pts.append(c_pt)
            a_ks.append(r)
        gy_sum = (gy_sum + r * y_i) % curve.order
        if w_pt is not None:
            a_pts.append(w_pt)
            a_ks.append(r * z_i % curve.order)
            b_pts.append(w_pt)
            b_ks.append(r)
    if gy_sum:
        a_pts.append(g)
        a_ks.append(curve.order - gy_sum)
    acc_a = combine_ints(curve, a_pts, a_ks)
    acc_b = combine_ints(curve, b_pts, b_ks) if b_pts else None
    hp = host_pairing(pairing_for_curve(curve))
    pairs = []
    if acc_a is not None:
        pairs.append((acc_a, hp.g2_gen))
    if acc_b is not None:
        pairs.append((g1_neg(p, acc_b), srs.tau_h))
    if not pairs:
        return True
    return hp.multi_pairing_is_one(pairs)


def verify_with_trapdoor(srs: Srs, commitment: sw.Point, z: jax.Array,
                         y: jax.Array, witness: sw.Point) -> bool:
    """Exact check of the KZG equation in G1 using the test trapdoor:
        (tau - z) * W == C - y*G.
    This is the same equation `verify` checks in the exponent, evaluated
    directly since the test SRS knows tau (kept as the fast test gate)."""
    assert srs.tau is not None, "trapdoor verification requires a test SRS"
    curve = srs.curve
    f = curve.scalar
    tau = fp.constant(f, srs.tau)
    lhs = sw.mul_scalar(curve, witness, fp.sub(f, tau, z))
    y_g = sw.mul_scalar(curve, sw.generator(curve), y)
    rhs = sw.add(curve, commitment, sw.neg(curve, y_g))
    return bool(jax.device_get(sw.eq(curve, lhs, rhs)))
