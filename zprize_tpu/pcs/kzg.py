"""KZG10 polynomial commitments (commit / open) on top of the MSM engine.

Semantics follow the reference's KZG10 as used by both jf-plonk and snarkVM
(`snarkVM algorithms/src/polycommit/kzg10/mod.rs:216-402`): commit is an MSM
over the SRS G1 powers; the opening witness is p(X)-p(z) divided by (X-z).

Pairing-based verification requires the Fq12 tower + Miller loop (tracked as
a later milestone); until then `verify_with_trapdoor` provides an exact
group-equation check usable with the *test* SRS (which, like the reference's
`universal_setup` in `winderica/distributed/src/dispatcher.rs:49-81`, samples
tau in the clear).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..curve import sw
from ..curve.spec import CurveSpec
from ..field import fp
from ..msm import pippenger
from ..poly import ops as poly_ops


@dataclasses.dataclass
class Srs:
    """G1 powers of tau (affine batch).  `tau` is present only for test SRS
    (trapdoor verification); production SRS load drops it."""
    curve: CurveSpec
    g1_powers: sw.Affine              # (n,) affine batch: tau^i * G
    tau: int | None = None

    @property
    def size(self):
        return self.g1_powers.x.shape[0]


def setup_test_srs(curve: CurveSpec, size: int, seed: int = 0) -> Srs:
    """Deterministic test SRS: tau from a seeded host RNG; tau^i * G computed
    with one vectorized batch scalar-mul (253 wide complete adds — the
    device-side analog of arkworks' test `universal_setup`)."""
    import random
    rng = random.Random(seed ^ 0x5EED)
    tau = rng.randrange(1, curve.order)
    pows = [pow(tau, i, curve.order) for i in range(size)]
    s = fp.from_ints(curve.scalar, pows)
    g = sw.generator(curve, (size,))
    proj = sw.mul_scalar(curve, g, s)
    return Srs(curve, sw.to_affine(curve, proj), tau)


def commit(srs: Srs, coeffs: jax.Array, c: int | None = None) -> sw.Point:
    """Pedersen-free KZG commit: MSM(srs[:n], coeffs)."""
    n = coeffs.shape[0]
    assert n <= srs.size, "polynomial larger than SRS"
    points = sw.Affine(srs.g1_powers.x[:n], srs.g1_powers.y[:n],
                       srs.g1_powers.inf[:n])
    return pippenger.msm(srs.curve, points, coeffs, c=c)


def open_at(srs: Srs, coeffs: jax.Array, z: jax.Array):
    """Returns (witness commitment, evaluation y = p(z))."""
    curve = srs.curve
    q, y = poly_ops.divide_linear(curve.scalar, coeffs, z)
    w = commit(srs, q)
    return w, y


def verify_with_trapdoor(srs: Srs, commitment: sw.Point, z: jax.Array,
                         y: jax.Array, witness: sw.Point) -> bool:
    """Exact check of the KZG equation in G1 using the test trapdoor:
        (tau - z) * W == C - y*G.
    This is the same equation the pairing verifies in the exponent
    (`kzg10/mod.rs check`), evaluated directly since the test SRS knows tau."""
    assert srs.tau is not None, "trapdoor verification requires a test SRS"
    curve = srs.curve
    f = curve.scalar
    tau = fp.constant(f, srs.tau)
    lhs = sw.mul_scalar(curve, witness, fp.sub(f, tau, z))
    y_g = sw.mul_scalar(curve, sw.generator(curve), y)
    rhs = sw.add(curve, commitment, sw.neg(curve, y_g))
    return bool(jax.device_get(sw.eq(curve, lhs, rhs)))
