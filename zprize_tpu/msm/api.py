"""Competition-shaped MSM API (prize1a surface parity).

Mirrors `multi_scalar_mult_init` / `multi_scalar_mult`
(`prize1a-msm-gpu/yrrid/src/lib.rs:38-90`): an init step that uploads and
preprocesses the fixed point set, then batched MSMs against it (the
benchmark harness calls with a batch of 4 scalar vectors at 2^26).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..curve import sw
from ..curve.spec import CurveSpec
from ..field import fp
from . import pippenger


@dataclasses.dataclass
class MsmContext:
    """Device-resident preprocessed points (the reference's
    `MultiScalarMultContext`/`MSMContext`).  `prepared` holds the
    curve-form-specific preprocessing (TE conversion + row packing) done
    once at init, untimed — exactly the split the reference benchmark
    measures (`yrrid/benches/msm.rs:13-46` times only the batch calls)."""
    curve: CurveSpec
    points: sw.Affine
    window_bits: int
    prepared: object = None

    @property
    def size(self):
        return self.points.x.shape[0]


def multi_scalar_mult_init(curve: CurveSpec, points_xy, inf=None,
                           window_bits: int | None = None) -> MsmContext:
    """points_xy: python int pairs [(x, y) | None] or an `sw.Affine`.
    Uploads once; reused across batches (the reference preprocesses points
    into device memory at init, `MSM.cu:348-385`)."""
    if isinstance(points_xy, sw.Affine):
        aff = points_xy
    else:
        xs = [0 if p is None else p[0] for p in points_xy]
        ys = [1 if p is None else p[1] for p in points_xy]
        infs = [p is None for p in points_xy]
        import numpy as np
        aff = sw.Affine(fp.from_ints(curve.field, xs),
                        fp.from_ints(curve.field, ys),
                        jnp.asarray(np.array(infs)))
    n = aff.x.shape[0]
    prepared = pippenger.prepare_points(curve, aff, window_bits)
    c = (prepared.c if prepared is not None
         else window_bits or pippenger.default_window_bits(n))
    return MsmContext(curve, aff, c, prepared)


def multi_scalar_mult(ctx: MsmContext, scalars: jax.Array) -> list[sw.Point]:
    """Batched MSM: scalars (batch, n, L) or (n, L); returns one projective
    result per batch (the reference returns `Vec<G::Projective>`)."""
    if scalars.ndim == 2:
        scalars = scalars[None]
    out = []
    for b in range(scalars.shape[0]):
        out.append(pippenger.msm(ctx.curve, ctx.points, scalars[b],
                                 c=ctx.window_bits, prepared=ctx.prepared))
    return out
