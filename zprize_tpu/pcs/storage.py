"""Persistence for proving artifacts (SRS / preprocessed keys).

The checkpoint/resume subsystem of the reference is winderica's
disk-backed `SliceStorage` (keygen once, prove from disk —
`distributed/src/storage.rs:10-50`, artifact list `worker/mod.rs:146-172`)
and the GPU-resident caches (`snarkvm_msm_cache`).  Here artifacts are
compressed npz files of limb planes; device upload happens on load.
"""

from __future__ import annotations

import numpy as np

from ..curve import sw
from ..curve.spec import ALL_CURVES, CurveSpec
from . import kzg


def save_srs(path: str, srs: kzg.Srs):
    np.savez_compressed(
        path,
        curve=srs.curve.name,
        g1_x=np.asarray(srs.g1_powers.x),
        g1_y=np.asarray(srs.g1_powers.y),
        g1_inf=np.asarray(srs.g1_powers.inf),
        tau=np.array([srs.tau if srs.tau is not None else 0], dtype=object),
        has_tau=np.array([srs.tau is not None]),
    )


def load_srs(path: str) -> kzg.Srs:
    import jax.numpy as jnp
    data = np.load(path, allow_pickle=True)
    name = str(data["curve"])
    curve = next(c for c in ALL_CURVES if c.name == name)
    aff = sw.Affine(jnp.asarray(data["g1_x"]), jnp.asarray(data["g1_y"]),
                    jnp.asarray(data["g1_inf"]))
    tau = int(data["tau"][0]) if bool(data["has_tau"][0]) else None
    return kzg.Srs(curve, aff, tau)
