"""Persistence for proving artifacts (SRS / preprocessed keys).

The checkpoint/resume subsystem of the reference is winderica's
disk-backed `SliceStorage` (keygen once, prove from disk —
`distributed/src/storage.rs:10-50`, artifact list `worker/mod.rs:146-172`)
and the GPU-resident caches (`snarkvm_msm_cache`).  Here artifacts are
compressed npz files of limb planes; device upload happens on load.

Security posture: files are loaded with ``allow_pickle=False`` (big ints are
stored as fixed-width u64 limb arrays, never as pickled objects), and
trapdoor-bearing test SRS files are refused by default — a test SRS carries
its own forgery key, so loading one must be an explicit opt-in.
"""

from __future__ import annotations

import numpy as np

from ..curve import sw
from ..curve.spec import ALL_CURVES
from . import kzg

_U64_WORDS = 8  # fits any <=512-bit field element / scalar


def _int_to_u64(v: int, words: int = _U64_WORDS) -> np.ndarray:
    out = np.zeros((words,), np.uint64)
    for i in range(words):
        out[i] = v & 0xFFFFFFFFFFFFFFFF
        v >>= 64
    assert v == 0, "int too large for u64 limb encoding"
    return out


def _u64_to_int(a: np.ndarray) -> int:
    v = 0
    for limb in reversed(np.asarray(a, np.uint64)):
        v = (v << 64) | int(limb)
    return v


def _g2_to_u64(q) -> np.ndarray:
    """Affine twist point ((x0,x1),(y0,y1)) -> (4, words) u64 array."""
    (x0, x1), (y0, y1) = q
    return np.stack([_int_to_u64(v) for v in (x0, x1, y0, y1)])


def _g2_from_u64(a: np.ndarray):
    x0, x1, y0, y1 = (_u64_to_int(row) for row in a)
    return ((x0, x1), (y0, y1))


def save_srs(path: str, srs: kzg.Srs):
    extra = {}
    if srs.h is not None:
        extra["h"] = _g2_to_u64(srs.h)
        extra["tau_h"] = _g2_to_u64(srs.tau_h)
    if srs.tau is not None:
        extra["tau"] = _int_to_u64(srs.tau)
    np.savez_compressed(
        path,
        curve=srs.curve.name,
        g1_x=np.asarray(srs.g1_powers.x),
        g1_y=np.asarray(srs.g1_powers.y),
        g1_inf=np.asarray(srs.g1_powers.inf),
        **extra,
    )


def load_srs(path: str, allow_trapdoor: bool = False) -> kzg.Srs:
    import jax.numpy as jnp
    data = np.load(path, allow_pickle=False)
    name = str(data["curve"])
    curve = next(c for c in ALL_CURVES if c.name == name)
    aff = sw.Affine(jnp.asarray(data["g1_x"]), jnp.asarray(data["g1_y"]),
                    jnp.asarray(data["g1_inf"]))
    h = _g2_from_u64(data["h"]) if "h" in data else None
    tau_h = _g2_from_u64(data["tau_h"]) if "tau_h" in data else None
    tau = None
    if "tau" in data:
        if not allow_trapdoor:
            raise ValueError(
                f"{path} is a trapdoor-bearing TEST SRS (it contains tau, "
                "i.e. its own forgery key); pass allow_trapdoor=True only "
                "in test code")
        tau = _u64_to_int(data["tau"])
    return kzg.Srs(curve, aff, h, tau_h, tau)
