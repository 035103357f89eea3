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


class _StoredCircuit:
    """Light reload-side stand-in for `plonk.circuit.CompiledCircuit`: only
    what the prover touches after keygen (wire slot map + metadata).  The
    keygen-once / prove-from-disk split of the reference's `SliceStorage`
    (`winderica/distributed/src/storage.rs:10-50`)."""

    def __init__(self, spec, n, k1, k2, public_rows, wires):
        self.spec = spec
        self.n = n
        self.k1, self.k2 = k1, k2
        self.public_rows = list(public_rows)
        self.wires = wires

    def wire_values(self, assignment: dict[int, int]) -> np.ndarray:
        out = np.zeros((3, self.n), dtype=object)
        for col in range(3):
            for j in range(self.n):
                out[col, j] = assignment.get(
                    int(self.wires[col, j]), 0) % self.spec.p
        return out


def save_pk(path: str, pk) -> None:
    """Persist a PLONK ProvingKey (everything `prove` needs except the SRS,
    which is stored separately via `save_srs` — pass it to `load_pk`)."""
    sel_names = sorted(pk.selectors)
    com_names = sorted(pk.commitments)
    arrays = {
        "curve": pk.curve.name,
        "n": np.int64(pk.circuit.n),
        "coset_g": _int_to_u64(pk.coset_g),
        "k1": _int_to_u64(pk.circuit.k1),
        "k2": _int_to_u64(pk.circuit.k2),
        "public_rows": np.asarray(pk.circuit.public_rows, np.int64),
        "wires": np.asarray(pk.circuit.wires, np.int64),
        "sel_names": np.array(sel_names),
        "com_names": np.array(com_names),
        "sigma_coeffs": np.asarray(pk.sigma_coeffs),
        "sigma_evals": np.asarray(pk.sigma_evals),
        "id_evals": np.asarray(pk.id_evals),
    }
    for name in sel_names:
        arrays[f"sel_{name}"] = np.asarray(pk.selectors[name])
    for name in com_names:
        c = pk.commitments[name]
        arrays[f"com_{name}"] = np.stack(
            [np.asarray(c.x), np.asarray(c.y), np.asarray(c.z)])
    np.savez_compressed(path, **arrays)


def load_pk(path: str, srs: "kzg.Srs"):
    """Reload a ProvingKey next to its SRS; no keygen recomputation (the
    selector/sigma INTTs and commitment MSMs happen once, at `setup`)."""
    import jax.numpy as jnp

    from ..curve import sw as sw_mod
    from ..ntt.domain import Domain
    from ..plonk import prover as plonk_prover

    data = np.load(path, allow_pickle=False)
    name = str(data["curve"])
    curve = next(c for c in ALL_CURVES if c.name == name)
    fr = curve.scalar
    n = int(data["n"])
    circuit = _StoredCircuit(fr, n, _u64_to_int(data["k1"]),
                             _u64_to_int(data["k2"]),
                             [int(v) for v in data["public_rows"]],
                             np.asarray(data["wires"], np.int64))
    selectors = {str(nm): jnp.asarray(data[f"sel_{nm}"])
                 for nm in data["sel_names"]}
    commitments = {}
    for nm in data["com_names"]:
        c = data[f"com_{nm}"]
        commitments[str(nm)] = sw_mod.Point(
            jnp.asarray(c[0]), jnp.asarray(c[1]), jnp.asarray(c[2]))
    log_n = n.bit_length() - 1
    vk = plonk_prover.VerifyingKey(curve, n, circuit.k1, circuit.k2,
                                   list(circuit.public_rows),
                                   dict(commitments))
    return plonk_prover.ProvingKey(
        curve=curve, circuit=circuit, srs=srs,
        dom=Domain(fr, log_n), dom4=Domain(fr, log_n + 2),
        coset_g=_u64_to_int(data["coset_g"]),
        selectors=selectors,
        sigma_coeffs=jnp.asarray(data["sigma_coeffs"]),
        sigma_evals=jnp.asarray(data["sigma_evals"]),
        id_evals=jnp.asarray(data["id_evals"]),
        commitments=commitments, vk=vk)


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
