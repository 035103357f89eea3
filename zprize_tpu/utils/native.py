"""ctypes bridge to the native host library (native/zk_host.cc).

Builds the shared object on first use with g++ (cached beside the source).
Everything here is host-side support — fixture generation, final reductions,
arkworks-style serialization — mirroring the reference's C++ host layer
(`HostReduce.cpp`, FPGA `host/driver/`).  The TPU compute path never
depends on it; callers fall back to the python oracle when a toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "zk_host.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libzkhost.so")

_lib = None

CURVE_ID = {"bls12_377_g1": 0, "bls12_381_g1": 1}


def available() -> bool:
    try:
        return _load() is not None
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                       check=True, capture_output=True)
    _lib = ctypes.CDLL(_SO)
    return _lib


def _limbs6(value: int) -> np.ndarray:
    out = np.zeros(6, dtype=np.uint64)
    for i in range(6):
        out[i] = value & 0xFFFFFFFFFFFFFFFF
        value >>= 64
    return out


def _from_limbs6(arr) -> int:
    v = 0
    for limb in reversed(list(arr)):
        v = (v << 64) | int(limb)
    return v


def point_chain(curve, start_mul: int, n: int) -> list:
    """[(start_mul+1)G, ..., (start_mul+n)G] as python (x, y) int tuples.

    ~1000x faster than the python oracle; used for bench fixtures."""
    lib = _load()
    gx, gy = _limbs6(curve.gen_x), _limbs6(curve.gen_y)
    out = np.zeros((n, 12), dtype=np.uint64)
    lib.point_chain(
        ctypes.c_int(CURVE_ID[curve.name]),
        gx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        gy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_uint64(start_mul),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_uint64(n))
    return [(_from_limbs6(row[:6]), _from_limbs6(row[6:])) for row in out]


def scalar_mul(curve, px: int, py: int, k: int):
    """k*P oracle; returns (x, y) or None for infinity."""
    lib = _load()
    xs, ys = _limbs6(px), _limbs6(py)
    ks = np.zeros(4, dtype=np.uint64)
    for i in range(4):
        ks[i] = k & 0xFFFFFFFFFFFFFFFF
        k >>= 64
    out = np.zeros(12, dtype=np.uint64)
    lib.scalar_mul(ctypes.c_int(CURVE_ID[curve.name]),
                   xs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                   ys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                   ks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    x, y = _from_limbs6(out[:6]), _from_limbs6(out[6:])
    return None if (x == 0 and y == 0) else (x, y)


def lincomb(curve, points, scalars):
    """sum_i scalars[i] * points[i] on the host (G1, affine int pairs,
    None = identity); returns (x, y) or None.  One interleaved
    multi-exponentiation in C — the verifier's RLC / batched-opening
    combine calls this once per batch instead of a python double-and-add
    ladder per term."""
    lib = _load()
    n = len(points)
    assert n == len(scalars)
    buf = np.zeros((n, 12), dtype=np.uint64)
    ks = np.zeros((n, 4), dtype=np.uint64)
    for i, (pt, k) in enumerate(zip(points, scalars)):
        if pt is not None:
            buf[i, :6] = _limbs6(pt[0])
            buf[i, 6:] = _limbs6(pt[1])
        assert 0 <= k < (1 << 256)
        for j in range(4):
            ks[i, j] = k & 0xFFFFFFFFFFFFFFFF
            k >>= 64
    out = np.zeros(12, dtype=np.uint64)
    lib.lincomb(ctypes.c_int(CURVE_ID[curve.name]),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                ks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                ctypes.c_uint64(n),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    x, y = _from_limbs6(out[:6]), _from_limbs6(out[6:])
    return None if (x == 0 and y == 0) else (x, y)


def host_combine_windows(curve, window_xyz_ints, window_bits: int):
    """Final 2^(c*w)-weighted window combination on the host
    (`HostReduce.cpp` role).  window_xyz_ints: list of (x, y, z) int tuples
    (projective, standard form).  Returns affine (x, y) or None."""
    lib = _load()
    n_win = len(window_xyz_ints)
    buf = np.zeros((n_win, 18), dtype=np.uint64)
    for i, (x, y, z) in enumerate(window_xyz_ints):
        buf[i, :6] = _limbs6(x)
        buf[i, 6:12] = _limbs6(y)
        buf[i, 12:] = _limbs6(z)
    out = np.zeros(12, dtype=np.uint64)
    lib.host_combine_windows(
        ctypes.c_int(CURVE_ID[curve.name]),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_uint64(n_win), ctypes.c_uint64(window_bits),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    x, y = _from_limbs6(out[:6]), _from_limbs6(out[6:])
    return None if (x == 0 and y == 0) else (x, y)


def serialize_points(curve, points, nbytes: int = 48) -> bytes:
    """Affine points -> arkworks-style uncompressed records (x||y LE bytes,
    infinity flag = bit 6 of the final byte)."""
    lib = _load()
    n = len(points)
    buf = np.zeros((n, 12), dtype=np.uint64)
    for i, pt in enumerate(points):
        if pt is not None:
            buf[i, :6] = _limbs6(pt[0])
            buf[i, 6:] = _limbs6(pt[1])
    out = np.zeros(n * 2 * nbytes, dtype=np.uint8)
    lib.serialize_points(ctypes.c_int(CURVE_ID[curve.name]),
                         buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                         ctypes.c_uint64(n), ctypes.c_uint64(nbytes),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()


def deserialize_points(curve, data: bytes, nbytes: int = 48) -> list:
    lib = _load()
    raw = np.frombuffer(data, dtype=np.uint8).copy()
    n = len(raw) // (2 * nbytes)
    pts = np.zeros((n, 12), dtype=np.uint64)
    infs = np.zeros(n, dtype=np.uint8)
    lib.deserialize_points(ctypes.c_int(CURVE_ID[curve.name]),
                           raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           ctypes.c_uint64(n), ctypes.c_uint64(nbytes),
                           pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                           infs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    out = []
    for i in range(n):
        if infs[i]:
            out.append(None)
        else:
            out.append((_from_limbs6(pts[i, :6]), _from_limbs6(pts[i, 6:])))
    return out
