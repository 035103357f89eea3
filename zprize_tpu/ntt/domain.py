"""NTT evaluation domains: roots of unity and twiddle tables.

Parity note: for Goldilocks we pin the primitive 2^32-th root of unity to
the value used by the prize2-ntt reference vectors
(`open-division/prize2-ntt/cosic/testvectors/testvectors.py:5`,
omega for N=2^32), so transforms are bit-exact against the competition's
golden files.  For other fields the root is derived from the field's
multiplicative generator (same convention as arkworks Radix2 domains,
cf. snarkVM `algorithms/src/fft/domain.rs`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp
from ..field.spec import GOLDILOCKS, FieldSpec

# Reference 2^32-th root for Goldilocks (cosic testvectors.py, N=2**32).
_GOLDILOCKS_W32 = 11724716146725638212


def primitive_root(spec: FieldSpec, log_n: int) -> int:
    """A primitive 2^log_n-th root of unity as a python int."""
    assert log_n <= spec.two_adicity, (
        f"{spec.name} supports only 2^{spec.two_adicity} domains")
    if spec.name == GOLDILOCKS.name:
        w = _GOLDILOCKS_W32
        for _ in range(32 - log_n):
            w = w * w % spec.p
        return w
    w = spec.root_of_unity
    for _ in range(spec.two_adicity - log_n):
        w = w * w % spec.p
    return w


@functools.lru_cache(maxsize=None)
def _power_table_np(spec: FieldSpec, count: int, w: int) -> np.ndarray:
    """[1, w, w^2, ..., w^(count-1)] limb planes, HOST-built (numpy,
    python-int running product — exact by definition).

    r5 correctness fix: the previous on-device log-doubling jit produced
    WRONG limbs for the TOP HALF of the 2^17-entry Fr table on XLA:TPU
    (the final multiply-by-constant doubling step miscompiled; XLA:CPU
    was exact, and `fp.mul` alone on the same shapes was exact — the bug
    was specific to the fused concat+broadcast-constant graph).  Every
    2^18+ Fr transform inherited wrong twiddles, which is how the first
    2^16-gate PLONK proof on hardware failed to verify.  Host build also
    honors the house rule that cached tables are numpy (tracer-leak
    gotcha, CLAUDE.md)."""
    vals = [1] * count
    for k in range(1, count):
        vals[k] = vals[k - 1] * w % spec.p
    return fp.from_ints_np(spec, vals)


def _power_table(spec: FieldSpec, count: int, w: int) -> jax.Array:
    return jnp.asarray(_power_table_np(spec, count, w))


class Domain:
    """Radix-2 evaluation domain of size 2^log_n over `spec`.

    Holds device twiddle tables; construct once and reuse (the analog of the
    reference's cached twiddles, `ntt-cuda/ntt_parameters/ntt_twiddles.cu`).
    """

    _cache: dict = {}

    def __new__(cls, spec: FieldSpec, log_n: int):
        key = (spec.name, log_n)
        if key in cls._cache:
            return cls._cache[key]
        # Guard: constructing (and caching) twiddles inside a jit trace would
        # cache tracers; construct domains eagerly at the host level.
        probe = jnp.zeros((), jnp.uint32) + 0
        assert not isinstance(probe, jax.core.Tracer), (
            "Domain must be constructed outside jit (twiddle cache would "
            "capture tracers)")
        self = super().__new__(cls)
        self.spec = spec
        self.log_n = log_n
        self.n = 1 << log_n
        self.w = primitive_root(spec, log_n)
        self.w_inv = pow(self.w, spec.p - 2, spec.p)
        self.n_inv = pow(self.n, spec.p - 2, spec.p)
        # forward/inverse twiddles: powers up to n/2
        half = max(1, self.n // 2)
        self.pows = _power_table(spec, half, self.w)
        self.pows_inv = _power_table(spec, half, self.w_inv)
        self.bitrev = jnp.asarray(_bitrev_perm(log_n))
        cls._cache[key] = self
        # Pre-build the four-step split resources for BIG transforms on the
        # kernel backend: `radix2.ntt` routes log_n > fr_kernel.MAX_LOG
        # through two kernel-sized sub-transforms + a step-twiddle pass, and
        # those sub-domains/twiddle matrices must exist EAGERLY (ntt() is
        # jitted; Domain construction inside a trace would cache tracers —
        # the guard above).  Domains are always constructed eagerly, so
        # hooking here guarantees the split resources exist before any
        # traced use.
        from . import fr_kernel
        split = fr_kernel.big_split(spec, log_n)
        if split is not None:
            from . import fourstep
            l1, l2 = split
            Domain(spec, l1)
            Domain(spec, l2)
            fourstep.twiddle_matrix(spec, l1, l2, False)
            fourstep.twiddle_matrix(spec, l1, l2, True)
        return self


def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    out = np.zeros_like(idx)
    for b in range(log_n):
        out |= ((idx >> b) & 1) << (log_n - 1 - b)
    return out.astype(np.int32)
