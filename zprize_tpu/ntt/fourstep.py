"""Four-step NTT decomposition: 2^(l1+l2) = 2^l1 x 2^l2.

The decomposition every prize2-ntt entry uses for 2^24 (columns -> twiddle
correction -> rows -> transpose; cf.
`prize2-ntt/hardcaml/zprize/ntt/docs/zprize_ntt_top.mld:53-75` and cosic's
recursive variant).  On a single chip the "transpose" is a free relayout;
across a mesh it becomes the ICI all_to_all (see `parallel/ntt_sharded.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp
from ..field.spec import FieldSpec
from .domain import Domain
from .radix2 import intt, ntt

_tw_cache: dict = {}


def twiddle_matrix(spec: FieldSpec, log_n1: int, log_n2: int,
                   inverse: bool = False) -> jax.Array:
    """W[k1, j2] = w_n^(±k1*j2), n = 2^(l1+l2); cached per domain."""
    key = (spec.name, log_n1, log_n2, inverse)
    if key in _tw_cache:
        return _tw_cache[key]
    dom = Domain(spec, log_n1 + log_n2)
    n = dom.n
    half = dom.pows_inv if inverse else dom.pows          # (n/2, L)
    # Full power table: w^(n/2) = -1, so the top half is the negation.
    full = jnp.concatenate([half, fp.neg(spec, half)], axis=0)
    k1 = np.arange(1 << log_n1, dtype=np.int64)[:, None]
    j2 = np.arange(1 << log_n2, dtype=np.int64)[None, :]
    idx = jnp.asarray(((k1 * j2) % n).astype(np.int32))
    out = jnp.take(full, idx, axis=0)                      # (n1, n2, L)
    _tw_cache[key] = out
    return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _ntt_fourstep_core(spec, d1: Domain, d2: Domain, a, tw):
    n1, n2 = d1.n, d2.n
    L = a.shape[-1]
    m = a.reshape(n1, n2, L)
    m = ntt(d1, m, axis=0)                                 # column NTTs
    m = fp.mul(spec, m, tw)
    m = ntt(d2, m, axis=1)                                 # row NTTs
    # A[k1 + n1*k2] = M[k1, k2]
    return m.transpose(1, 0, 2).reshape(n1 * n2, L)


def ntt_fourstep(spec: FieldSpec, a: jax.Array, log_n1: int, log_n2: int
                 ) -> jax.Array:
    """Forward NTT of a natural-order (n, L) array via the four-step
    decomposition; bit-exact with the direct radix-2 transform."""
    tw = twiddle_matrix(spec, log_n1, log_n2)
    return _ntt_fourstep_core(spec, Domain(spec, log_n1),
                              Domain(spec, log_n2), a, tw)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _intt_fourstep_core(spec, d1: Domain, d2: Domain, a, tw_inv):
    n1, n2 = d1.n, d2.n
    L = a.shape[-1]
    # Invert the output permutation: M[k1, k2] = A[k1 + n1*k2].
    m = a.reshape(n2, n1, L).transpose(1, 0, 2)
    m = intt(d2, m, axis=1)
    m = fp.mul(spec, m, tw_inv)
    m = intt(d1, m, axis=0)
    return m.reshape(n1 * n2, L)


def intt_fourstep(spec: FieldSpec, a: jax.Array, log_n1: int, log_n2: int
                  ) -> jax.Array:
    """Inverse of `ntt_fourstep` (includes the 1/n scale)."""
    tw_inv = twiddle_matrix(spec, log_n1, log_n2, inverse=True)
    return _intt_fourstep_core(spec, Domain(spec, log_n1),
                               Domain(spec, log_n2), a, tw_inv)
