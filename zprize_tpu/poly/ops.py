"""Polynomial operations over a prime field (coefficient planes (n, L)).

The TPU-native replacement for the reference's polynomial op set
(`snarkvm-cuda/cuda/snarkvm.cu:1126-1338`: ntt_batch / polymul / poly_t /
evaluations, and jf-plonk's `plonk/src/proof_system/prover.rs` helpers):
everything is either an NTT, a wide elementwise op, or a log-depth scan —
no sequential Horner/synthetic-division loops anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp
from ..field.spec import FieldSpec
from ..ntt.domain import Domain
from ..ntt.radix2 import intt, ntt


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def pad_to(spec: FieldSpec, a: jax.Array, n: int) -> jax.Array:
    pad = [(0, 0)] * (a.ndim - 2) + [(0, n - a.shape[-2]), (0, 0)]
    return jnp.pad(a, pad)


def add(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    n = max(a.shape[-2], b.shape[-2])
    return fp.add(spec, pad_to(spec, a, n), pad_to(spec, b, n))


def sub(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    n = max(a.shape[-2], b.shape[-2])
    return fp.sub(spec, pad_to(spec, a, n), pad_to(spec, b, n))


def scale(spec: FieldSpec, a: jax.Array, k: jax.Array) -> jax.Array:
    """Multiply every coefficient by scalar plane k (L,)."""
    return fp.mul(spec, a, k)


@functools.lru_cache(maxsize=None)
def gpow_np(spec: FieldSpec, g: int, count: int, inverse: bool = False):
    """numpy limb plane of [g^0 .. g^(count-1)] (or inverse powers) —
    lru-cached per (field, generator, length): coset scalings recompute
    these constants on every call otherwise (a 4n host modpow loop per
    coset NTT dominated the PLONK prover's host time).  Cached as numpy
    (house rule: no jnp arrays in caches a trace could populate); callers
    `jnp.asarray` the result."""
    p = spec.p
    gg = pow(g, p - 2, p) if inverse else g
    vals, cur = [], 1
    for _ in range(count):
        vals.append(cur)
        cur = cur * gg % p
    return np.asarray(jax.device_get(fp.from_ints(spec, vals)))


def _powers_ladder(spec: FieldSpec, z: jax.Array, count: int) -> jax.Array:
    """Small log-doubling ladder (concat chain).  Kept SMALL on purpose:
    the same pattern at 2^17 entries miscompiled on XLA:TPU (the r5
    twiddle-table find — the final multiply-by-broadcast step of the
    fused concat graph produced wrong limbs; exact on CPU and exact as a
    standalone mul).  Large tables go through `powers`' outer-product
    form instead."""
    pows = fp.ones(spec, (1,))
    zk = z[None]  # z^(2^j) ladder
    k = 1
    while k < count:
        take = min(k, count - k)
        nxt = fp.mul(spec, pows[:take], zk)
        pows = jnp.concatenate([pows, nxt], axis=0)
        zk = fp.sqr(spec, zk)
        k *= 2
    return pows[:count]


# ladders above this size use the outer-product decomposition (see
# `_powers_ladder`: the long concat chain is the r5 XLA:TPU miscompile
# pattern; 2^9 is two orders of magnitude below the observed onset)
_LADDER_MAX = 1 << 9


def powers(spec: FieldSpec, z: jax.Array, count: int) -> jax.Array:
    """[1, z, ..., z^(count-1)] for a traced scalar plane z.

    Large counts decompose as z^i = (z^L)^(i//L) * z^(i mod L): two
    SMALL ladders (<= ~sqrt(count)) plus ONE full-size elementwise
    multiply — the big-mul shape that is differentially verified exact
    on TPU, avoiding the deep concat-growing graph entirely."""
    if count <= _LADDER_MAX:
        return _powers_ladder(spec, z, count)
    lo_n = _LADDER_MAX
    hi_n = -(-count // lo_n)
    lo = _powers_ladder(spec, z, lo_n)            # (lo_n, L)
    z_l = z
    for _ in range(lo_n.bit_length() - 1):        # z^(lo_n) by squaring
        z_l = fp.sqr(spec, z_l)
    hi = _powers_ladder(spec, z_l, hi_n)          # (hi_n, L)
    full = fp.mul(spec, hi[:, None, :], lo[None, :, :])
    return full.reshape(hi_n * lo_n, -1)[:count]


@functools.partial(jax.jit, static_argnums=0)
def evaluate(spec: FieldSpec, a: jax.Array, z: jax.Array) -> jax.Array:
    """p(z) via the power ladder + log-depth sum (replaces Horner)."""
    n = a.shape[-2]
    pw = powers(spec, z, n)
    terms = fp.mul(spec, a, pw)
    # tree-sum along the coefficient axis
    m = n
    while m > 1:
        half = m // 2
        lo, hi = terms[..., :half, :], terms[..., half:2 * half, :]
        merged = fp.add(spec, lo, hi)
        if m % 2:
            merged = jnp.concatenate([merged, terms[..., m - 1:m, :]], axis=-2)
        terms, m = merged, half + (m % 2)
    return terms[..., 0, :]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _mul_core(spec: FieldSpec, dom: Domain, a, b):
    na, nb = a.shape[-2], b.shape[-2]
    fa = ntt(dom, pad_to(spec, a, dom.n))
    fb = ntt(dom, pad_to(spec, b, dom.n))
    prod = intt(dom, fp.mul(spec, fa, fb))
    return prod[..., :na + nb - 1, :]


def mul(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Polynomial product via NTT (out length = len(a)+len(b)-1).

    Note: construct outside jit (the Domain twiddle cache must hold concrete
    arrays)."""
    n = _next_pow2(a.shape[-2] + b.shape[-2] - 1)
    return _mul_core(spec, Domain(spec, n.bit_length() - 1), a, b)


@functools.partial(jax.jit, static_argnums=0)
def divide_linear(spec: FieldSpec, a: jax.Array, z: jax.Array):
    """(quotient, remainder) of a(X) / (X - z).

    The synthetic-division recurrence w_{i} = a_{i+1} + z*w_{i+1} is a linear
    recurrence; we run it as a log-depth `associative_scan` over affine maps
    (a, b) ~ x -> a*x + b — the TPU-native form of the reference's sequential
    KZG witness-polynomial loop (`snarkVM polycommit/kzg10/mod.rs:402`)."""
    n = a.shape[-2]
    assert n >= 1
    if n == 1:
        return fp.zeros(spec, a.shape[:-2] + (1,)), a[..., 0, :]
    # maps e_k for k=1..n-1 correspond to coefficients j = n-1 .. 1
    coeffs = a[..., 1:, :][..., ::-1, :]            # a_{n-1}, ..., a_1
    mult = jnp.broadcast_to(z, coeffs.shape[:-2] + z.shape[-1:])
    mults = jnp.broadcast_to(mult[..., None, :], coeffs.shape)

    def combine(l, r):
        (a1, b1), (a2, b2) = l, r
        return (fp.mul(spec, a2, a1),
                fp.add(spec, fp.mul(spec, a2, b1), b2))

    pa, pb = jax.lax.associative_scan(combine, (mults, coeffs), axis=-2)
    # prefix_k applied to 0 gives w_{n-1-k}; pb holds those values
    quotient = pb[..., ::-1, :]                      # w_0 ... w_{n-1}? see below
    # pb[k-1] = w_{n-1-k}, k=1..n-1  -> reversed gives w_0..w_{n-2}
    remainder = fp.add(spec, fp.mul(spec, z, quotient[..., 0, :]),
                       a[..., 0, :])
    return quotient, remainder


def coeffs_from_ints(spec: FieldSpec, values) -> jax.Array:
    return fp.from_ints(spec, values)
