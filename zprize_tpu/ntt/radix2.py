"""Radix-2 NTT as reshape-structured vector butterflies.

The reference implements butterflies as CUDA kernels / RTL pipelines
(`ntt-cuda/ntt_kernels/256_bit_fields/ct_ntt.cu`, supranational's
`rtl/ntt/ntt_butterfly.sv`, hardcaml `single_core.ml`).  On TPU a radix-2
stage is simply a reshape + wide vector mul/add/sub: strides are powers of
two, so every "gather" is a static reshape/slice — no scatter, no indexing.
Computes A[k] = sum_j a_j w^(jk) (the textbook convention of the prize2
reference model, `cosic/testvectors/testvectors.py:28-44` and hardcaml's
`reference_model.ml`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field import fp
from .domain import Domain


def _ntt_core(dom: Domain, a: jax.Array, pows: jax.Array) -> jax.Array:
    """In natural order along axis -2; `pows` selects forward/inverse."""
    n, log_n = dom.n, dom.log_n
    if n == 1:
        return a
    a = jnp.take(a, dom.bitrev, axis=-2)
    lead = a.shape[:-2]
    L = a.shape[-1]
    for s in range(1, log_n + 1):
        m = 1 << s
        tw = pows[::n // m][:m // 2]                      # (m/2, L)
        v = a.reshape(*lead, n // m, m, L)
        lo = v[..., : m // 2, :]
        hi = v[..., m // 2:, :]
        t = fp.mul(dom.spec, hi, tw)
        a = jnp.concatenate(
            [fp.add(dom.spec, lo, t), fp.sub(dom.spec, lo, t)], axis=-2
        ).reshape(*lead, n, L)
    return a


def _big_split(dom: Domain):
    """Four-step split for kernel-backed BIG transforms, or None.  Sizes
    above the fused kernel's VMEM cap (fr_kernel.MAX_LOG = 2^12) decompose
    into two kernel-sized passes + one step-twiddle pass — without this the
    prover's 2^16..2^18 domains silently fall back to the XLA stage loop.

    The split's sub-domains/twiddle matrices must be CONCRETE before the
    jitted entry points trace (`Domain` guard): normally the Domain
    constructor pre-creates them, but a domain cached before the kernel
    backend was active misses the hook — so this creates them eagerly when
    called outside a trace, and declines the route (stage-loop fallback,
    correct but slower) when mid-trace with resources missing."""
    from . import fourstep, fr_kernel
    split = fr_kernel.big_split(dom.spec, dom.log_n)
    if split is None:
        return None
    l1, l2 = split
    name = dom.spec.name
    have = ((name, l1) in Domain._cache and (name, l2) in Domain._cache
            and (name, l1, l2, False) in fourstep._tw_cache
            and (name, l1, l2, True) in fourstep._tw_cache)
    if have:
        return l1, l2
    probe = jnp.zeros((), jnp.uint32) + 0
    if isinstance(probe, jax.core.Tracer):
        import sys
        print(f"zprize_tpu.ntt: 2^{dom.log_n} {name} transform traced "
              "before its four-step split resources existed — falling "
              "back to the XLA stage loop (correct but slower); "
              "construct Domain eagerly first", file=sys.stderr)
        return None
    Domain(dom.spec, l1), Domain(dom.spec, l2)
    fourstep.twiddle_matrix(dom.spec, l1, l2, False)
    fourstep.twiddle_matrix(dom.spec, l1, l2, True)
    return l1, l2


def _ntt_big(dom: Domain, x: jax.Array, inverse: bool) -> jax.Array:
    """Four-step transform along axis -2 (batched form of
    `fourstep._ntt_fourstep_core` / `_intt_fourstep_core`, bit-compatible
    output order); sub-transforms recurse into `ntt`/`intt` and hit the
    Pallas kernel.  Split resources exist eagerly (Domain pre-creates
    them), so this traces safely inside the jitted entry points."""
    from .fourstep import twiddle_matrix
    spec = dom.spec
    l1, l2 = _big_split(dom)
    d1, d2 = Domain(spec, l1), Domain(spec, l2)
    n1, n2 = 1 << l1, 1 << l2
    lead = x.shape[:-2]
    L = x.shape[-1]
    tw = twiddle_matrix(spec, l1, l2, inverse)
    if not inverse:
        m = x.reshape(*lead, n1, n2, L)
        m = ntt(d1, m, axis=-3)                       # column NTTs
        m = fp.mul(spec, m, tw)
        m = ntt(d2, m, axis=-2)                       # row NTTs
        return jnp.swapaxes(m, -3, -2).reshape(*lead, n1 * n2, L)
    # inverse: undo the output permutation, then run the passes backwards
    # (the two sub-iNTTs carry 1/n1 * 1/n2 = 1/n)
    m = x.reshape(*lead, n2, n1, L)
    m = jnp.swapaxes(m, -3, -2)                       # (..., n1, n2, L)
    m = intt(d2, m, axis=-2)
    m = fp.mul(spec, m, tw)
    m = intt(d1, m, axis=-3)
    return m.reshape(*lead, n1 * n2, L)


@functools.partial(jax.jit, static_argnums=(0, 2))
def ntt(dom: Domain, a: jax.Array, axis: int = -2) -> jax.Array:
    """Forward NTT along `axis` (which indexes the n coefficients); the last
    axis is always the limb plane.  On TPU backends, supported sizes run
    the fused-VMEM Pallas kernel (`fr_kernel.py`, bit-exact); larger sizes
    decompose four-step onto it (`_ntt_big`)."""
    from . import fr_kernel
    if fr_kernel.enabled() and fr_kernel.supported(dom.spec, dom.log_n):
        out = fr_kernel.ntt_core_pallas(dom, jnp.moveaxis(a, axis, -2),
                                        inverse=False)
        return jnp.moveaxis(out, -2, axis)
    if _big_split(dom) is not None:
        out = _ntt_big(dom, jnp.moveaxis(a, axis, -2), inverse=False)
        return jnp.moveaxis(out, -2, axis)
    out = _ntt_core(dom, jnp.moveaxis(a, axis, -2), dom.pows)
    return jnp.moveaxis(out, -2, axis)


@functools.partial(jax.jit, static_argnums=(0, 2))
def intt(dom: Domain, a: jax.Array, axis: int = -2) -> jax.Array:
    """Inverse NTT along `axis` (includes the 1/n scale)."""
    from . import fr_kernel
    if fr_kernel.enabled() and fr_kernel.supported(dom.spec, dom.log_n):
        out = fr_kernel.ntt_core_pallas(dom, jnp.moveaxis(a, axis, -2),
                                        inverse=True)
        return jnp.moveaxis(out, -2, axis)
    if _big_split(dom) is not None:
        out = _ntt_big(dom, jnp.moveaxis(a, axis, -2), inverse=True)
        return jnp.moveaxis(out, -2, axis)
    out = _ntt_core(dom, jnp.moveaxis(a, axis, -2), dom.pows_inv)
    out = fp.mul(dom.spec, out, fp.constant(dom.spec, dom.n_inv))
    return jnp.moveaxis(out, -2, axis)
