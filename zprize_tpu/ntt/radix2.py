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


@functools.partial(jax.jit, static_argnums=(0, 2))
def ntt(dom: Domain, a: jax.Array, axis: int = -2) -> jax.Array:
    """Forward NTT along `axis` (which indexes the n coefficients); the last
    axis is always the limb plane.  On TPU backends, supported sizes run
    the fused-VMEM Pallas kernel (`fr_kernel.py`, bit-exact)."""
    from . import fr_kernel
    if fr_kernel.enabled() and fr_kernel.supported(dom.spec, dom.log_n):
        out = fr_kernel.ntt_core_pallas(dom, jnp.moveaxis(a, axis, -2),
                                        inverse=False)
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
    out = _ntt_core(dom, jnp.moveaxis(a, axis, -2), dom.pows_inv)
    out = fp.mul(dom.spec, out, fp.constant(dom.spec, dom.n_inv))
    return jnp.moveaxis(out, -2, axis)
