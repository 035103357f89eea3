"""Pallas NTT for large-prime fields (BLS12-377/381 Fr, 253-bit limbs).

The prover's NTTs (PLONK rounds, Marlin AHP, poly mul — the role of
`snarkvm-cuda/ntt-cuda/ntt_kernels/256_bit_fields/ct_ntt.cu`) ran the
generic XLA engine through round 2: every butterfly stage round-trips the
(n, 26) limb planes through HBM (~2 log n passes).  This kernel fuses ALL
stages in VMEM — positions on lanes, limbs on sublanes — one invocation
per batch column; per stage: two lane rolls + one kernel multiply
(`fp_kernel`, same engine as the MSM kernels) + masked add/sub.

Sizes 2^7..2^12 run in one kernel; larger transforms compose via the
four-step decomposition (`fourstep.py`), whose column/row passes land
back here (batch = the other axis).  `radix2.ntt`/`intt` dispatch
transparently on TPU backends; the XLA form remains the CPU/test
reference and the two are bit-exact (same operations, same normal form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import fp
from ..field import fp_kernel as fk
from ..field.spec import BASE_BITS, FieldSpec, limbs_from_int
from .domain import Domain

MIN_LOG = 7     # lanes must be a 128-multiple
MAX_LOG = 12    # (26, 4096) state + (log, 26, 4096) twiddles fit VMEM


def _limbs_np(spec: FieldSpec, v: int) -> np.ndarray:
    return np.asarray(limbs_from_int(v % spec.p, spec.n_limbs), np.uint32)


@functools.lru_cache(maxsize=None)
def _twiddle_tables_np(spec: FieldSpec, log_n: int, inverse: bool
                       ) -> np.ndarray:
    """(log_n, L, n) per-stage position-expanded twiddles (numpy — cached
    arrays must never be jnp, see CLAUDE.md tracer-leak gotcha)."""
    from .domain import primitive_root
    n = 1 << log_n
    l = spec.n_limbs
    w = primitive_root(spec, log_n)
    if inverse:
        w = pow(w, spec.p - 2, spec.p)
    pows = [1] * (n // 2)
    for k in range(1, n // 2):
        pows[k] = pows[k - 1] * w % spec.p
    out = np.zeros((log_n, l, n), np.uint32)
    for s in range(1, log_n + 1):
        m = 1 << s
        for i in range(n):
            j = (i % (m // 2)) * (n // m)
            out[s - 1, :, i] = _limbs_np(spec, pows[j])
    return out


@functools.lru_cache(maxsize=None)
def _make_ntt_fn(spec: FieldSpec, log_n: int, n_batch: int, inverse: bool,
                 interpret: bool):
    """fn(x (B, L, n), tw, sc) -> (B, L, n); grid over the batch."""
    n = 1 << log_n
    l = spec.n_limbs

    def kernel(ft_ref, neg2_ref, tw_ref, sc_ref, x_ref, o_ref):
        ft, neg2 = ft_ref[...], neg2_ref[...]
        x = x_ref[0]
        for s in range(1, log_n + 1):
            h = 1 << (s - 1)
            down = pltpu.roll(x, n - h, 1)
            up = pltpu.roll(x, h, 1)
            pos = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)
            is_lo = (pos & h) == 0
            hi = jnp.where(is_lo, down, x)
            lo = jnp.where(is_lo, x, up)
            t = fk.kmul(spec, hi, tw_ref[s - 1], ft)
            x = jnp.where(is_lo, fk.kadd(spec, lo, t, ft),
                          fk.ksub(spec, lo, t, ft, neg2))
        if inverse:
            x = fk.kmul(spec, x, jnp.broadcast_to(sc_ref[...], (l, n)), ft)
        o_ref[0] = x

    vfix = lambda shape: pl.BlockSpec(shape, lambda b: tuple([0] * len(shape)),
                                      memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_batch,),
        in_specs=[vfix((l, l + 2)), vfix((l, 1)), vfix((log_n, l, n)),
                  vfix((l, 1)),
                  pl.BlockSpec((1, l, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, l, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_batch, l, n), jnp.uint32),
        interpret=interpret,
    )
    return call


def supported(spec: FieldSpec, log_n: int) -> bool:
    return (spec.n_limbs > 2 and MIN_LOG <= log_n <= MAX_LOG)


# Largest log_n the four-step big-split routes onto the kernel.  Bounded
# by the domain sizes the provers actually construct (PLONK quotient
# domains at 2^16 gates reach 2^19; Marlin/PoSW stay below): the Domain
# constructor prebuilds BOTH four-step twiddle matrices eagerly —
# ~(2^l1 · 2^l2 · L) u32 each — so an open-ended cap materializes
# gigabytes for domains nobody ever transforms (ADVICE r4).
BIG_MAX_LOG = 20


def big_split(spec: FieldSpec, log_n: int):
    """Four-step split (l1, l2) for kernel-backed transforms above the
    VMEM cap, or None when the size doesn't route onto the kernel.
    SINGLE source of truth for the routing predicate — used by both the
    Domain-construction prebuild hook (domain.py) and the traced router
    (radix2._big_split); a drifted copy would silently send big
    transforms to the XLA stage loop."""
    l1 = log_n // 2
    if not (enabled() and spec.n_limbs > 2 and log_n > MAX_LOG
            and l1 >= MIN_LOG and log_n <= BIG_MAX_LOG):
        return None
    return l1, log_n - l1


def enabled() -> bool:
    import os
    if os.environ.get("ZPRIZE_NO_PALLAS"):
        return False
    if os.environ.get("ZPRIZE_FR_NTT", "1") == "0":
        return False
    return jax.default_backend() not in ("cpu",)


def ntt_core_pallas(dom: Domain, a: jax.Array, inverse: bool,
                    interpret: bool = False) -> jax.Array:
    """Natural-order transform along axis -2 of (..., n, L); drop-in for
    `radix2._ntt_core` + the inverse scale.  Bitrev rides an XLA take;
    the butterfly stages run fused in VMEM."""
    spec, n, log_n = dom.spec, dom.n, dom.log_n
    l = spec.n_limbs
    a = jnp.take(a, dom.bitrev, axis=-2)
    lead = a.shape[:-2]
    flat = a.reshape(-1, n, l).transpose(0, 2, 1)          # (B, L, n)
    b = flat.shape[0]
    call = _make_ntt_fn(spec, log_n, b, inverse, interpret)
    tw = jnp.asarray(_twiddle_tables_np(spec, log_n, inverse))
    sc = jnp.asarray(_limbs_np(spec, dom.n_inv)[:, None])
    ft = jnp.asarray(fk.fold_table_t(spec))
    neg2 = jnp.asarray(fk.neg2_col(spec))
    out = call(ft, neg2, tw, sc, flat)
    return out.transpose(0, 2, 1).reshape(*lead, n, l)
