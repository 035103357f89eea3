"""Fused-VMEM Fr NTT kernel (`ntt/fr_kernel.py`) vs the XLA radix-2
reference engine: bit-exact forward/inverse/batched, the differential
gate for the prover's NTT fast path (cf. the reference's 256-bit CT/GS
kernels, `snarkvm-cuda/ntt-cuda/ntt_kernels/256_bit_fields/ct_ntt.cu`)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR as FR
from zprize_tpu.ntt import fr_kernel, radix2
from zprize_tpu.ntt.domain import Domain


def _canon(x):
    return np.asarray(jax.device_get(fp.to_canonical(FR, x)))


@pytest.mark.parametrize("log_n", [7, 8])
def test_fr_kernel_matches_radix2(log_n):
    rng = random.Random(3)
    dom = Domain(FR, log_n)
    a = fp.from_ints(FR, [rng.randrange(FR.p) for _ in range(dom.n)])
    assert np.array_equal(
        _canon(radix2.ntt(dom, a)),
        _canon(fr_kernel.ntt_core_pallas(dom, a, inverse=False,
                                         interpret=True)))
    assert np.array_equal(
        _canon(radix2.intt(dom, a)),
        _canon(fr_kernel.ntt_core_pallas(dom, a, inverse=True,
                                         interpret=True)))


def test_fr_kernel_batched_axis():
    rng = random.Random(5)
    dom = Domain(FR, 7)
    a = fp.from_ints(FR, [rng.randrange(FR.p) for _ in range(dom.n)])
    b = jnp.stack([a, fp.ones(FR, (dom.n,)), a])
    out = fr_kernel.ntt_core_pallas(dom, b, inverse=False, interpret=True)
    assert np.array_equal(_canon(out[0]), _canon(radix2.ntt(dom, a)))
    assert np.array_equal(_canon(out[2]), _canon(out[0]))
