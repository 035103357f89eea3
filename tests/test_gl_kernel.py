"""Packed-Goldilocks ops and Pallas NTT kernel tests (interpret mode on
CPU; the same code compiles for TPU — validated by the bench's full-size
comparison against the generic engine)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zprize_tpu.field import fp
from zprize_tpu.field.spec import GOLDILOCKS
from zprize_tpu.ntt import gl_kernel as GK
from zprize_tpu.ntt import gl_ops as G
from zprize_tpu.ntt.domain import Domain
from zprize_tpu.ntt.radix2 import ntt

Q = G.Q


def _pack(vals):
    lo = jnp.asarray(np.array([v & 0xFFFFFFFF for v in vals], np.uint32))
    hi = jnp.asarray(np.array([v >> 32 for v in vals], np.uint32))
    return lo, hi


def _unpack(lo, hi):
    lo = np.asarray(lo, np.uint64)
    hi = np.asarray(hi, np.uint64)
    return [int(l) | (int(h) << 32) for l, h in zip(lo.ravel(), hi.ravel())]


def test_gl_ops_differential():
    rng = random.Random(0)
    vals = [0, 1, Q - 1, Q - 2, (1 << 64) - 1, 1 << 32, (1 << 32) - 1, Q,
            Q + 5] + [rng.randrange(1 << 64) for _ in range(100)]
    a, b = vals, list(reversed(vals))
    alo, ahi = _pack(a)
    blo, bhi = _pack(b)
    for name, fn, ref in (("add", G.gl_add, lambda x, y: (x + y) % Q),
                          ("sub", G.gl_sub, lambda x, y: (x - y) % Q),
                          ("mul", G.gl_mul, lambda x, y: (x * y) % Q)):
        lo, hi = G.gl_canon(*fn(alo, ahi, blo, bhi))
        got = _unpack(lo, hi)
        for i, (x, y) in enumerate(zip(a, b)):
            assert got[i] == ref(x, y), (name, i)


def test_gl_conversions():
    rng = random.Random(1)
    xs = [rng.randrange(Q) for _ in range(40)] + [0, 1, Q - 1]
    planes = fp.from_ints(GOLDILOCKS, xs)
    lo, hi = G.from_limbs(GOLDILOCKS, planes)
    assert _unpack(lo, hi) == xs
    back = G.to_limbs(GOLDILOCKS, lo, hi)
    assert [int(v) for v in fp.to_ints(GOLDILOCKS, back)] == xs


@pytest.mark.parametrize("log_n", [8, 10], ids=["kernel", "recursive"])
def test_gl_ntt_matches_generic(log_n):
    rng = random.Random(2)
    B = 2
    xs = [[rng.randrange(Q) for _ in range(1 << log_n)] for _ in range(B)]
    lo = jnp.asarray(np.array([[x & 0xFFFFFFFF for x in c] for c in xs],
                              np.uint32).T)
    hi = jnp.asarray(np.array([[x >> 32 for x in c] for c in xs],
                              np.uint32).T)
    olo, ohi = GK.ntt_packed(log_n, lo, hi, interpret=True, tile=2)
    olo, ohi = G.gl_canon(olo, ohi)
    ref = fp.to_ints(GOLDILOCKS, ntt(Domain(GOLDILOCKS, log_n),
                                     fp.from_ints(GOLDILOCKS, xs)))
    got = np.asarray(olo, np.uint64) | (np.asarray(ohi, np.uint64) << 32)
    for b in range(B):
        assert [int(got[i, b]) for i in range(1 << log_n)] == \
            [int(v) for v in ref[b]]
    # inverse roundtrip
    blo, bhi = GK.ntt_packed(log_n, olo, ohi, inverse=True, interpret=True,
                             tile=2)
    blo, bhi = G.gl_canon(blo, bhi)
    back = np.asarray(blo, np.uint64) | (np.asarray(bhi, np.uint64) << 32)
    for b in range(B):
        assert [int(back[i, b]) for i in range(1 << log_n)] == xs[b]


def test_gl_fourstep_packed():
    rng = random.Random(3)
    n = 1 << 10
    xs = [rng.randrange(Q) for _ in range(n)]
    lo, hi = _pack(xs)
    qlo, qhi = GK.ntt_fourstep_packed(5, 5, lo, hi, interpret=True)
    qlo, qhi = G.gl_canon(qlo, qhi)
    from zprize_tpu.ntt.fourstep import ntt_fourstep
    ref = fp.to_ints(GOLDILOCKS, ntt_fourstep(
        GOLDILOCKS, fp.from_ints(GOLDILOCKS, xs), 5, 5))
    assert _unpack(qlo, qhi) == [int(v) for v in ref]


def test_gl_grid_kernel_matches_generic():
    """Stage-grid kernel (one butterfly stage per grid step, VMEM-resident
    block) vs the generic engine, at sizes ABOVE the fully-unrolled cap
    (2^10..2^12 — the production 2^24 four-step runs two 2^12 grid
    passes)."""
    from zprize_tpu.ntt.domain import Domain
    from zprize_tpu.ntt.radix2 import ntt as ntt_generic
    import jax
    import jax.numpy as jnp

    rng = random.Random(3)
    for log_n in (10, 12):
        n, nb = 1 << log_n, 128
        vals = [rng.randrange(Q) for _ in range(n * nb)]
        a = fp.from_ints(GOLDILOCKS, vals).reshape(n, nb, -1)
        alo, ahi = G.from_limbs(GOLDILOCKS, a)
        twlo, twhi, mask, _sh = GK._stage_tables(log_n, False)
        call = GK._make_ntt_grid_call(log_n, nb, 128, True)
        br = jnp.asarray(GK._bitrev_perm(log_n).astype(np.int32))
        glo, ghi = call(jnp.asarray(twlo), jnp.asarray(twhi),
                        jnp.asarray(mask),
                        jnp.take(alo, br, 0), jnp.take(ahi, br, 0))
        ref = ntt_generic(Domain(GOLDILOCKS, log_n), a, axis=0)
        flo, fhi = G.from_limbs(GOLDILOCKS, ref)
        clo, chi = G.gl_canon(glo, ghi)
        assert bool(jnp.all((clo == flo) & (chi == fhi))), log_n
