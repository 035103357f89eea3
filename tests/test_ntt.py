"""NTT tests: naive-DFT oracle, golden vectors in the prize2 reference
convention (cosic omega table), roundtrip, four-step equivalence, and the
convolution theorem."""

import random

import numpy as np
import pytest

from zprize_tpu.field import fp
from zprize_tpu.field.spec import BLS12_377_FR, GOLDILOCKS
from zprize_tpu.ntt import domain as ntt_domain
from zprize_tpu.ntt.domain import Domain, primitive_root
from zprize_tpu.ntt.fourstep import intt_fourstep, ntt_fourstep
from zprize_tpu.ntt.radix2 import intt, ntt

# The prize2 reference's omega table entries we rely on
# (cosic/testvectors/testvectors.py): N=2 and N=2**32.
COSIC_W2 = 18446744069414584320
COSIC_W32 = 11724716146725638212


def naive_ntt(x, w, q):
    n = len(x)
    return [sum(x[j] * pow(w, j * k, q) for j in range(n)) % q for k in range(n)]


def test_goldilocks_root_matches_reference_table():
    """Squaring the pinned 2^32 root down reproduces the cosic table's small
    roots, so our transforms match their golden vectors bit-exactly."""
    q = GOLDILOCKS.p
    w = COSIC_W32
    for _ in range(31):
        w = w * w % q
    assert w == COSIC_W2
    assert primitive_root(GOLDILOCKS, 1) == COSIC_W2
    assert pow(primitive_root(GOLDILOCKS, 24), 1 << 23, q) == q - 1


@pytest.mark.parametrize("spec", [GOLDILOCKS, BLS12_377_FR],
                         ids=["gl", "fr377"])
def test_ntt_matches_naive(spec):
    rng = random.Random(0)
    log_n = 4
    n = 1 << log_n
    x = [rng.randrange(spec.p) for _ in range(n)]
    dom = Domain(spec, log_n)
    got = fp.to_ints(spec, ntt(dom, fp.from_ints(spec, x)))
    expect = naive_ntt(x, dom.w, spec.p)
    assert [int(v) for v in got] == expect


@pytest.mark.parametrize("spec", [GOLDILOCKS, BLS12_377_FR],
                         ids=["gl", "fr377"])
def test_ntt_roundtrip_and_batch(spec):
    rng = random.Random(3)
    log_n = 8
    n = 1 << log_n
    x = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(3)]
    a = fp.from_ints(spec, x)               # (3, n, L)
    dom = Domain(spec, log_n)
    back = fp.to_ints(spec, intt(dom, ntt(dom, a)))
    for b in range(3):
        assert [int(v) for v in back[b]] == x[b]


def test_goldilocks_golden_2_10():
    """Recursive reference NTT (the cosic algorithm) on seeded input, exact
    match at 2^10."""
    q = GOLDILOCKS.p
    rng = random.Random(0)
    n = 1 << 10
    x = [rng.randint(0, q) % q for _ in range(n)]

    def ref_ntt(v):
        m = len(v)
        if m <= 1:
            return v
        w = primitive_root(GOLDILOCKS, m.bit_length() - 1)
        even, odd = ref_ntt(v[0::2]), ref_ntt(v[1::2])
        twid = [pow(w, k, q) * odd[k] % q for k in range(m // 2)]
        return ([(even[k] + twid[k]) % q for k in range(m // 2)]
                + [(even[k] - twid[k]) % q for k in range(m // 2)])

    expect = ref_ntt(x)
    dom = Domain(GOLDILOCKS, 10)
    got = fp.to_ints(GOLDILOCKS, ntt(dom, fp.from_ints(GOLDILOCKS, x)))
    assert [int(v) for v in got] == expect


@pytest.mark.parametrize("spec", [GOLDILOCKS], ids=["gl"])
def test_fourstep_matches_radix2(spec):
    rng = random.Random(5)
    log_n = 10
    n = 1 << log_n
    x = [rng.randrange(spec.p) for _ in range(n)]
    a = fp.from_ints(spec, x)
    direct = fp.to_ints(spec, ntt(Domain(spec, log_n), a))
    four = fp.to_ints(spec, ntt_fourstep(spec, a, 6, 4))
    assert [int(v) for v in four] == [int(v) for v in direct]
    back = fp.to_ints(spec, intt_fourstep(
        spec, ntt_fourstep(spec, a, 5, 5), 5, 5))
    assert [int(v) for v in back] == x


def test_convolution_theorem_fr():
    """intt(ntt(a) * ntt(b)) == a * b mod (X^n - 1), vs schoolbook."""
    spec = BLS12_377_FR
    rng = random.Random(9)
    log_n = 5
    n = 1 << log_n
    a_i = [rng.randrange(spec.p) for _ in range(n // 2)] + [0] * (n // 2)
    b_i = [rng.randrange(spec.p) for _ in range(n // 2)] + [0] * (n // 2)
    dom = Domain(spec, log_n)
    fa = ntt(dom, fp.from_ints(spec, a_i))
    fb = ntt(dom, fp.from_ints(spec, b_i))
    prod = fp.to_ints(spec, intt(dom, fp.mul(spec, fa, fb)))
    expect = [0] * n
    for i in range(n // 2):
        for j in range(n // 2):
            expect[(i + j) % n] = (expect[(i + j) % n] + a_i[i] * b_i[j]) % spec.p
    assert [int(v) for v in prod] == expect


def test_big_split_routing_matches_core(monkeypatch):
    """`radix2._ntt_big` (the four-step route for sizes above the Pallas
    kernel's VMEM cap) must be output-identical to the direct stage loop.
    The kernel itself is mocked unsupported so the sub-transforms run the
    generic core — this validates the split/twiddle/permutation math the
    TPU path relies on (the kernel is differentially tested separately)."""
    import jax

    from zprize_tpu.ntt import fr_kernel, radix2
    from zprize_tpu.ntt.fourstep import twiddle_matrix

    spec = BLS12_377_FR
    log_n = 9
    monkeypatch.setattr(fr_kernel, "enabled", lambda: True)
    monkeypatch.setattr(fr_kernel, "supported", lambda s, ln: False)
    monkeypatch.setattr(fr_kernel, "MAX_LOG", 4)
    monkeypatch.setattr(fr_kernel, "MIN_LOG", 2)
    # split resources must exist eagerly (ntt() is jitted)
    l1, l2 = log_n // 2, log_n - log_n // 2
    Domain(spec, l1), Domain(spec, l2)
    twiddle_matrix(spec, l1, l2, False)
    twiddle_matrix(spec, l1, l2, True)
    jax.clear_caches()
    try:
        dom = Domain(spec, log_n)
        rng = random.Random(11)
        vals = [rng.randrange(spec.p) for _ in range(2 * dom.n)]
        a = fp.from_ints(spec, vals).reshape(2, dom.n, -1)
        assert radix2._big_split(dom) == (l1, l2)
        got = ntt(dom, a)
        ref = radix2._ntt_core(dom, a, dom.pows)
        assert (np.asarray(fp.to_canonical(spec, got))
                == np.asarray(fp.to_canonical(spec, ref))).all()
        goti = intt(dom, got)
        assert (np.asarray(fp.to_canonical(spec, goti))
                == np.asarray(fp.to_canonical(spec, a))).all()
    finally:
        jax.clear_caches()


def test_power_table_matches_python_ints_large():
    """Twiddle power tables must match python-int powers AT SCALE — the
    r5 hardware find: the old on-device log-doubling build produced wrong
    limbs for the top half of the 2^17-entry Fr table on XLA:TPU (exact
    on CPU, so small-size differentials never caught it; every 2^18+
    transform inherited bad twiddles and the first 2^16-gate PLONK proof
    on hardware failed).  Tables are now host-built numpy; this pins a
    dense sample of a large table to first principles, with extra weight
    on the top half where the regression lived."""
    count = 1 << 17
    w = primitive_root(BLS12_377_FR, 18)
    tbl = ntt_domain._power_table_np(BLS12_377_FR, count, w)
    assert tbl.shape == (count, BLS12_377_FR.n_limbs)
    from zprize_tpu.field.spec import int_from_limbs
    rng = random.Random(0)
    idxs = ([0, 1, count // 2 - 1, count // 2, count - 1]
            + [rng.randrange(count // 2, count) for _ in range(32)]
            + [rng.randrange(count) for _ in range(32)])
    for k in idxs:
        assert int_from_limbs(tbl[k].astype(np.uint64)) == pow(
            w, k, BLS12_377_FR.p), k
