"""Pure-python affine short-Weierstrass reference (the L0 oracle).

Plays the role arkworks plays in the reference's test strategy (ground truth
for every accelerated op, cf. `prize1a-msm-gpu/yrrid/tests/msm.rs:24-33`):
classic affine formulas over python ints, with None as the identity.
"""

from __future__ import annotations


def ec_add(p, q, prime, a=0):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % prime == 0:
            return None
        lam = (3 * x1 * x1 + a) * pow(2 * y1, prime - 2, prime) % prime
    else:
        lam = (y2 - y1) * pow(x2 - x1, prime - 2, prime) % prime
    x3 = (lam * lam - x1 - x2) % prime
    y3 = (lam * (x1 - x3) - y1) % prime
    return (x3, y3)


def ec_neg(p, prime):
    return None if p is None else (p[0], (-p[1]) % prime)


def ec_mul(p, k, prime, a=0):
    acc = None
    while k:
        if k & 1:
            acc = ec_add(acc, p, prime, a)
        p = ec_add(p, p, prime, a)
        k >>= 1
    return acc


def ec_msm(points, scalars, prime, a=0):
    acc = None
    for p, s in zip(points, scalars):
        acc = ec_add(acc, ec_mul(p, s, prime, a), prime, a)
    return acc


def on_curve(p, prime, b, a=0):
    if p is None:
        return True
    x, y = p
    return (y * y - (x * x * x + a * x + b)) % prime == 0


def sqrt_mod(n, p):
    """Tonelli–Shanks; returns None if n is not a QR."""
    n %= p
    if n == 0:
        return 0
    if pow(n, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(n, (p + 1) // 4, p)
    s, q = 0, p - 1
    while q % 2 == 0:
        s, q = s + 1, q // 2
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(n, q, p), pow(n, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        bexp = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, bexp * bexp % p, t * bexp * bexp % p, r * bexp % p
    return r


def random_subgroup_points(curve_spec, count, seed=0):
    """Deterministic points in the prime-order subgroup: multiples of the
    spec generator by seeded random scalars."""
    import random
    rng = random.Random(seed)
    g = (curve_spec.gen_x, curve_spec.gen_y)
    prime = curve_spec.field.p
    out = []
    for _ in range(count):
        k = rng.randrange(1, curve_spec.order)
        out.append(ec_mul(g, k, prime))
    return out
