"""Marlin AHP prover + verifier over the KZG commitment scheme.

Protocol structure mirrors the reference's Marlin
(`snarkVM algorithms/src/snark/marlin/marlin.rs:303-450` prove_first_half /
prove_second_half; AHP rounds in `ahp/prover/round_functions/`):

  round 1  witness oracles  w-hat, z_A, z_B          (first.rs)
  round 2  outer sumcheck   g_1, h_1 over H          (second.rs: summed_z_m
           = eta_A z_A + eta_B z_B + eta_C z_A z_B, the "t" polynomial,
           and the q_1 = h_1 v_H + X g_1 decomposition)
  round 3  inner sumcheck   g_M, h_M, sigma_M over K (third.rs matrix
           sumcheck: the rational M-hat(alpha, beta) mass)
  round 4  evaluations at beta (H oracles) and delta (K oracles), batched
           KZG openings (sonic_pc role).

TPU-first: every polynomial step is an NTT / wide elementwise op / batched
inversion on limb planes; sparse matvecs are gather + segment-sum on the
entry domain.  The verifier's O(1) checks run on host ints (they touch a
handful of field elements), with the two batched KZG openings verified by
the real ate pairing (`pairing/host.py`).

Soundness parity with the reference's sonic_pc
(`snarkVM algorithms/src/polycommit/sonic_pc/mod.rs`):

* **Degree-bound commitments** — g_1 (deg <= |H|-2) and each g_M
  (deg <= |K|-2) additionally commit X^s * g via the shifted-powers SRS
  slice (s = srs.size-1-bound); the verifier derives the shifted
  evaluation as z^s * g(z) itself, so a g exceeding its bound cannot
  produce a consistent shifted commitment (the X^s*g polynomial would
  exceed the SRS degree).
* **Zero-knowledge mask** (opt-in, `zk_rng`): round-1 oracles are blinded
  with v_H-multiples (one fresh scalar each, the single-query hiding
  bound) and a random mask polynomial s with sum_H s = 0 joins the outer
  sumcheck (`ahp/prover/round_functions/first.rs` mask_poly role).  The
  PoSW track keeps zk off — parity with the reference's non-hiding
  Marlin mode there.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import sw
from ..curve.spec import CurveSpec
from ..field import fp
from ..ntt.domain import Domain
from ..ntt.radix2 import intt, ntt
from ..pcs import kzg
from ..plonk.transcript import Transcript, vk_transcript
from ..poly import ops as poly_ops
from .indexer import IndexProverKey, IndexVerifierKey, IndexedMatrix

M_NAMES = ("a", "b", "c")


# ------------------------------------------------------------------ helpers

def _seg_sum(fr, terms: jax.Array, seg: jax.Array, num: int,
             max_count: int) -> jax.Array:
    """Field segment-sum: raw u32 limb accumulation (bounded by
    max_count * 2^16 < 2^32) + one static-bounds normalization."""
    raw = jax.ops.segment_sum(terms, seg, num_segments=num)
    bounds = [max(1, max_count) * 65535] * fr.n_limbs
    return fp._normalize(raw, bounds, fr)


def _h_pows(dom: Domain) -> jax.Array:
    """Full (n, L) plane of omega^j (pows table holds the half; the top
    half is its negation)."""
    return jnp.concatenate([dom.pows, fp.neg(dom.spec, dom.pows)], axis=0)


_gpow_np = poly_ops.gpow_np          # shared lru-cached coset power planes


def _coset_ntt(fr, coeffs, dom_big: Domain, g: int):
    pows = jnp.asarray(_gpow_np(fr, g, dom_big.n, False))
    return ntt(dom_big, fp.mul(fr, poly_ops.pad_to(fr, coeffs, dom_big.n),
                               pows))


def _coset_intt(fr, evals, dom_big: Domain, g: int):
    pows = jnp.asarray(_gpow_np(fr, g, dom_big.n, True))
    return fp.mul(fr, intt(dom_big, evals), pows)


def _vanishing_inv_on_coset(fr, m: int, dom_big: Domain, g: int):
    """1 / (X^m - 1) on the coset g*W_big: cycles with period big/m."""
    p = fr.p
    period = dom_big.n // m
    gm = pow(g, m, p)
    wm = pow(dom_big.w, m, p)
    vals = [pow((gm * pow(wm, i, p) - 1) % p, p - 2, p) for i in range(period)]
    return jnp.tile(fp.from_ints(fr, vals), (m, 1))


def _div_vanishing(fr, coeffs: jax.Array, m: int):
    """(q, r) with coeffs = q * (X^m - 1) + r, deg r < m; the strided
    suffix-sum closed form q_i = sum_{j>=1} c_{i+jm}.  Batch-general over
    leading dims of an (..., n, L) plane."""
    nc = coeffs.shape[-2]
    lead = coeffs.shape[:-2]
    if nc <= m:
        return (fp.zeros(fr, lead + (1,)),
                poly_ops.pad_to(fr, coeffs, m))
    rows = -(-nc // m)
    c = poly_ops.pad_to(fr, coeffs, rows * m).reshape(
        lead + (rows, m, coeffs.shape[-1]))
    inc = jax.lax.associative_scan(lambda a, b: fp.add(fr, a, b), c,
                                   axis=c.ndim - 3, reverse=True)
    exc = fp.sub(fr, inc, c)                         # exclusive suffix
    q = exc.reshape(lead + (rows * m, coeffs.shape[-1]))[..., :nc - m, :]
    rem = fp.add(fr, c[..., 0, :, :], exc[..., 0, :, :])
    return q, rem


def _index_coset(fr, im: IndexedMatrix, dom_big: Domain, g: int):
    """Coset-NTT planes of the row/col index polynomials, memoized on the
    IndexedMatrix (witness-independent — the analog of the reference's
    GPU-resident arithmetization caches, `simonatsn/README.md:80-100`;
    saves 2 size-4K NTTs per matrix per prove call).  Cached as numpy
    (house rule: no jnp arrays in caches a trace could populate)."""
    key = (dom_big.n, g)
    cache = getattr(im, "_coset_cache", None)
    if cache is None or cache[0] != key:
        crow = _coset_ntt(fr, im.row_coeffs, dom_big, g)
        ccol = _coset_ntt(fr, im.col_coeffs, dom_big, g)
        cache = (key, np.asarray(jax.device_get(crow)),
                 np.asarray(jax.device_get(ccol)))
        im._coset_cache = cache
    return jnp.asarray(cache[1]), jnp.asarray(cache[2])


def _matvec(fr, im: IndexedMatrix, z_evals, n: int):
    """(M z) evaluations over H (raw matrix values)."""
    terms = fp.mul(fr, im.val_raw, z_evals[im.cols_idx])
    return _seg_sum(fr, terms, im.rows_idx, n, im.max_row_count)


def _matvec_t(fr, im: IndexedMatrix, r_vec, n: int):
    """(M^T r) evaluations over H (the t-polynomial mass per column)."""
    terms = fp.mul(fr, im.val_raw, r_vec[im.rows_idx])
    return _seg_sum(fr, terms, im.cols_idx, n, im.max_col_count)


def _add_at(fr, coeffs, terms, min_len: int):
    """coeffs + sum (sign * r * X^pos) for terms = ((pos, r, sign), ...);
    r: (B, L) planes.  Used for the v_H-multiple blinders (adding
    r*(X^n - 1) touches exactly two coefficients)."""
    ln = max(min_len, coeffs.shape[-2], max(pos for pos, _, _ in terms) + 1)
    c = poly_ops.pad_to(fr, coeffs, ln)
    for pos, r, sign in terms:
        piece = c[..., pos, :]
        piece = (fp.add(fr, piece, r) if sign > 0
                 else fp.sub(fr, piece, r))
        c = jnp.concatenate([c[..., :pos, :], piece[..., None, :],
                             c[..., pos + 1:, :]], axis=-2)
    return c


def _shift_bounds(srs_size: int, n: int, ksz: int) -> tuple[int, int]:
    """Shifted-powers offsets enforcing deg(g_1) <= n-2 and
    deg(g_M) <= ksz-2 against the FULL SRS degree (srs.size-1) — the
    degree-bound argument is relative to what tau powers exist, exactly as
    sonic_pc's shifted_powers_of_beta_g slices."""
    return srs_size - 1 - (n - 2), srs_size - 1 - (ksz - 2)


def _host_point(curve: CurveSpec, xy):
    if xy is None:
        return sw.identity(curve)
    x = fp.from_ints(curve.field, [xy[0]])[0]
    y = fp.from_ints(curve.field, [xy[1]])[0]
    return sw.Point(x, y, fp.ones(curve.field, ()))


# ------------------------------------------------------------------ proof

@dataclasses.dataclass
class MarlinProof:
    comms: dict              # name -> host affine int pair (or None)
    sigmas: dict             # matrix -> int
    evals: dict              # name -> int
    open_beta: tuple | None  # witness commitment for the beta batch
    open_delta: tuple | None


H_OPEN = ("w", "z_a", "z_b", "g_1", "h_1")
K_OPEN = tuple(f"{m}_{part}" for m in M_NAMES
               for part in ("row", "col", "val", "g", "h"))


def _absorb_vk(tr: Transcript, vk: IndexVerifierKey):
    fr = vk.curve.scalar
    for v in (vk.num_public, vk.log_n, vk.log_k, vk.log_x):
        tr.absorb_fr(fp.constant(fr, v))
    for name in sorted(vk.commitments):
        tr.absorb_point(vk.commitments[name])


def _absorb_host_point(tr: Transcript, curve, xy):
    tr.absorb_point_ints(xy)


def _vk_comm_ints(vk) -> dict:
    """Host (x, y) int pairs of the VK's index commitments, cached on the
    VK object: they are fixed per key, and converting one device point
    eagerly (to_affine + to_ints) costs ~1 s on XLA:CPU — the verifier
    runs per proof, the conversion must not."""
    cached = getattr(vk, "_comm_ints", None)
    if cached is None:
        cached = {nm: kzg.point_ints(vk.curve, c)
                  for nm, c in vk.commitments.items()}
        object.__setattr__(vk, "_comm_ints", cached)
    return cached


def _challenge_int(tr: Transcript, curve) -> int:
    return kzg.fr_int(curve, tr.challenge())


# ------------------------------------------------------------------ prover

def prove(pk: IndexProverKey, assignment: list[int],
          zk_rng=None) -> MarlinProof:
    """assignment: full variable assignment (public prefix incl. leading 1).
    Returns a proof verifiable by `verify` with the real pairing check.
    Single instance of `prove_batch`.  `zk_rng` (a random.Random) turns on
    the hiding blinders + mask polynomial."""
    return prove_batch(pk, [assignment], zk_rng=zk_rng)[0]


def prove_batch(pk: IndexProverKey, assignments,
                zk_rng=None) -> list["MarlinProof"]:
    """B-instance Marlin prover: every round's polynomial work and every
    KZG commitment runs batched over the instance axis, with per-instance
    Fiat-Shamir riding a (B,)-lane duplex sponge — ONE dispatch set serves
    B proofs.  This is the TPU-first analog of the reference's
    thread-per-proof mining loop (`simonatsn/README.md:88`: 1 thread =
    1 proof; here 1 batch = B proofs on the vector units).

    Host-sync discipline (the axon tunnel costs ~30 ms per round-trip):
    challenges stay DEVICE planes (all challenge math — vanishing
    evaluations, batched inverses, power ladders — is device arithmetic);
    commitments ride the fully-jittable window-stacked batched MSM
    (`kzg.commit_batch`); host ints materialize in one batched sync at the
    end.  Lane i's transcript is bit-compatible with an unbatched prover
    fed instance i (same absorb sequence, value-equal mod p)."""
    curve, fr = pk.curve, pk.curve.scalar
    p = fr.p
    r1 = pk.r1cs
    bsz = len(assignments)
    n, ksz, xsz = 1 << pk.log_n, 1 << pk.log_k, 1 << pk.log_x
    dom_h, dom_k = Domain(fr, pk.log_n), Domain(fr, pk.log_k)
    dom_h4, dom_k4 = Domain(fr, pk.log_n + 2), Domain(fr, pk.log_k + 2)
    dom_x = Domain(fr, pk.log_x)
    g = fr.generator
    assert pow(g, 4 * max(n, ksz), p) != 1
    srs = pk.srs
    cl = pk.commit_len

    def com(coeffs):                       # (B, deg, L) -> (B,)-lane points
        return kzg.commit_batch(srs, poly_ops.pad_to(fr, coeffs, cl))

    def bpad(a):                           # shared/unbatched -> (B, cl, L)
        a = poly_ops.pad_to(fr, a, cl)
        if a.ndim == 2:
            a = jnp.broadcast_to(a, (bsz,) + a.shape)
        return a

    publics = [[v % p for v in a[:r1.num_public]] for a in assignments]

    # assignments -> slot order, (B, n) planes
    slot_rows = []
    for a in assignments:
        sv = [0] * n
        for v, s in zip(a, pk.slot_of_var):
            sv[int(s)] = v % p
        slot_rows.append(sv)
    z_evals = fp.from_ints(fr, slot_rows)            # (B, n, L)

    tr = vk_transcript(curve, pk.vk, label=0x4D41524C494E,   # "MARLIN"
                       absorb=_absorb_vk).broadcast(bsz)
    if r1.num_public:
        pub_planes = fp.from_ints(fr, [list(col) for col in zip(*publics)])
        for i in range(r1.num_public):
            tr.absorb_fr(pub_planes[i])              # (B, L) per position

    # ---- round 1: witness oracles ---------------------------------------
    z_m = {m: jax.vmap(functools.partial(_matvec, fr, pk.matrices[m],
                                         n=n))(z_evals)
           for m in ("a", "b")}
    z_coeffs = intt(dom_h, z_evals)
    x_rows = [pub + [0] * (xsz - len(pub)) for pub in publics]
    x_evals = fp.from_ints(fr, x_rows)               # (B, xsz, L)
    x_coeffs = intt(dom_x, x_evals)
    diff = fp.sub(fr, z_coeffs, poly_ops.pad_to(fr, x_coeffs, n))
    w_coeffs, _rem = _div_vanishing(fr, diff, xsz)   # exact by construction
    za_coeffs = intt(dom_h, z_m["a"])
    zb_coeffs = intt(dom_h, z_m["b"])

    s_coeffs = None
    if zk_rng is not None:
        # hiding blinders: p + r*v_H leaves evaluations over H (and all
        # sumcheck sums) untouched while randomizing the committed
        # polynomial — one scalar per oracle covers the single beta query
        # (zk_bound = 1, `ahp/prover/round_functions/first.rs`).
        r_w, r_a, r_b = (fp.from_ints(fr, [zk_rng.randrange(p)
                                           for _ in range(bsz)])
                         for _ in range(3))
        w_coeffs = _add_at(fr, w_coeffs,
                           ((0, r_w, -1), (n, r_w, +1)), n + 1)
        za_coeffs = _add_at(fr, za_coeffs,
                            ((0, r_a, -1), (n, r_a, +1)), n + 1)
        zb_coeffs = _add_at(fr, zb_coeffs,
                            ((0, r_b, -1), (n, r_b, +1)), n + 1)
        # z' = w'*v_X + x = z + r_w*(X^n - 1)(X^xsz - 1): keeps the round-2
        # identity exact against the BLINDED w the verifier evaluates
        z_coeffs = _add_at(fr, z_coeffs,
                           ((0, r_w, +1), (xsz, r_w, -1), (n, r_w, -1),
                            (n + xsz, r_w, +1)), n + xsz + 1)
        # mask polynomial with sum_H s = 0 (coeffs at X^{jn} cancel):
        # deg <= min(3n-3, cl-1) — randomizes h_1 across its full degree
        # when cl allows (the sonic commit length covers 2n-1; the masked
        # tail beyond that is irrelevant to the single-query opening)
        deg_s = min(3 * n - 3, cl - 1)
        s_rows = []
        for _ in range(bsz):
            cs = [zk_rng.randrange(p) for _ in range(deg_s + 1)]
            cs[0] = -(sum(cs[j] for j in range(n, deg_s + 1, n))) % p
            s_rows.append(cs)
        s_coeffs = fp.from_ints(fr, s_rows)
        comms_s = com(s_coeffs)

    comms = {"w": com(w_coeffs), "z_a": com(za_coeffs),
             "z_b": com(zb_coeffs)}                  # (B,)-lane points
    if s_coeffs is not None:
        comms["s"] = comms_s
    for name in (("w", "z_a", "z_b", "s") if s_coeffs is not None
                 else ("w", "z_a", "z_b")):
        tr.absorb_point(comms[name])
    alpha = tr.challenge()                           # (B, L) device planes
    etas = {m: tr.challenge() for m in M_NAMES}

    # ---- round 2: outer sumcheck over H ---------------------------------
    one_b = fp.ones(fr, (bsz,))
    vh_alpha = fp.sub(fr, fp.pow_const(fr, alpha, n), one_b)   # (B, L)
    h_elems = _h_pows(dom_h)
    denom = fp.sub(fr, alpha[:, None, :], h_elems[None])       # (B, n, L)
    inv_d = fp.batch_inv(fr, denom.reshape(bsz * n, -1)
                         ).reshape(denom.shape)
    r_vec = fp.mul(fr, vh_alpha[:, None, :], inv_d)  # u_H(alpha, .) on H
    t_evals = None
    for m in M_NAMES:
        tm = jax.vmap(functools.partial(_matvec_t, fr, pk.matrices[m],
                                        n=n))(r_vec)
        tm = fp.mul(fr, etas[m][:, None, :], tm)
        t_evals = tm if t_evals is None else fp.add(fr, t_evals, tm)
    r_coeffs = intt(dom_h, r_vec)
    t_coeffs = intt(dom_h, t_evals)

    cr = _coset_ntt(fr, r_coeffs, dom_h4, g)
    ct = _coset_ntt(fr, t_coeffs, dom_h4, g)
    cz = _coset_ntt(fr, z_coeffs, dom_h4, g)
    cza = _coset_ntt(fr, za_coeffs, dom_h4, g)
    czb = _coset_ntt(fr, zb_coeffs, dom_h4, g)
    summed = fp.add_many(fr, [
        fp.mul(fr, etas["a"][:, None, :], cza),
        fp.mul(fr, etas["b"][:, None, :], czb),
        fp.mul(fr, etas["c"][:, None, :], fp.mul(fr, cza, czb))])
    q1_evals = fp.sub(fr, fp.mul(fr, cr, summed), fp.mul(fr, ct, cz))
    if s_coeffs is not None:
        q1_evals = fp.add(fr, q1_evals, _coset_ntt(fr, s_coeffs, dom_h4, g))
    q1_coeffs = _coset_intt(fr, q1_evals, dom_h4, g)
    h1_coeffs, rem = _div_vanishing(fr, q1_coeffs, n)
    g1_coeffs = rem[..., 1:, :]                      # rem = X g_1 (sum = 0)
    sh1, shm = _shift_bounds(srs.size, n, ksz)
    comms["g_1"] = com(g1_coeffs)
    comms["h_1"] = com(h1_coeffs)
    # degree-bound commitment: X^sh1 * g_1 via the shifted SRS slice
    comms["g_1_shift"] = kzg.commit_batch(srs, g1_coeffs, shift=sh1)
    tr.absorb_point(comms["g_1"])
    tr.absorb_point(comms["h_1"])
    tr.absorb_point(comms["g_1_shift"])
    beta = tr.challenge()

    # ---- round 3: inner sumcheck over K per matrix ----------------------
    vh_beta = fp.sub(fr, fp.pow_const(fr, beta, n), one_b)
    c_ab = fp.mul(fr, vh_alpha, vh_beta)             # (B, L)
    sigmas, g_polys, h_polys = {}, {}, {}
    vk_inv4 = _vanishing_inv_on_coset(fr, ksz, dom_k4, g)
    for m in M_NAMES:
        im = pk.matrices[m]
        den = fp.mul(fr, fp.sub(fr, alpha[:, None, :], im.row_e[None]),
                     fp.sub(fr, beta[:, None, :], im.col_e[None]))
        inv_den = fp.batch_inv(fr, den.reshape(bsz * den.shape[1], -1)
                               ).reshape(den.shape)
        f = fp.mul(fr, fp.mul(fr, c_ab[:, None, :], im.val[None]), inv_den)
        # sigma = sum_K f  (tree); stays a device plane until the final sync
        sig = f
        while sig.shape[-2] > 1:
            half = sig.shape[-2] // 2
            sig = fp.add(fr, sig[..., :half, :], sig[..., half:, :])
        sigmas[m] = sig[..., 0, :]                   # (B, L)
        f_coeffs = intt(dom_k, f)
        g_m = f_coeffs[..., 1:, :]                   # f = sigma/|K| + X g
        # h_M = (a - b (X g + sigma/|K|)) / v_K   on the 4K coset
        a_coeffs = fp.mul(fr, c_ab[:, None, :], im.val_coeffs[None])
        ca = _coset_ntt(fr, a_coeffs, dom_k4, g)
        crow, ccol = _index_coset(fr, im, dom_k4, g)       # shared (K4, L)
        cb = fp.mul(fr, fp.sub(fr, alpha[:, None, :], crow[None]),
                    fp.sub(fr, beta[:, None, :], ccol[None]))
        cf = _coset_ntt(fr, f_coeffs, dom_k4, g)     # X g + sigma/|K| = f
        ch = fp.mul(fr, fp.sub(fr, ca, fp.mul(fr, cb, cf)), vk_inv4)
        h_m = _coset_intt(fr, ch, dom_k4, g)[..., :3 * ksz, :]
        g_polys[m], h_polys[m] = g_m, h_m
        comms[f"{m}_g"] = com(g_m)
        comms[f"{m}_h"] = com(h_m)
        comms[f"{m}_g_shift"] = kzg.commit_batch(srs, g_m, shift=shm)
        tr.absorb_point(comms[f"{m}_g"])
        tr.absorb_point(comms[f"{m}_h"])
        tr.absorb_point(comms[f"{m}_g_shift"])
        tr.absorb_fr(sigmas[m])
    delta = tr.challenge()

    # ---- round 4: evaluations + batched openings ------------------------
    h_order = H_OPEN + (("s",) if s_coeffs is not None else ())
    h_polys_beta = {"w": w_coeffs, "z_a": za_coeffs, "z_b": zb_coeffs,
                    "g_1": g1_coeffs, "h_1": h1_coeffs, "s": s_coeffs}
    k_polys_delta = {}
    for m in M_NAMES:
        im = pk.matrices[m]
        k_polys_delta[f"{m}_row"] = im.row_coeffs
        k_polys_delta[f"{m}_col"] = im.col_coeffs
        k_polys_delta[f"{m}_val"] = im.val_coeffs
        k_polys_delta[f"{m}_g"] = g_polys[m]
        k_polys_delta[f"{m}_h"] = h_polys[m]

    h_stack = jnp.stack([bpad(h_polys_beta[nm]) for nm in h_order], axis=1)
    ev_b = jax.vmap(functools.partial(poly_ops.evaluate, fr))(
        h_stack, beta)                               # (B, |h_order|, L)
    k_stack = jnp.stack([bpad(k_polys_delta[nm]) for nm in K_OPEN], axis=1)
    ev_d = jax.vmap(functools.partial(poly_ops.evaluate, fr))(
        k_stack, delta)
    for i in range(len(h_order)):
        tr.absorb_fr(ev_b[:, i])
    for i in range(len(K_OPEN)):
        tr.absorb_fr(ev_d[:, i])
    u_beta = tr.challenge()
    u_delta = tr.challenge()

    def batch_open(stacked, point, u, shifted):
        """Combined witness for the stacked base polys PLUS the shifted
        degree-bound polys X^sh * g (their claimed evaluations are
        z^sh * g(z), derived by the verifier — never sent)."""
        n_base = stacked.shape[1]
        upows = jax.vmap(
            lambda uu: poly_ops.powers(fr, uu, n_base + len(shifted)))(u)
        terms = fp.mul(fr, stacked, upows[:, :n_base, None, :])
        combined = terms[:, 0]
        for i in range(1, n_base):
            combined = fp.add(fr, combined, terms[:, i])
        if shifted:
            combined = poly_ops.pad_to(fr, combined, srs.size)
            for j, (coeffs, sh) in enumerate(shifted):
                plane = jnp.pad(coeffs,
                                ((0, 0),
                                 (sh, srs.size - sh - coeffs.shape[1]),
                                 (0, 0)))
                combined = fp.add(
                    fr, combined,
                    fp.mul(fr, plane, upows[:, n_base + j, None, :]))
        q, _ = poly_ops.divide_linear(fr, combined, point)
        if q.shape[1] < cl:
            q = poly_ops.pad_to(fr, q, cl)
        return kzg.commit_batch(srs, q)

    open_beta = batch_open(h_stack, beta, u_beta,
                           [(g1_coeffs, sh1)])
    open_delta = batch_open(k_stack, delta, u_delta,
                            [(g_polys[m], shm) for m in M_NAMES])

    # ---- single batched host sync (proof materialization) ---------------
    names = list(comms)
    pts = [comms[nm] for nm in names] + [open_beta, open_delta]
    stacked_pts = sw.Point(*(jnp.stack([getattr(q, f) for q in pts])
                             for f in ("x", "y", "z")))     # (P, B) lanes
    aff = sw.to_affine(curve, stacked_pts)
    xs = fp.to_ints(curve.field, aff.x)
    ys = fp.to_ints(curve.field, aff.y)
    infs = np.asarray(jax.device_get(aff.inf))
    sig_ints = fp.to_ints(fr, jnp.stack([sigmas[m] for m in M_NAMES]))
    evb_i = fp.to_ints(fr, ev_b)                     # (B, |H_OPEN|)
    evd_i = fp.to_ints(fr, ev_d)
    proofs = []
    for b in range(bsz):
        def pt(i):
            return None if infs[i][b] else (int(xs[i][b]), int(ys[i][b]))
        comms_h = {nm: pt(i) for i, nm in enumerate(names)}
        sigmas_h = {m: int(sig_ints[i][b]) for i, m in enumerate(M_NAMES)}
        evals = {nm: int(evb_i[b][i]) for i, nm in enumerate(h_order)}
        evals.update({nm: int(evd_i[b][i]) for i, nm in enumerate(K_OPEN)})
        proofs.append(MarlinProof(comms_h, sigmas_h, evals,
                                  pt(len(names)), pt(len(names) + 1)))
    return proofs


# ---------------------------------------------------------------- verifier

def verify(vk: IndexVerifierKey, srs: kzg.Srs, public: list[int],
           proof: MarlinProof) -> bool:
    """Host-int verifier: O(1) field checks + two pairing-backed batched
    KZG openings (`verifier.rs` role).  `public` includes the leading 1."""
    checks = _verify_checks(vk, srs, public, proof)
    return checks is not None and kzg.verify_many(srs, checks)


def batch_verify(vk: IndexVerifierKey, srs: kzg.Srs, instances,
                 rng=None) -> bool:
    """Batch verification of many (public, proof) instances with ONE
    multi-pairing (the team-prize1 sean-sn strategy: all field/sumcheck
    checks run per-instance, the 2N pairing equations collapse into one
    random linear combination).  False if ANY instance fails."""
    checks = _group_checks(vk, srs, instances)
    if any(c is None for c in checks):
        return False
    return kzg.verify_many(srs, [t for c in checks for t in c], rng=rng)


def _group_checks(vk: IndexVerifierKey, srs: kzg.Srs, instances) -> list:
    """Per-instance opening-check tuples (or None on a failed host
    check), with Fiat–Shamir derivation LANE-BATCHED across instances:
    well-formed instances are bucketed by (zk flag, public length) and
    each bucket runs one broadcast transcript."""
    checks = [None] * len(instances)
    buckets: dict = {}
    for i, (public, proof) in enumerate(instances):
        if _proof_well_formed(vk, public, proof):
            key = ("s" in proof.comms, len(public))
            buckets.setdefault(key, []).append(i)
    for idxs in buckets.values():
        chs = _derive_challenges_batch(vk, [instances[i] for i in idxs])
        for i, ch in zip(idxs, chs):
            public, proof = instances[i]
            checks[i] = _checks_host(vk, srs, public, proof, ch)
    return checks


def verify_group(vk: IndexVerifierKey, srs: kzg.Srs, instances,
                 rng=None) -> list:
    """Per-instance verdicts for a group of (public, proof) instances —
    the team-prize1 harness contract (`prize-marlin-verifier/src/main.rs:37-62`:
    `verify_group` must classify EVERY proof, faulty ones included, and a
    wrong verdict in either direction fails the challenge).

    Fiat–Shamir derivation is lane-batched across the group (one
    broadcast transcript per (zk, |public|) bucket — `_group_checks`);
    the field/sumcheck checks then run per instance on host ints (a
    tampered proof usually dies here, cheaply, because its commitments
    reseed the challenges).  Instances that survive share ONE RLC
    multi-pairing; only if that combined pairing fails are the survivors
    bisected — on the CACHED opening tuples, no transcript recompute — so
    isolating f faulty pairings costs O(f·log N) multi-pairings instead
    of N single ones."""
    checks = _group_checks(vk, srs, instances)
    verdicts = [c is not None for c in checks]
    live = [i for i, c in enumerate(checks) if c is not None]

    def combined_ok(sub) -> bool:
        tuples = []
        for i in sub:
            tuples.extend(checks[i])
        return kzg.verify_many(srs, tuples, rng=rng)

    def isolate(sub):
        if not sub or combined_ok(sub):
            return
        if len(sub) == 1:
            verdicts[sub[0]] = False
            return
        mid = len(sub) // 2
        isolate(sub[:mid])
        isolate(sub[mid:])

    isolate(live)
    return verdicts


def _proof_well_formed(vk: IndexVerifierKey, public, proof) -> bool:
    """Shape/key validation shared by the sequential and lane-batched
    verifiers: a malformed proof must fail cleanly here, never poison a
    batched transcript's lanes with a KeyError."""
    if len(public) > (1 << vk.log_x) or (public and public[0] != 1):
        return False
    zk = "s" in proof.comms
    comms_needed = (("w", "z_a", "z_b") + (("s",) if zk else ())
                    + ("g_1", "h_1", "g_1_shift")
                    + tuple(f"{m}_{sfx}" for m in M_NAMES
                            for sfx in ("g", "h", "g_shift")))
    ev_needed = H_OPEN + (("s",) if zk else ()) + K_OPEN
    return (all(k in proof.comms for k in comms_needed)
            and all(m in proof.sigmas for m in M_NAMES)
            and all(k in proof.evals for k in ev_needed))


def _derive_challenges_batch(vk: IndexVerifierKey, instances) -> list:
    """Fiat–Shamir challenges for B same-shape well-formed instances via
    ONE broadcast (B-lane) transcript — ~30 sponge operations total
    instead of ~30·B (the per-absorb dispatch cost, ~3 s/proof on
    XLA:CPU, dominated the r5 verify profile after the host-int point
    embed landed).  Lane b is bit-identical to the sequential derivation
    for instance b (`Transcript.broadcast` contract).  All instances must
    share the zk flag and public-input length (`verify_group` buckets by
    those)."""
    curve = vk.curve
    fr = curve.scalar
    p = fr.p
    B = len(instances)
    zk = "s" in instances[0][1].comms
    h_order = H_OPEN + (("s",) if zk else ())
    tr = vk_transcript(curve, vk, label=0x4D41524C494E,
                       absorb=_absorb_vk).broadcast(B)

    def afr(vals):
        tr.absorb_fr(fp.from_ints(fr, [v % p for v in vals]))

    def apts(key):
        tr.absorb_points_ints([pf.comms[key] for _, pf in instances])

    def ch():
        return [int(v) for v in fp.to_ints(fr, tr.challenge())]

    for j in range(len(instances[0][0])):
        afr([pub[j] for pub, _ in instances])
    for name in (("w", "z_a", "z_b", "s") if zk else ("w", "z_a", "z_b")):
        apts(name)
    alpha = ch()
    etas = {m: ch() for m in M_NAMES}
    apts("g_1")
    apts("h_1")
    apts("g_1_shift")
    beta = ch()
    for m in M_NAMES:
        apts(f"{m}_g")
        apts(f"{m}_h")
        apts(f"{m}_g_shift")
        afr([pf.sigmas[m] for _, pf in instances])
    delta = ch()
    for name in h_order + K_OPEN:
        afr([pf.evals[name] for _, pf in instances])
    u_beta = ch()
    u_delta = ch()
    return [
        {"alpha": alpha[b], "etas": {m: etas[m][b] for m in M_NAMES},
         "beta": beta[b], "delta": delta[b], "u_beta": u_beta[b],
         "u_delta": u_delta[b]}
        for b in range(B)]


def _verify_checks(vk: IndexVerifierKey, srs: kzg.Srs, public: list[int],
                   proof: MarlinProof):
    """All transcript/sumcheck checks for one proof; returns the two KZG
    opening check tuples (host ints) or None on failure."""
    curve = vk.curve
    fr = curve.scalar
    p = fr.p
    if not _proof_well_formed(vk, public, proof):
        return None

    zk = "s" in proof.comms
    h_order = H_OPEN + (("s",) if zk else ())
    tr = vk_transcript(curve, vk, label=0x4D41524C494E, absorb=_absorb_vk)
    for v in public:
        tr.absorb_fr(fp.constant(fr, v % p))
    for name in (("w", "z_a", "z_b", "s") if zk
                 else ("w", "z_a", "z_b")):
        _absorb_host_point(tr, curve, proof.comms[name])
    alpha = _challenge_int(tr, curve)
    etas = {m: _challenge_int(tr, curve) for m in M_NAMES}
    _absorb_host_point(tr, curve, proof.comms["g_1"])
    _absorb_host_point(tr, curve, proof.comms["h_1"])
    _absorb_host_point(tr, curve, proof.comms["g_1_shift"])
    beta = _challenge_int(tr, curve)
    for m in M_NAMES:
        _absorb_host_point(tr, curve, proof.comms[f"{m}_g"])
        _absorb_host_point(tr, curve, proof.comms[f"{m}_h"])
        _absorb_host_point(tr, curve, proof.comms[f"{m}_g_shift"])
        tr.absorb_fr(fp.constant(fr, proof.sigmas[m]))
    delta = _challenge_int(tr, curve)
    for name in h_order + K_OPEN:
        tr.absorb_fr(fp.constant(fr, proof.evals[name]))
    u_beta = _challenge_int(tr, curve)
    u_delta = _challenge_int(tr, curve)
    return _checks_host(
        vk, srs, public, proof,
        {"alpha": alpha, "etas": etas, "beta": beta, "delta": delta,
         "u_beta": u_beta, "u_delta": u_delta})


def _checks_host(vk: IndexVerifierKey, srs: kzg.Srs, public: list[int],
                 proof: MarlinProof, chall: dict):
    """Host-int half of the verifier (sumchecks + opening-tuple
    assembly) given the Fiat–Shamir challenges; shared by the sequential
    and lane-batched derivations."""
    curve = vk.curve
    fr = curve.scalar
    p = fr.p
    n, ksz, xsz = 1 << vk.log_n, 1 << vk.log_k, 1 << vk.log_x
    zk = "s" in proof.comms
    h_order = H_OPEN + (("s",) if zk else ())
    alpha, etas, beta = chall["alpha"], chall["etas"], chall["beta"]
    delta, u_beta, u_delta = chall["delta"], chall["u_beta"], chall["u_delta"]

    ev = proof.evals
    v_h_alpha = (pow(alpha, n, p) - 1) % p
    v_h_beta = (pow(beta, n, p) - 1) % p
    v_x_beta = (pow(beta, xsz, p) - 1) % p
    if beta == alpha or v_h_beta == 0 or v_x_beta == 0:
        return None

    # x-hat(beta) by Lagrange over the X subgroup (|X| is tiny)
    dom_x = Domain(fr, vk.log_x)
    wx = dom_x.w
    x_inv = pow(xsz, p - 2, p)
    xhat = 0
    elem = 1
    for i in range(xsz):
        xi = public[i] if i < len(public) else 0
        li = v_x_beta * elem % p * x_inv % p * pow((beta - elem) % p,
                                                  p - 2, p) % p
        xhat = (xhat + xi * li) % p
        elem = elem * wx % p
    z_beta = (ev["w"] * v_x_beta + xhat) % p

    # outer sumcheck at beta (the zk mask s joins q_1 additively)
    r_ab = (v_h_alpha - v_h_beta) % p * pow((alpha - beta) % p, p - 2, p) % p
    summed = (etas["a"] * ev["z_a"] + etas["b"] * ev["z_b"]
              + etas["c"] * ev["z_a"] % p * ev["z_b"]) % p
    sigma3 = sum(etas[m] * proof.sigmas[m] for m in M_NAMES) % p
    s_beta = ev["s"] if zk else 0
    lhs = (s_beta + r_ab * summed - sigma3 * z_beta) % p
    rhs = (ev["h_1"] * v_h_beta + beta * ev["g_1"]) % p
    if lhs != rhs:
        return None

    # inner sumchecks at delta
    v_k_delta = (pow(delta, ksz, p) - 1) % p
    c_ab = v_h_alpha * v_h_beta % p
    k_inv = pow(ksz, p - 2, p)
    for m in M_NAMES:
        a_d = c_ab * ev[f"{m}_val"] % p
        b_d = (alpha - ev[f"{m}_row"]) % p * ((beta - ev[f"{m}_col"]) % p) % p
        f_d = (delta * ev[f"{m}_g"] + proof.sigmas[m] * k_inv) % p
        if ev[f"{m}_h"] * v_k_delta % p != (a_d - b_d * f_d) % p:
            return None

    # batched KZG openings: collect the two (C, z, y, W) host tuples;
    # the caller runs them through ONE multi-pairing (`kzg.verify_many`).
    # `shifted` entries are the degree-bound commitments: their claimed
    # evaluation is DERIVED as z^sh * y_base — never taken from the proof —
    # so a g exceeding its bound cannot satisfy the check (X^sh * g would
    # exceed the SRS degree and thus has no consistent commitment).
    sh1, shm = _shift_bounds(srs.size, n, ksz)

    def batch_tuple(order, comm_src, point, u, witness, shifted):
        pts, ks, y, upow = [], [], 0, 1
        for nm in order:
            c = comm_src(nm)
            if c is not None:
                pts.append(c)
                ks.append(upow)
            y = (y + upow * ev[nm]) % p
            upow = upow * u % p
        for shift_nm, base_nm, sh in shifted:
            c = proof.comms.get(shift_nm)
            if c is not None:
                pts.append(c)
                ks.append(upow)
            y = (y + upow * pow(point, sh, p) * ev[base_nm]) % p
            upow = upow * u % p
        # one (native) multi-exp for the u-power combination
        return (kzg.combine_ints(curve, pts, ks), point, y, witness)

    return [
        batch_tuple(h_order, lambda nm: proof.comms[nm], beta, u_beta,
                    proof.open_beta, [("g_1_shift", "g_1", sh1)]),
        batch_tuple(
            K_OPEN,
            lambda nm, _ci=_vk_comm_ints(vk): (
                _ci[nm] if nm in _ci else proof.comms[nm]),
            delta, u_delta, proof.open_delta,
            [(f"{m}_g_shift", f"{m}_g", shm) for m in M_NAMES]),
    ]
