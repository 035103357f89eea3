"""Mesh-sharded PLONK prover: the TPU-native form of the reference's
distributed TurboPLONK (`prize3-plonk-dizk/winderica/distributed/`).

Mapping from the reference's hand-rolled TCP star to SPMD collectives
(SURVEY.md §5):

* wire/selector/sigma polynomials sharded over the mesh rows axis — the
  analog of the 5-worker wire placement (`worker/mod.rs:142-172`), but
  symmetric (every device holds a row slice of every polynomial) instead of
  heterogeneous worker types, so the whole prover is one SPMD program;
* the permutation product Z: shard-local `associative_scan` + an
  all-gather of block totals + a ppermute shift — the collective form of
  the chained worker-i -> i+1 elementwise products
  (`worker/mod.rs:766-831`);
* the quotient's 4n-coset NTTs: four-step decomposition with ICI
  `all_to_all` transposes (natural order in, natural order out) — the
  role of the reference's out-of-core butterfly chunk exchange
  (`gpu/mod.rs:269-445`) and round-3 `share_t` scatter
  (`worker/mod.rs:994-1042`);
* KZG commitments: the points-sharded MSM with all-gathered partials
  (`parallel/msm_sharded.py`), replacing per-worker `Kernel::multiexp`
  + dispatcher merge;
* the Fiat-Shamir transcript runs replicated on the host between jitted
  phases (deterministic on every participant), removing the
  dispatcher<->worker round-trips of the reference entirely.

The per-phase functions are jitted with the mesh captured statically; all
large arrays live sharded (`NamedSharding`) across the devices, so the same
code drives 8 virtual CPU devices in tests and a real TPU pod slice.
"""

from __future__ import annotations

import dataclasses
import functools
import random as _random

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curve import sw
from ..field import fp
from ..field.spec import FieldSpec
from ..ntt.domain import Domain
from ..ntt.fourstep import twiddle_matrix
from ..ntt.radix2 import intt, ntt
from ..plonk.prover import OPEN_ORDER, Proof, ProvingKey
from ..plonk.transcript import Transcript, vk_transcript
from ..poly import ops as poly_ops
from .msm_sharded import msm_sharded


# --------------------------------------------------------------------------
# collective building blocks
# --------------------------------------------------------------------------

def _smap(local, mesh, in_specs, out_specs):
    """jit(shard_map(...)): un-jitted shard_map executes its body eagerly
    op-by-op per device — catastrophic on a CPU test mesh.  Inside an outer
    jit the extra jit is inlined for free.

    CALLERS MUST CACHE the returned program (each call builds a fresh
    function object whose jit trace cache starts empty — rebuilding per
    invocation retraces and re-lowers every time; the dist_* helpers below
    all construct theirs through lru_cached factories)."""
    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))


def _tree_fold(spec: FieldSpec, x: jax.Array, op):
    """Log-depth fold of op over axis 0 (static length)."""
    m = x.shape[0]
    while m > 1:
        half = m // 2
        merged = op(spec, x[:half], x[half:2 * half])
        if m % 2:
            merged = jnp.concatenate([merged, x[m - 1:m]], axis=0)
        x, m = merged, half + (m % 2)
    return x[0]


@functools.lru_cache(maxsize=None)
def _dist_ntt_prog(spec: FieldSpec, mesh: Mesh, axis: str, log_n: int,
                   inverse: bool):
    l1 = log_n // 2
    l2 = log_n - l1
    d1, d2 = Domain(spec, l1), Domain(spec, l2)
    tfm = intt if inverse else ntt

    def local(m_loc, tw_loc):
        # (n1/D, n2, L) row-sharded on j1 -> column-sharded on j2
        m_loc = jax.lax.all_to_all(m_loc, axis, split_axis=1, concat_axis=0,
                                   tiled=True)                # (n1, n2/D, L)
        m_loc = tfm(d1, m_loc, axis=0)                        # column NTTs
        m_loc = fp.mul(spec, m_loc, tw_loc)                   # W^(k1*j2)
        m_loc = jax.lax.all_to_all(m_loc, axis, split_axis=0, concat_axis=1,
                                   tiled=True)                # (n1/D, n2, L)
        m_loc = tfm(d2, m_loc, axis=1)                        # row NTTs
        # C[k1, k2] -> natural A[k1 + n1*k2]: k2-sharded, k2-major local
        m_loc = jax.lax.all_to_all(m_loc, axis, split_axis=1, concat_axis=0,
                                   tiled=True)                # (n1, n2/D, L)
        return m_loc.transpose(1, 0, 2).reshape(-1, m_loc.shape[-1])

    return _smap(local, mesh, (P(axis, None, None), P(None, axis, None)),
                 P(axis, None))


def dist_ntt(spec: FieldSpec, a: jax.Array, mesh: Mesh, inverse: bool = False,
             axis: str = "shard") -> jax.Array:
    """NTT of a natural-order row-sharded (n, L) array, natural-order
    row-sharded out.  Four-step n1 x n2 with three `all_to_all` transposes:
    to column-sharded (local column NTTs), back to row-sharded (local row
    NTTs + twiddles), and a final relayout to natural order.  The inverse
    runs the same dataflow with inverse twiddles (the two local iNTTs carry
    1/n1 * 1/n2 = 1/n)."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert (1 << log_n) == n
    l1 = log_n // 2
    l2 = log_n - l1
    n1, n2 = 1 << l1, 1 << l2
    n_dev = mesh.devices.size
    assert n1 % n_dev == 0 and n2 % n_dev == 0, (n1, n2, n_dev)
    tw = twiddle_matrix(spec, l1, l2, inverse)
    fn = _dist_ntt_prog(spec, mesh, axis, log_n, inverse)
    return fn(a.reshape(n1, n2, -1), tw)


@functools.lru_cache(maxsize=None)
def _dist_powers_prog(spec: FieldSpec, mesh: Mesh, axis: str, nloc: int):
    n_dev = mesh.devices.size

    def local(zz):
        pw = poly_ops.powers(spec, zz, nloc)
        z_block = fp.mul(spec, pw[-1], zz)                    # z^nloc
        alls = jax.lax.all_gather(z_block, axis)              # (D, L)
        d = jax.lax.axis_index(axis)
        mask = jnp.arange(n_dev) < d
        masked = fp.select(mask, alls, fp.ones(spec, (n_dev,)))
        off = _tree_fold(spec, masked, fp.mul)
        return fp.mul(spec, pw, off)

    return _smap(local, mesh, (P(),), P(axis, None))


def dist_powers(spec: FieldSpec, z: jax.Array, n: int, mesh: Mesh,
                axis: str = "shard") -> jax.Array:
    """[1, z, ..., z^(n-1)] as a row-sharded (n, L) plane: local log-doubling
    ladders offset by an exclusive all-prefix-product of z^(n/D)."""
    n_dev = mesh.devices.size
    assert n % n_dev == 0
    return _dist_powers_prog(spec, mesh, axis, n // n_dev)(z)


@functools.lru_cache(maxsize=None)
def _dist_cumprod_prog(spec: FieldSpec, mesh: Mesh, axis: str):
    n_dev = mesh.devices.size

    def local(r_loc):
        inc = jax.lax.associative_scan(
            lambda x, y: fp.mul(spec, x, y), r_loc, axis=0)
        tot = inc[-1]
        alls = jax.lax.all_gather(tot, axis)                  # (D, L)
        d = jax.lax.axis_index(axis)
        mask = jnp.arange(n_dev) < d
        masked = fp.select(mask, alls, fp.ones(spec, (n_dev,)))
        pref = _tree_fold(spec, masked, fp.mul)               # prod_{e<d}
        inc_g = fp.mul(spec, inc, pref)                       # global incl.
        last = inc_g[-1]
        prev = jax.lax.ppermute(last, axis,
                                [(i, i + 1) for i in range(n_dev - 1)])
        prev = jnp.where(d == 0, fp.ones(spec, ()), prev)
        return jnp.concatenate([prev[None], inc_g[:-1]], axis=0)

    return _smap(local, mesh, (P(axis, None),), P(axis, None))


def dist_cumprod_exclusive(spec: FieldSpec, ratio: jax.Array, mesh: Mesh,
                           axis: str = "shard") -> jax.Array:
    """Exclusive running product of a row-sharded (n, L) plane: the
    collective Z-polynomial merge (local scan + block-total exchange +
    ppermute shift)."""
    return _dist_cumprod_prog(spec, mesh, axis)(ratio)


@functools.lru_cache(maxsize=None)
def _dist_batch_inv_prog(spec: FieldSpec, mesh: Mesh, axis: str):
    return _smap(lambda x: fp.batch_inv(spec, x), mesh,
                 (P(axis, None),), P(axis, None))


def dist_batch_inv(spec: FieldSpec, a: jax.Array, mesh: Mesh,
                   axis: str = "shard") -> jax.Array:
    """Shard-local Montgomery batch inversion (one Fermat ladder per
    device, in parallel)."""
    return _dist_batch_inv_prog(spec, mesh, axis)(a)


@functools.lru_cache(maxsize=None)
def _dist_eval_stack_prog(spec: FieldSpec, mesh: Mesh, axis: str):
    def local(p_loc, pw_loc):
        terms = fp.mul(spec, p_loc, pw_loc[None])
        part = _tree_fold(spec, jnp.moveaxis(terms, 1, 0), fp.add)  # (K, L)
        alls = jax.lax.all_gather(part, axis)                 # (D, K, L)
        return _tree_fold(spec, alls, fp.add)

    return _smap(local, mesh, (P(None, axis, None), P(axis, None)), P())


def dist_eval_stack(spec: FieldSpec, polys: jax.Array, pows: jax.Array,
                    mesh: Mesh, axis: str = "shard") -> jax.Array:
    """Evaluate K stacked polynomials (K, n, L) at the point whose power
    plane is `pows` (n, L): local dot + tree-sum, all-gathered partials."""
    return _dist_eval_stack_prog(spec, mesh, axis)(polys, pows)


@functools.lru_cache(maxsize=None)
def _dist_suffix_sum_prog(spec: FieldSpec, mesh: Mesh, axis: str):
    n_dev = mesh.devices.size

    def local(t_loc):
        inc = jax.lax.associative_scan(
            lambda x, y: fp.add(spec, x, y), t_loc, axis=0, reverse=True)
        tot = inc[0]                                          # local suffix
        alls = jax.lax.all_gather(tot, axis)                  # (D, L)
        d = jax.lax.axis_index(axis)
        mask = jnp.arange(n_dev) > d
        masked = fp.select(mask, alls, fp.zeros(spec, (n_dev,)))
        suf = _tree_fold(spec, masked, fp.add)                # sum_{e>d}
        inc_g = fp.add(spec, inc, suf)                        # incl. suffix
        return fp.sub(spec, inc_g, t_loc)                     # excl. suffix

    return _smap(local, mesh, (P(axis, None),), P(axis, None))


def dist_divide_linear(spec: FieldSpec, a: jax.Array, z: jax.Array,
                       zpows: jax.Array, mesh: Mesh, axis: str = "shard"
                       ) -> jax.Array:
    """Quotient of a(X) / (X - z) for a row-sharded coefficient plane,
    via the suffix-sum identity q_j = z^(-j-1) * sum_{k>j} a_k z^k
    (exact in the field; z != 0 w.o.p. for transcript challenges).
    The suffix sum is a reversed sharded scan — the same collective
    pattern as the Z product."""
    t = fp.mul(spec, a, zpows)
    s_exc = _dist_suffix_sum_prog(spec, mesh, axis)(t)
    zinv = fp.inv(spec, z)
    zinv_pows = dist_powers(spec, zinv, a.shape[0], mesh, axis)
    return fp.mul(spec, fp.mul(spec, s_exc, zinv_pows), zinv)


# --------------------------------------------------------------------------
# the sharded prover
# --------------------------------------------------------------------------

@dataclasses.dataclass
class ShardedProver:
    """Wraps a single-device `ProvingKey` with mesh-resident shards and
    jitted per-round phase programs.  `prove(wires, public)` mirrors
    `plonk.prover.prove_planes` bit-for-bit (same transcript sequence, same
    blinding layout), so proofs verify under the standard verifier and match
    the single-device prover when given the same blinding randomness."""
    pk: ProvingKey
    mesh: Mesh
    axis: str = "shard"

    def __post_init__(self):
        pk, mesh, axis = self.pk, self.mesh, self.axis
        curve, fr = pk.curve, pk.curve.scalar
        n = pk.circuit.n
        n4 = 4 * n
        n_dev = mesh.devices.size
        self.nc = nc = n + 8                       # uniform commit length
        assert nc % n_dev == 0 and n % n_dev == 0
        assert pk.srs.size >= nc
        p = fr.p

        # Domains/twiddles must exist before the jitted phases trace
        # (Domain construction is guarded against running inside a trace).
        for total in (n.bit_length() - 1, n4.bit_length() - 1):
            l1, l2 = total // 2, total - total // 2
            Domain(fr, l1), Domain(fr, l2)
            twiddle_matrix(fr, l1, l2, False)
            twiddle_matrix(fr, l1, l2, True)

        row = NamedSharding(mesh, P(axis, None))
        row3 = NamedSharding(mesh, P(None, axis, None))
        put_row = functools.partial(jax.device_put, device=row)

        # MSM plan for the uniform-length commits
        self.nloc = nloc = nc // n_dev
        self.c_commit = max(6, min(13, nloc.bit_length() - 4))
        mean = max(1, nloc // (1 << (self.c_commit - 1)))
        self.cap_commit = min(nloc, 8 * mean + 32)
        self.srs_pts = sw.Affine(
            put_row(pk.srs.g1_powers.x[:nc]),
            put_row(pk.srs.g1_powers.y[:nc]),
            jax.device_put(pk.srs.g1_powers.inf[:nc],
                           NamedSharding(mesh, P(axis))))

        # row-sharded circuit planes
        self.sel = {k: put_row(v) for k, v in pk.selectors.items()}
        self.sigma_coeffs = jax.device_put(pk.sigma_coeffs, row3)
        self.sigma_evals = jax.device_put(pk.sigma_evals, row3)
        self.id_evals = jax.device_put(pk.id_evals, row3)

        # host-precomputed power planes (iterative products, then sharded)
        def pow_plane(base: int, count: int):
            vals, cur = [], 1
            for _ in range(count):
                vals.append(cur)
                cur = cur * base % p
            return put_row(fp.from_ints(fr, vals))

        g = pk.coset_g
        self.gpow4 = pow_plane(g, n4)
        self.ginv4 = pow_plane(pow(g, p - 2, p), n4)
        gn = pow(g, n, p)
        w4n = pow(pk.dom4.w, n, p)
        zh_inv = [pow((gn * pow(w4n, i, p) - 1) % p, p - 2, p)
                  for i in range(4)]
        self.zh_inv4 = put_row(jnp.tile(fp.from_ints(fr, zh_inv),
                                        (n4 // 4, 1)))
        # x = g * w4^i on the coset
        wv, cur = [], 1
        for _ in range(n4):
            wv.append(g * cur % p)
            cur = cur * pk.dom4.w % p
        self.xs4 = put_row(fp.from_ints(fr, wv))

        # fixed coset evaluations (per-circuit, not per-proof)
        def coset4(coeffs):
            padded = poly_ops.pad_to(fr, coeffs, n4)
            return dist_ntt(fr, fp.mul(fr, padded, self.gpow4), mesh,
                            axis=axis)

        @functools.partial(jax.jit)
        def precompute():
            csel = {k: coset4(v) for k, v in self.sel.items()}
            cs = [coset4(self.sigma_coeffs[i]) for i in range(3)]
            n_inv = pow(n, p - 2, p)
            l1_coeffs = jnp.broadcast_to(fp.constant(fr, n_inv)[None],
                                         (n, fr.n_limbs))
            cl1 = coset4(l1_coeffs)
            return csel, cs, cl1

        self.csel, self.cs, self.cl1 = jax.block_until_ready(precompute())
        self._coset4 = coset4
        self._build_phases()

    # -- jitted phases ----------------------------------------------------
    def _build_phases(self):
        pk, mesh, axis = self.pk, self.mesh, self.axis
        curve, fr = pk.curve, pk.curve.scalar
        n, nc = pk.circuit.n, self.nc
        n4 = 4 * n
        cc = pk.circuit
        p = fr.p

        def commit(coeffs):
            return msm_sharded(curve, self.srs_pts, coeffs, mesh,
                               c=self.c_commit, cap_total=self.cap_commit,
                               axis=axis)

        def blind(coeffs, r_plane):
            k = r_plane.shape[0]
            ext = poly_ops.pad_to(fr, coeffs, nc)
            ext = ext.at[:k].set(fp.sub(fr, ext[:k], r_plane))
            ext = ext.at[n:n + k].set(fp.add(fr, ext[n:n + k], r_plane))
            return ext

        @jax.jit
        def phase1(wires, r_planes):
            wcs, comms = [], []
            for i in range(3):
                wc = blind(dist_ntt(fr, wires[i], mesh, inverse=True,
                                    axis=axis), r_planes[i])
                wcs.append(wc)
                comms.append(commit(wc))
            return jnp.stack(wcs), comms

        @jax.jit
        def phase2(wires, beta, gamma, rz_plane):
            def lin(wcol, base):
                return fp.add(fr, fp.add(fr, wcol, fp.mul(fr, beta, base)),
                              jnp.broadcast_to(gamma, wcol.shape))
            num = fp.mul(fr, fp.mul(fr, lin(wires[0], self.id_evals[0]),
                                    lin(wires[1], self.id_evals[1])),
                         lin(wires[2], self.id_evals[2]))
            den = fp.mul(fr, fp.mul(fr, lin(wires[0], self.sigma_evals[0]),
                                    lin(wires[1], self.sigma_evals[1])),
                         lin(wires[2], self.sigma_evals[2]))
            ratio = fp.mul(fr, num, dist_batch_inv(fr, den, mesh, axis))
            z_evals = dist_cumprod_exclusive(fr, ratio, mesh, axis)
            z_coeffs = blind(dist_ntt(fr, z_evals, mesh, inverse=True,
                                      axis=axis), rz_plane)
            return z_coeffs, commit(z_coeffs)

        @jax.jit
        def phase3(wire_coeffs, z_coeffs, pub_plane, beta, gamma, alpha):
            csel, cs, cl1 = self.csel, self.cs, self.cl1
            ca = self._coset4(wire_coeffs[0])
            cb = self._coset4(wire_coeffs[1])
            ccw = self._coset4(wire_coeffs[2])
            cz = self._coset4(z_coeffs)
            cz_w = jnp.roll(cz, -4, axis=0)

            pi_evals = fp.zeros(fr, (n,))
            for idx, prow in enumerate(cc.public_rows):
                pi_evals = pi_evals.at[prow].set(
                    fp.neg(fr, pub_plane[idx]))
            cpi = self._coset4(dist_ntt(fr, pi_evals, mesh, inverse=True,
                                        axis=axis))

            gate = fp.add_many(fr, [
                fp.mul(fr, csel["qm"], fp.mul(fr, ca, cb)),
                fp.mul(fr, csel["ql"], ca),
                fp.mul(fr, csel["qr"], cb),
                fp.mul(fr, csel["qo"], ccw),
                csel["qc"], cpi])

            def lin4(wc, base):
                return fp.add(fr, fp.add(fr, wc, fp.mul(fr, beta, base)),
                              jnp.broadcast_to(gamma, wc.shape))

            xs = self.xs4
            k1c = fp.mul_const(fr, xs, cc.k1) if cc.k1 < (1 << 15) else \
                fp.mul(fr, xs, fp.constant(fr, cc.k1))
            k2c = fp.mul_const(fr, xs, cc.k2) if cc.k2 < (1 << 15) else \
                fp.mul(fr, xs, fp.constant(fr, cc.k2))
            perm_a = fp.mul(fr, fp.mul(fr, lin4(ca, xs), lin4(cb, k1c)),
                            fp.mul(fr, lin4(ccw, k2c), cz))
            perm_b = fp.mul(fr, fp.mul(fr, lin4(ca, cs[0]), lin4(cb, cs[1])),
                            fp.mul(fr, lin4(ccw, cs[2]), cz_w))
            perm = fp.mul(fr, fp.sub(fr, perm_a, perm_b), alpha)

            z_minus_1 = fp.sub(fr, cz, fp.ones(fr, cz.shape[:-1]))
            l1term = fp.mul(fr, fp.mul(fr, alpha, alpha),
                            fp.mul(fr, cl1, z_minus_1))

            numerator = fp.add_many(fr, [gate, perm, l1term])
            t_evals = fp.mul(fr, numerator, self.zh_inv4)
            t_coeffs = fp.mul(fr, dist_ntt(fr, t_evals, mesh, inverse=True,
                                           axis=axis), self.ginv4)
            t_lo = poly_ops.pad_to(fr, t_coeffs[:n], nc)
            t_mid = poly_ops.pad_to(fr, t_coeffs[n:2 * n], nc)
            t_hi = poly_ops.pad_to(fr, t_coeffs[2 * n:3 * n + 6], nc)
            chunks = jnp.stack([t_lo, t_mid, t_hi])
            return chunks, [commit(t) for t in (t_lo, t_mid, t_hi)]

        @jax.jit
        def phase4(stack, z_coeffs, zeta):
            omega = fp.constant(fr, pk.dom.w)
            zeta_omega = fp.mul(fr, zeta, omega)
            zp = dist_powers(fr, zeta, nc, mesh, axis)
            evals = dist_eval_stack(fr, stack, zp, mesh, axis)
            zwp = dist_powers(fr, zeta_omega, nc, mesh, axis)
            z_omega = dist_eval_stack(fr, z_coeffs[None], zwp, mesh, axis)[0]
            return evals, z_omega, zp, zwp

        @jax.jit
        def phase5(stack, z_coeffs, zeta, zeta_omega, v_ch, zp, zwp):
            combined, v_pow = None, fp.ones(fr)
            for i in range(stack.shape[0]):
                term = fp.mul(fr, stack[i], v_pow)
                combined = term if combined is None else \
                    fp.add(fr, combined, term)
                v_pow = fp.mul(fr, v_pow, v_ch)
            q_zeta = dist_divide_linear(fr, combined, zeta, zp, mesh, axis)
            q_zw = dist_divide_linear(fr, z_coeffs, zeta_omega, zwp, mesh,
                                      axis)
            return commit(q_zeta), commit(q_zw)

        self._phases = (phase1, phase2, phase3, phase4, phase5)

    # -- the 5-round driver ----------------------------------------------
    def prove(self, wires: jax.Array, public: list[int],
              blinding_rng=None) -> Proof:
        """wires: (3, n, L) evaluation planes (device- or host-resident);
        mirrors `prove_planes` exactly (transcript order, blinding layout)."""
        pk = self.pk
        curve, fr = pk.curve, pk.curve.scalar
        p = fr.p
        phase1, phase2, phase3, phase4, phase5 = self._phases
        brng = blinding_rng if blinding_rng is not None \
            else _random.SystemRandom()
        wires = jax.device_put(
            wires, NamedSharding(self.mesh, P(None, self.axis, None)))

        transcript = vk_transcript(curve, pk.vk)   # cached post-VK prefix
        for v in public:
            transcript.absorb_fr(fp.constant(fr, v))

        r_planes = jnp.stack([
            fp.from_ints(fr, [brng.randrange(p), brng.randrange(p)])
            for _ in range(3)])
        wire_coeffs, wire_comms = phase1(wires, r_planes)
        wire_comms = [sw.Point(*map(jnp.asarray, c)) for c in wire_comms]
        for cm in wire_comms:
            transcript.absorb_point(cm)
        beta = transcript.challenge()
        gamma = transcript.challenge()

        rz = fp.from_ints(fr, [brng.randrange(p) for _ in range(3)])
        z_coeffs, z_comm = phase2(wires, beta, gamma, rz)
        transcript.absorb_point(z_comm)
        alpha = transcript.challenge()

        pub_plane = fp.from_ints(fr, [v % p for v in public]) \
            if public else fp.zeros(fr, (0,))
        t_chunks, t_comms = phase3(wire_coeffs, z_coeffs, pub_plane,
                                   beta, gamma, alpha)
        for cm in t_comms:
            transcript.absorb_point(cm)
        zeta = transcript.challenge()

        # stack every opened polynomial at the uniform nc length
        sel, sc = self.sel, self.sigma_coeffs
        pad = functools.partial(poly_ops.pad_to, fr)
        stack = jnp.stack([
            wire_coeffs[0], wire_coeffs[1], wire_coeffs[2], z_coeffs,
            t_chunks[0], t_chunks[1], t_chunks[2],
            pad(sel["ql"], self.nc), pad(sel["qr"], self.nc),
            pad(sel["qo"], self.nc), pad(sel["qm"], self.nc),
            pad(sel["qc"], self.nc), pad(sc[0], self.nc),
            pad(sc[1], self.nc), pad(sc[2], self.nc)])
        ev, z_omega, zp, zwp = phase4(stack, z_coeffs, zeta)
        evals = {name: ev[i] for i, name in enumerate(OPEN_ORDER)}
        evals["z_omega"] = z_omega
        for name in OPEN_ORDER:
            transcript.absorb_fr(evals[name])
        transcript.absorb_fr(evals["z_omega"])
        v_ch = transcript.challenge()

        omega = fp.constant(fr, pk.dom.w)
        zeta_omega = fp.mul(fr, zeta, omega)
        w_zeta, w_zeta_omega = phase5(stack, z_coeffs, zeta, zeta_omega,
                                      v_ch, zp, zwp)
        return Proof(wire_comms, z_comm, t_comms, evals, w_zeta,
                     w_zeta_omega)
