"""PLONK verifier (on-device field arithmetic, real pairing-based KZG check).

Check set mirrors the reference verifier semantics (jf-plonk
`plonk/src/proof_system/verifier.rs:174-229`): validate the proof's group
elements, recompute Fiat–Shamir challenges from the transcript (VK-bound),
evaluate the gate + permutation + L1 identity at zeta, and verify the
batched KZG openings with the ate pairing (`kzg.verify` — the
`multi_pairing == one` check of `verifier.rs:229`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..curve import sw
from ..field import fp
from ..pcs import kzg
from ..poly import ops as poly_ops
from .prover import OPEN_ORDER, Proof, VerifyingKey
from .transcript import Transcript, vk_transcript


def _points_valid(vk: VerifyingKey, proof: Proof) -> bool:
    """On-curve + prime-subgroup validation of every deserialized proof
    point (invalid-point attack surface — round-1 advisory finding).
    Batched: one `is_on_curve` and one `mul_scalar` over all points."""
    curve = vk.curve
    pts = [*proof.wire_comms, proof.z_comm, *proof.t_comms,
           proof.w_zeta, proof.w_zeta_omega]
    stacked = sw.Point(jnp.stack([q.x for q in pts]),
                       jnp.stack([q.y for q in pts]),
                       jnp.stack([q.z for q in pts]))
    aff = sw.to_affine(curve, stacked)
    on_curve = sw.is_on_curve(curve, aff)
    # prime-subgroup membership: r * P == identity, batched over all points
    in_subgroup = sw.is_identity(
        curve, sw.mul_scalar_int(curve, stacked, curve.order))
    ok = jnp.all(on_curve & in_subgroup)
    return bool(jax.device_get(ok))


def verify(vk: VerifyingKey, srs: kzg.Srs, proof: Proof,
           public: list[int]) -> bool:
    curve = vk.curve
    fr = curve.scalar
    p = fr.p
    n = vk.n
    from ..ntt.domain import Domain
    dom = Domain(fr, n.bit_length() - 1)
    w = dom.w

    if not _points_valid(vk, proof):
        return False

    # --- replay the transcript -------------------------------------------
    tr = vk_transcript(curve, vk)              # cached post-VK prefix
    for v in public:
        tr.absorb_fr(fp.constant(fr, v))
    for cm in proof.wire_comms:
        tr.absorb_point(cm)
    beta = tr.challenge()
    gamma = tr.challenge()
    tr.absorb_point(proof.z_comm)
    alpha = tr.challenge()
    for cm in proof.t_comms:
        tr.absorb_point(cm)
    zeta = tr.challenge()
    for name in OPEN_ORDER:
        tr.absorb_fr(proof.evals[name])
    tr.absorb_fr(proof.evals["z_omega"])
    v_ch = tr.challenge()

    e = proof.evals

    # --- main identity at zeta -------------------------------------------
    zeta_n = fp.pow_const(fr, zeta, n)
    zh = fp.sub(fr, zeta_n, fp.ones(fr))
    n_inv = fp.constant(fr, pow(n, p - 2, p))
    l1 = fp.mul(fr, fp.mul(fr, zh, n_inv),
                fp.inv(fr, fp.sub(fr, zeta, fp.ones(fr))))

    # PI(zeta) = sum_rows (-pub) * L_row(zeta)
    pi_acc = fp.zeros(fr)
    for idx, row in enumerate(vk.public_rows):
        w_row = fp.constant(fr, pow(w, row, p))
        l_row = fp.mul(fr, fp.mul(fr, fp.mul(fr, zh, n_inv), w_row),
                       fp.inv(fr, fp.sub(fr, zeta, w_row)))
        pi_acc = fp.sub(fr, pi_acc,
                        fp.mul(fr, fp.constant(fr, public[idx] % p), l_row))

    gate = fp.add_many(fr, [
        fp.mul(fr, e["qm"], fp.mul(fr, e["a"], e["b"])),
        fp.mul(fr, e["ql"], e["a"]),
        fp.mul(fr, e["qr"], e["b"]),
        fp.mul(fr, e["qo"], e["c"]),
        e["qc"], pi_acc])

    def lin(x, base):
        return fp.add(fr, fp.add(fr, x, fp.mul(fr, beta, base)), gamma)

    k1z = fp.mul(fr, zeta, fp.constant(fr, vk.k1))
    k2z = fp.mul(fr, zeta, fp.constant(fr, vk.k2))
    perm_a = fp.mul(fr, fp.mul(fr, lin(e["a"], zeta), lin(e["b"], k1z)),
                    fp.mul(fr, lin(e["c"], k2z), e["z"]))
    perm_b = fp.mul(fr, fp.mul(fr, lin(e["a"], e["s1"]), lin(e["b"], e["s2"])),
                    fp.mul(fr, lin(e["c"], e["s3"]), e["z_omega"]))
    perm = fp.mul(fr, alpha, fp.sub(fr, perm_a, perm_b))

    l1term = fp.mul(fr, fp.mul(fr, alpha, alpha),
                    fp.mul(fr, l1, fp.sub(fr, e["z"], fp.ones(fr))))

    lhs = fp.add_many(fr, [gate, perm, l1term])
    zeta_2n = fp.mul(fr, zeta_n, zeta_n)
    t_combined = fp.add_many(fr, [
        e["t_lo"], fp.mul(fr, zeta_n, e["t_mid"]),
        fp.mul(fr, zeta_2n, e["t_hi"])])
    rhs = fp.mul(fr, zh, t_combined)
    if not bool(jnp.all(fp.eq(fr, lhs, rhs))):
        return False

    # --- KZG opening checks ----------------------------------------------
    comms = {"a": proof.wire_comms[0], "b": proof.wire_comms[1],
             "c": proof.wire_comms[2], "z": proof.z_comm,
             "t_lo": proof.t_comms[0], "t_mid": proof.t_comms[1],
             "t_hi": proof.t_comms[2], **vk.commitments}
    combined_comm = None
    combined_eval = None
    v_pow = fp.ones(fr)
    for name in OPEN_ORDER:
        cm, y = comms[name], e[name]
        term_c = sw.mul_scalar(curve, cm, v_pow)
        term_y = fp.mul(fr, y, v_pow)
        combined_comm = term_c if combined_comm is None else \
            sw.add(curve, combined_comm, term_c)
        combined_eval = term_y if combined_eval is None else \
            fp.add(fr, combined_eval, term_y)
        v_pow = fp.mul(fr, v_pow, v_ch)
    if not kzg.verify(srs, combined_comm, zeta, combined_eval, proof.w_zeta):
        return False
    zeta_omega = fp.mul(fr, zeta, fp.constant(fr, w))
    return kzg.verify(srs, proof.z_comm, zeta_omega, e["z_omega"],
                      proof.w_zeta_omega)
