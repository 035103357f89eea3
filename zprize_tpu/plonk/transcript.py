"""Poseidon-based Fiat–Shamir transcript.

Plays the role of the reference's transcripts (jf-plonk
`plonk/src/transcript.rs`; snarkVM `fiat_shamir_algebraic_sponge.rs`):
deterministic challenge derivation from absorbed commitments/evaluations.
On the distributed path this runs replicated on every host (SURVEY.md §5),
removing the dispatcher round-trip the reference pays.

Encoding: Fq coordinates (377 bits) are absorbed into the Fr sponge as two
Fr elements (low 13 limbs / high 13 limbs of the canonical form) — an
injective, branch-free embedding.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..curve import sw
from ..curve.spec import CurveSpec
from ..field import fp
from ..field.spec import BLS12_377_FR
from ..hash import poseidon
from ..hash.grain import snarkvm_config


class Transcript:
    def __init__(self, curve: CurveSpec, label: int = 0x504C4F4E4B):  # "PLONK"
        self.curve = curve
        self.fr = curve.scalar
        cfg = snarkvm_config(self.fr, 2)
        self.sponge = poseidon.Sponge(cfg)
        self.sponge.absorb([fp.constant(self.fr, label)])

    def _embed_fq(self, x) -> list:
        """Canonical Fq plane -> two Fr planes (low/high limb halves)."""
        can = fp.to_canonical(self.curve.field, x)
        nf = self.curve.field.n_limbs
        half = nf // 2
        nr = self.fr.n_limbs
        lo = jnp.zeros(can.shape[:-1] + (nr,), jnp.uint32)
        hi = jnp.zeros(can.shape[:-1] + (nr,), jnp.uint32)
        lo = lo.at[..., :half].set(can[..., :half])
        hi = hi.at[..., :nf - half].set(can[..., half:])
        return [lo, hi]

    def absorb_point(self, p: sw.Point):
        aff = sw.to_affine(self.curve, p)
        self.sponge.absorb(self._embed_fq(aff.x) + self._embed_fq(aff.y))

    def absorb_point_ints(self, xy):
        """Absorb an affine point given as a host (x, y) int pair (None =
        identity, which embeds as (0, 0) exactly like the device path:
        to_affine multiplies through by inv(0) = 0).  Bit-identical to
        `absorb_point` on the same point, but the limb split runs on the
        host — the device path costs ~0.8 s/point on XLA:CPU (an eager
        Fermat inversion of z == 1 plus an eager to_canonical; the r5
        verify-bench profile hotspot)."""
        import numpy as np
        from ..field.spec import limbs_from_int
        f = self.curve.field
        nf, nr = f.n_limbs, self.fr.n_limbs
        half = nf // 2
        x, y = (0, 0) if xy is None else xy
        planes = []
        for v in (x, y):
            limbs = limbs_from_int(v % f.p, nf)     # canonical by range
            lo = np.zeros((nr,), np.uint32)
            hi = np.zeros((nr,), np.uint32)
            lo[:half] = limbs[:half]
            hi[:nf - half] = limbs[half:]
            planes += [jnp.asarray(lo), jnp.asarray(hi)]
        self.sponge.absorb(planes)

    def absorb_points_ints(self, xys):
        """Batched `absorb_point_ints`: B host points -> one absorb of
        four (B, nr) planes into a `broadcast(B)` transcript's lanes.
        Lane b evolves bit-identically to an unbatched transcript
        absorbing xys[b]."""
        import numpy as np
        from ..field.spec import limbs_from_int
        f = self.curve.field
        nf, nr = f.n_limbs, self.fr.n_limbs
        half = nf // 2
        B = len(xys)
        planes = [np.zeros((B, nr), np.uint32) for _ in range(4)]
        for b, xy in enumerate(xys):
            x, y = (0, 0) if xy is None else xy
            for ci, v in enumerate((x, y)):
                limbs = limbs_from_int(v % f.p, nf)
                planes[2 * ci][b, :half] = limbs[:half]
                planes[2 * ci + 1][b, :nf - half] = limbs[half:]
        self.sponge.absorb([jnp.asarray(pl) for pl in planes])

    def absorb_vk(self, vk):
        """Bind the verifying key into the transcript (domain size, coset
        shifts, public-input rows, selector/sigma commitments) — mirrors the
        reference verifiers absorbing the VK (jf-plonk/snarkVM), so
        challenges differ across circuits and proofs cannot be transplanted
        between VKs (round-1 advisory finding)."""
        fr = self.fr
        ints = [vk.n, vk.k1, vk.k2, len(vk.public_rows), *vk.public_rows]
        self.sponge.absorb([fp.constant(fr, v % fr.p) for v in ints])
        for name in sorted(vk.commitments):
            self.absorb_point(vk.commitments[name])

    def absorb_fr(self, x):
        self.sponge.absorb([x])

    def challenge(self):
        """One Fr challenge (a squeezed sponge element)."""
        return self.sponge.squeeze(1)[0]

    def clone(self) -> "Transcript":
        """Fork the transcript at its current state (shared immutable
        device arrays; cheap)."""
        t = object.__new__(Transcript)
        t.curve, t.fr = self.curve, self.fr
        t.sponge = self.sponge.clone()
        return t

    def broadcast(self, batch: int) -> "Transcript":
        """Fork into a (batch,)-lane transcript: each lane evolves as an
        independent sponge (subsequent absorbs take (batch, L) planes,
        challenges return (batch, L)).  Lane i's state is bit-identical to
        an unbatched transcript fed lane i's absorb sequence."""
        t = self.clone()
        t.sponge.state = jnp.broadcast_to(
            self.sponge.state, (batch,) + self.sponge.state.shape)
        return t


def vk_transcript(curve: CurveSpec, vk, label: int = 0x504C4F4E4B,
                  absorb=None) -> Transcript:
    """Transcript forked from a cached post-VK prefix: the VK absorption
    (point normalizations + sponge permutations) is identical for every
    proof under one key, so it runs once per VK object.  `absorb` overrides
    the prefix-absorption function (default `Transcript.absorb_vk`);
    byte-for-byte equivalent to building a fresh transcript and absorbing
    the VK."""
    cached = getattr(vk, "_transcript_prefix", None)
    if cached is None or cached[0] != label:
        tr = Transcript(curve, label=label)
        (absorb or Transcript.absorb_vk)(tr, vk)
        cached = (label, tr)
        object.__setattr__(vk, "_transcript_prefix", cached)
    return cached[1].clone()
