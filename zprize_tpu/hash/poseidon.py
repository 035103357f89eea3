"""Batched Poseidon permutation and duplex sponge.

The "Poseidon workload" of the reference (Fiat–Shamir inside every Marlin /
PLONK proof; `snarkVM algorithms/src/crypto_hash/poseidon.rs:27-183`, GPU
attempt discussed in `prize1-marlin-verifier/anonymous-00289b84/.../verifier-opt.md:39-46`).

TPU-first: the permutation is expressed over a whole batch of sponges at
once — state shape (..., t, L) — so the MDS layer is a small constant matrix
combination over wide vector lanes and the S-box x^17 is 4 squarings + 1 mul
(the `apply_s_box` x^5 = 2 sqr + 1 mul trick of the reference generalizes).
Round structure (ark -> sbox -> mds; partial rounds touch state[0] only)
matches snarkVM exactly and is validated against its snapshot fixtures.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp
from ..field.spec import limbs_from_int
from .grain import PoseidonConfig, snarkvm_config


@functools.lru_cache(maxsize=None)
def _tables(cfg: PoseidonConfig):
    """Device constant tables: ark (rounds, t, L), mds (t, t, L)."""
    n = cfg.spec.n_limbs
    ark = np.stack([
        np.stack([limbs_from_int(v, n) for v in row]) for row in cfg.ark])
    mds = np.stack([
        np.stack([limbs_from_int(v, n) for v in row]) for row in cfg.mds])
    return jnp.asarray(ark), jnp.asarray(mds)


def _sbox(cfg: PoseidonConfig, x: jax.Array) -> jax.Array:
    """x^alpha with a fixed square-and-multiply chain (alpha is 17 or 5)."""
    f = cfg.spec
    a = cfg.alpha
    assert a >= 1
    # addition-chain for small fixed alpha: binary method, unrolled
    result = None
    base = x
    e = a
    while e:
        if e & 1:
            result = base if result is None else fp.mul(f, result, base)
        e >>= 1
        if e:
            base = fp.sqr(f, base)
    return result


def permute(cfg: PoseidonConfig, state: jax.Array) -> jax.Array:
    """One Poseidon permutation over a batch of states (..., t, L)."""
    ark, mds = _tables(cfg)  # host-level: keeps concrete arrays in the cache
    return _permute_core(cfg, state, ark, mds)


@functools.partial(jax.jit, static_argnums=0)
def _permute_core(cfg: PoseidonConfig, state: jax.Array, ark, mds) -> jax.Array:
    """Loop-structured (fori over rounds with the ark table indexed per
    round) so the compiled graph holds one full-round and one partial-round
    body regardless of the 39+ round count."""
    f = cfg.spec
    t = cfg.t
    rf, rp = cfg.full_rounds, cfg.partial_rounds
    half = rf // 2

    def mds_layer(st):
        cols = [st[..., j, :] for j in range(t)]
        new_cols = []
        for i in range(t):
            terms = [fp.mul(f, cols[j], mds[i, j]) for j in range(t)]
            new_cols.append(fp.add_many(f, terms))
        return jnp.stack(new_cols, axis=-2)

    def full_round(r, st):
        st = fp.add(f, st, ark[r])
        st = _sbox(cfg, st)
        return mds_layer(st)

    def partial_round(r, st):
        st = fp.add(f, st, ark[r])
        s0 = _sbox(cfg, st[..., 0:1, :])
        st = jnp.concatenate([s0, st[..., 1:, :]], axis=-2)
        return mds_layer(st)

    state = jax.lax.fori_loop(0, half, full_round, state)
    state = jax.lax.fori_loop(half, half + rp, partial_round, state)
    state = jax.lax.fori_loop(half + rp, rf + rp, full_round, state)
    return state


class Sponge:
    """Duplex Poseidon sponge with snarkVM semantics
    (`poseidon.rs:123-330`): capacity element first, absorb/squeeze mode
    tracking, permutation on rate exhaustion.

    Host-orchestrated: the mode/index bookkeeping is static python (as in the
    reference, where it is compile-time control flow); the state lives on
    device and is batched over leading dimensions."""

    def __init__(self, cfg: PoseidonConfig, batch_shape=()):
        self.cfg = cfg
        self.state = fp.zeros(cfg.spec, (*batch_shape, cfg.t))
        self.mode = ("absorbing", 0)

    def clone(self) -> "Sponge":
        """Snapshot of the duplex state (device arrays are immutable, so a
        shallow copy suffices) — lets callers cache a common absorbed
        prefix (e.g. a verifying key) and fork per proof."""
        s = object.__new__(Sponge)
        s.cfg = self.cfg
        s.state = self.state
        s.mode = self.mode
        return s

    def _permute(self):
        self.state = permute(self.cfg, self.state)

    def _set_rate_elem(self, idx: int, value: jax.Array):
        # rate elements start after the capacity elements
        j = self.cfg.capacity + idx
        cur = self.state[..., j, :]
        upd = fp.add(self.cfg.spec, cur, value)
        self.state = self.state.at[..., j, :].set(upd)

    def absorb(self, elements):
        """elements: list of (..., L) field planes (one per absorbed elem)."""
        if not elements:
            return
        mode, idx = self.mode
        if mode == "squeezing":
            self._permute()
            idx = 0
        elif idx == self.cfg.rate:
            self._permute()
            idx = 0
        for i, e in enumerate(elements):
            if idx == self.cfg.rate:
                self._permute()
                idx = 0
            self._set_rate_elem(idx, e)
            idx += 1
        self.mode = ("absorbing", idx)

    def squeeze(self, count: int):
        """Returns a list of (..., L) field planes."""
        if count == 0:
            return []
        mode, idx = self.mode
        if mode == "absorbing" or idx == self.cfg.rate:
            self._permute()
            idx = 0
        out = []
        for _ in range(count):
            if idx == self.cfg.rate:
                self._permute()
                idx = 0
            out.append(self.state[..., self.cfg.capacity + idx, :])
            idx += 1
        self.mode = ("squeezing", idx)
        return out


def hash_many(cfg: PoseidonConfig, inputs, num_outputs: int = 1):
    """Poseidon::evaluate_many — absorb all inputs, squeeze outputs.
    `inputs`: list of (..., L) planes."""
    batch = inputs[0].shape[:-1] if inputs else ()
    sponge = Sponge(cfg, batch)
    sponge.absorb(inputs)
    return sponge.squeeze(num_outputs)


def default_fr377_sponge_config():
    from ..field.spec import BLS12_377_FR
    return snarkvm_config(BLS12_377_FR, 2)
