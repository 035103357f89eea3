"""Poseidon Merkle trees (batched 2-to-1 compression).

The Merkle-membership workload of the reference's PLONK circuit generator
(`winderica/distributed/src/circuit.rs:676-703` builds 65,536 membership
proofs) and the prize6-poseidon track's tree mode.  Every level hashes all
sibling pairs in one batched sponge evaluation — log2(n) permutation calls
total for a full tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field import fp
from .grain import PoseidonConfig
from .poseidon import Sponge


def hash_pairs(cfg: PoseidonConfig, left: jax.Array, right: jax.Array
               ) -> jax.Array:
    """Batched 2-to-1 Poseidon compression: (..., L) x (..., L) -> (..., L).
    Equivalent to absorbing [left, right] into a fresh sponge and squeezing
    one element (rate-2 sponge: one permutation)."""
    sponge = Sponge(cfg, left.shape[:-1])
    sponge.absorb([left, right])
    return sponge.squeeze(1)[0]


def build_tree(cfg: PoseidonConfig, leaves: jax.Array) -> list:
    """Full binary Merkle tree over (n, L) leaf planes (n a power of two).
    Returns the list of levels, leaves first; levels[-1][0] is the root."""
    n = leaves.shape[0]
    assert n & (n - 1) == 0 and n >= 1
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = hash_pairs(cfg, cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


def root(levels: list) -> jax.Array:
    return levels[-1][0]


def prove(levels: list, index: int):
    """Authentication path for leaf `index`: list of (sibling plane, is_right)
    where is_right means the sibling is the right child."""
    path = []
    for lvl in levels[:-1]:
        sib = index ^ 1
        path.append((lvl[sib], index & 1 == 0))
        index >>= 1
    return path


def verify(cfg: PoseidonConfig, spec, root_plane, leaf_plane, index: int,
           path) -> bool:
    cur = leaf_plane
    for sib, sib_is_right in path:
        if sib_is_right:
            cur = hash_pairs(cfg, cur, sib)
        else:
            cur = hash_pairs(cfg, sib, cur)
        index >>= 1
    return bool(jax.device_get(jnp.all(fp.eq(spec, cur, root_plane))))
