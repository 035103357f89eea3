"""Marlin AHP indexer: R1CS matrix arithmetization.

The role of snarkVM's `algorithms/src/snark/marlin/ahp/indexer/` — for each
matrix M the indexer produces the three polynomials (row_M, col_M, val_M)
over the non-zero-entry domain K whose rational combination is the
low-degree extension M-hat(X, Y):

    M-hat(X, Y) = sum_k  v_H(X) v_H(Y) val'_k / ((X - row_k)(Y - col_k)),

with the Lagrange-derivative normalization val'_k = val_k * col_k / n baked
into the indexed val polynomial (as snarkVM bakes its derivative factors),
so the prover/verifier only ever touch val'.

Variable -> H-slot mapping: public variable i sits at the X-subgroup point
omega^(i * n/|X|) (X = the canonical |X|-subgroup of H), witness variables
fill the remaining slots in order — the standard Marlin input-domain
embedding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..curve.spec import CurveSpec
from ..field import fp
from ..ntt.domain import Domain
from ..ntt.radix2 import intt
from ..pcs import kzg
from .r1cs import R1CS


def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


@dataclasses.dataclass
class IndexedMatrix:
    rows_idx: jax.Array      # (K,) int32 H slot of each entry's row
    cols_idx: jax.Array      # (K,) int32 H slot of each entry's column
    row_e: jax.Array         # (K, L) field plane: omega^row
    col_e: jax.Array         # (K, L) field plane: omega^col
    val: jax.Array           # (K, L) normalized val' plane
    val_raw: jax.Array       # (K, L) raw matrix coefficients (matvec form)
    row_coeffs: jax.Array    # intt_K of row_e
    col_coeffs: jax.Array
    val_coeffs: jax.Array
    max_row_count: int       # max entries in one row (for bounds)
    max_col_count: int


@dataclasses.dataclass
class IndexProverKey:
    curve: CurveSpec
    r1cs: R1CS
    log_n: int
    log_k: int
    log_x: int
    slot_of_var: np.ndarray  # (num_vars,) int64
    matrices: dict           # name -> IndexedMatrix
    srs: kzg.Srs
    vk: "IndexVerifierKey"
    commit_len: int


@dataclasses.dataclass
class IndexVerifierKey:
    curve: CurveSpec
    num_public: int
    log_n: int
    log_k: int
    log_x: int
    commitments: dict        # "{m}_{row|col|val}" -> sw.Point


def index(curve: CurveSpec, r1cs: R1CS, srs: kzg.Srs) -> IndexProverKey:
    fr = curve.scalar
    p = fr.p
    n = _pow2(max(r1cs.num_constraints, r1cs.num_vars, 2))
    log_n = n.bit_length() - 1
    x_size = _pow2(r1cs.num_public)
    log_x = x_size.bit_length() - 1
    dom_h = Domain(fr, log_n)
    w = dom_h.w
    stride = n // x_size

    # public var i -> slot i*stride (the X subgroup); witness fill the rest
    slot_of_var = np.full(r1cs.num_vars, -1, dtype=np.int64)
    taken = np.zeros(n, dtype=bool)
    for i in range(r1cs.num_public):
        slot_of_var[i] = i * stride
        taken[i * stride] = True
    free = np.flatnonzero(~taken)
    nw = r1cs.num_vars - r1cs.num_public
    slot_of_var[r1cs.num_public:] = free[:nw]

    k_size = _pow2(max(len(r1cs.a), len(r1cs.b), len(r1cs.c), 2))
    log_k = k_size.bit_length() - 1
    dom_k = Domain(fr, log_k)
    n_inv = pow(n, p - 2, p)
    # one uniform commitment length for every poly in the scheme: a single
    # MSM shape (and one cached `srs.prepared` table) covers the whole
    # protocol instead of compiling per-degree variants
    commit_len = max(2 * n, 3 * k_size)
    assert srs.size >= commit_len

    w_pows = [1] * n
    for j in range(1, n):
        w_pows[j] = w_pows[j - 1] * w % p

    matrices, comms = {}, {}
    for name, entries in (("a", r1cs.a), ("b", r1cs.b), ("c", r1cs.c)):
        rows, cols, vals, vals_raw = [], [], [], []
        row_count = np.zeros(n, np.int64)
        col_count = np.zeros(n, np.int64)
        for r, c, v in entries:
            rs, cs = r, int(slot_of_var[c])
            rows.append(rs)
            cols.append(cs)
            # val' = val * col_elem / n  (Lagrange-derivative normalization)
            vals.append(v * w_pows[cs] % p * n_inv % p)
            vals_raw.append(v % p)
            row_count[rs] += 1
            col_count[cs] += 1
        pad = k_size - len(rows)
        rows += [0] * pad
        cols += [0] * pad
        vals += [0] * pad
        vals_raw += [0] * pad

        row_e = fp.from_ints(fr, [w_pows[r] for r in rows])
        col_e = fp.from_ints(fr, [w_pows[c] for c in cols])
        val = fp.from_ints(fr, vals)
        val_raw = fp.from_ints(fr, vals_raw)
        row_coeffs = intt(dom_k, row_e)
        col_coeffs = intt(dom_k, col_e)
        val_coeffs = intt(dom_k, val)
        matrices[name] = IndexedMatrix(
            jnp.asarray(np.array(rows, np.int32)),
            jnp.asarray(np.array(cols, np.int32)),
            row_e, col_e, val, val_raw, row_coeffs, col_coeffs, val_coeffs,
            int(row_count.max(initial=1)), int(col_count.max(initial=1)))
        from ..poly import ops as poly_ops
        for part, coeffs in (("row", row_coeffs), ("col", col_coeffs),
                             ("val", val_coeffs)):
            comms[f"{name}_{part}"] = kzg.commit(
                srs, poly_ops.pad_to(fr, coeffs, commit_len))

    vk = IndexVerifierKey(curve, r1cs.num_public, log_n, log_k, log_x, comms)
    return IndexProverKey(curve, r1cs, log_n, log_k, log_x, slot_of_var,
                          matrices, srs, vk, commit_len)
