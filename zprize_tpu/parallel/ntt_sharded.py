"""Distributed four-step NTT over a device mesh.

The 2^24 four-step decomposition of every prize2 entry
(`zprize_ntt_top.mld:53-75`), with the inter-pass transpose realized as an
ICI `all_to_all` instead of an HBM/DDR relayout — exactly the mapping called
out in SURVEY.md §3.5/§5: layout, not FLOPs, decides this kernel, so the
matrix is sharded column-wise for pass 1 (local column NTTs + local
twiddles) and row-wise for pass 2.

Data layout convention:
  input  M[j1, j2] = a[j1 * n2 + j2], sharded P(None, 'shard') (columns)
  output C[k1, k2] with A[k1 + n1*k2] = C[k1, k2], sharded P('shard', None)
Use `flatten_output` (host/gather) when a natural-order vector is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..field import fp
from ..field.spec import FieldSpec
from ..ntt.domain import Domain
from ..ntt.fourstep import twiddle_matrix
from ..ntt.radix2 import ntt


@functools.lru_cache(maxsize=None)
def _make_fourstep_sharded(spec: FieldSpec, mesh: Mesh, log_n1: int,
                           log_n2: int, axis: str):
    """Cached jitted shard_map program: rebuilding `jax.jit(shard_map(...))`
    per call defeats the jit trace cache (a fresh function object each time
    recompiled every invocation — measured 3.5 s/call at 2^12 on the CPU
    mesh vs ~ms once cached)."""
    d1, d2 = Domain(spec, log_n1), Domain(spec, log_n2)

    def local(m_local, tw_local):
        # pass 1: column NTTs over the full axis 0 (local: columns sharded)
        m_local = ntt(d1, m_local, axis=0)
        m_local = fp.mul(spec, m_local, tw_local)
        # transpose across the mesh: split rows, concat columns
        m_local = jax.lax.all_to_all(m_local, axis, split_axis=0,
                                     concat_axis=1, tiled=True)
        # pass 2: row NTTs over the full axis 1 (local: rows sharded)
        return ntt(d2, m_local, axis=1)

    # jit the shard_map (un-jitted shard_map runs eagerly per device)
    return jax.jit(jax.shard_map(local, mesh=mesh,
                                 in_specs=(P(None, axis), P(None, axis)),
                                 out_specs=P(axis, None),
                                 check_vma=False))


def ntt_fourstep_sharded(spec: FieldSpec, a_matrix: jax.Array, mesh: Mesh,
                         log_n1: int, log_n2: int, axis: str = "shard"
                         ) -> jax.Array:
    """a_matrix: (n1, n2, L) with columns (axis 1) sharded over `axis`.
    Returns C (n1, n2, L) with rows (axis 0) sharded."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    n_dev = mesh.devices.size
    assert a_matrix.shape[:2] == (n1, n2)
    assert n1 % n_dev == 0 and n2 % n_dev == 0
    tw = twiddle_matrix(spec, log_n1, log_n2)  # (n1, n2, L)
    fn = _make_fourstep_sharded(spec, mesh, log_n1, log_n2, axis)
    return fn(a_matrix, tw)


def flatten_output(c_matrix: jax.Array) -> jax.Array:
    """C[k1, k2] -> natural-order A[k1 + n1*k2] (gathers; test/debug only)."""
    return jnp.swapaxes(c_matrix, 0, 1).reshape(-1, c_matrix.shape[-1])
