"""Sparse matrix kernels over Fr (device).

The reference's sparse loops — SpMV for z_A/z_B (src/ahp/prover.rs:256-276)
and the `calculate_t` scatter (src/ahp/prover.rs:411-428) — become
gather + segment-sum array programs: matrices are static COO buffers
(row/col int32 arrays + Montgomery value limbs), and per-row accumulation is
an integer segment_sum over limb vectors followed by one wide modular
reduction (redundant-limb accumulation keeps the inner loop carry-free).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import active as P
from . import fr
from .limbs import ints_to_limbs


@dataclass(frozen=True)
class CooMatrix:
    """Static COO sparse matrix over Fr (device-resident)."""

    rows: jnp.ndarray  # [nnz] int32
    cols: jnp.ndarray  # [nnz] int32 (variable indices)
    vals: jnp.ndarray  # [nnz, 16] Montgomery limbs
    num_rows: int
    num_cols: int
    # column indices remapped into domain-H positions via reindex_by_subdomain
    # (set by the indexer; used by calculate_t — reference src/ahp/prover.rs:422)
    cols_reindexed: jnp.ndarray | None = None

    @staticmethod
    def from_rows(rows_of_terms: list, num_rows: int, num_cols: int) -> "CooMatrix":
        """rows_of_terms: list (per row) of (coeff:int, col:int)."""
        r_idx, c_idx, v = [], [], []
        for r, row in enumerate(rows_of_terms):
            for coeff, col in row:
                r_idx.append(r)
                c_idx.append(col)
                v.append(coeff * P.FR_MONT_R % P.R_MODULUS)
        if not r_idx:  # fully-zero matrix: keep one dummy zero entry
            r_idx, c_idx, v = [0], [0], [0]
        return CooMatrix(
            rows=jnp.asarray(np.asarray(r_idx, dtype=np.int32)),
            cols=jnp.asarray(np.asarray(c_idx, dtype=np.int32)),
            vals=jnp.asarray(ints_to_limbs(v, fr.L)),
            num_rows=num_rows,
            num_cols=num_cols,
        )

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]


@functools.partial(jax.jit, static_argnums=(3,))
def _scatter_sum_mod(prods: jnp.ndarray, seg_ids: jnp.ndarray, _unused, num_segments: int):
    sums = jax.ops.segment_sum(prods, seg_ids, num_segments=num_segments)
    return fr.reduce_wide(sums)


def spmv(m: CooMatrix, z: jnp.ndarray, out_len: int | None = None) -> jnp.ndarray:
    """M @ z -> [out_len, 16] (out_len defaults to num_rows).

    Requires per-row nnz < 2^16 (limb accumulation headroom) — asserted at
    matrix build time in the indexer.
    """
    out_len = out_len or m.num_rows
    prods = fr.mul(m.vals, z[m.cols])
    return _scatter_sum_mod(prods, m.rows, None, out_len)


def scatter_add_mod(values: jnp.ndarray, indices: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """out[indices[k]] += values[k] over Fr; the `calculate_t` primitive."""
    return _scatter_sum_mod(values, indices, None, out_len)
