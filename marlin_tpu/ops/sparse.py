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
    """Per-segment modular sum of [nnz, L] base-2^16 limb vectors.

    A segment can receive the WHOLE nnz (e.g. a variable used by every
    constraint scatters one column index nnz times), and a plain uint32
    segment sum overflows once a segment exceeds 2^16 contributions
    (2^16-magnitude limbs x 2^16 terms = 2^32 — first bites at |H| > 2^16,
    which silently corrupted 2^18 proofs).  x64 is unavailable under JAX's
    default config, so each limb splits into its two bytes, the two byte
    planes segment-sum separately in uint32 (safe to 2^24 contributions
    per segment), and the byte-plane sums refold into base-2^16 pieces
    spread over L+2 redundant limbs — every refolded piece < 2^16, at most
    four land per limb, comfortably inside reduce_wide's < 2^32 - 2^16
    limb bound.
    """
    assert prods.shape[0] < 1 << 24, "segment sum capacity (2^24 rows)"
    lo8 = jax.ops.segment_sum(prods & 0xFF, seg_ids, num_segments=num_segments)
    hi8 = jax.ops.segment_sum(prods >> 8, seg_ids, num_segments=num_segments)
    # value per limb i: lo8_i + hi8_i * 2^8, each sum < 2^32
    t = (hi8 & 0xFFFFFF) << 8  # < 2^32
    pieces = [
        (lo8 & 0xFFFF, 0),
        (lo8 >> 16, 1),
        (t & 0xFFFF, 0),
        (t >> 16, 1),
        (hi8 >> 24, 2),
    ]
    pad = [(0, 0)] * (prods.ndim - 1)
    wide = None
    for arr, off in pieces:
        shifted = jnp.pad(arr, pad + [(off, 2 - off)])
        wide = shifted if wide is None else wide + shifted
    return fr.reduce_wide(wide)


def spmv(m: CooMatrix, z: jnp.ndarray, out_len: int | None = None) -> jnp.ndarray:
    """M @ z -> [out_len, 16] (out_len defaults to num_rows).

    Exact up to 2^24 contributions per row (byte-plane accumulation above);
    the indexer gates total joint nnz at 2^24 accordingly.
    """
    out_len = out_len or m.num_rows
    prods = fr.mul(m.vals, z[m.cols])
    return _scatter_sum_mod(prods, m.rows, None, out_len)


def scatter_add_mod(values: jnp.ndarray, indices: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """out[indices[k]] += values[k] over Fr; the `calculate_t` primitive."""
    return _scatter_sum_mod(values, indices, None, out_len)
