"""Flood regression: a single segment receiving > 2^16 contributions.

Round 2's soundness bug was a uint32 overflow once one segment of the
sparse accumulation received more than 2^16 terms (a variable referenced
by every constraint floods one index).  The byte-plane fix
(ops/sparse._scatter_sum_mod) is exact to 2^24 contributions per segment;
this pins the regression ABOVE the old 2^16 cliff, and checks the
indexer's capacity gate now keys on total nnz (2^24), not per-row fan-in.

Reference behavior being matched: ark's sparse loops accumulate in full
field arithmetic and have no such cliff (src/ahp/prover.rs:256-276).
"""

import numpy as np
import pytest

from marlin_tpu.fields import active as P
from marlin_tpu.ops import fr
from marlin_tpu.ops.sparse import CooMatrix, spmv

R = P.R_MODULUS


@pytest.mark.slow
def test_row_fanin_past_2_16():
    # one row with 2^16 + 3 entries, all hitting distinct columns
    n = (1 << 16) + 3
    rng = np.random.default_rng(7)
    coeffs = [int(x) for x in rng.integers(1, 1 << 62, size=n)]
    row = [(c, i) for i, c in enumerate(coeffs)]
    m = CooMatrix.from_rows([row], num_rows=1, num_cols=n)
    z_ints = [int(x) for x in rng.integers(1, 1 << 62, size=n)]
    z = fr.from_ints(z_ints)
    out = fr.to_ints(spmv(m, z))
    expect = sum(c * v for c, v in zip(coeffs, z_ints)) % R
    assert out[0] == expect


def test_column_flood_smoke():
    # every entry lands in ONE segment: 2^12 contributions of near-maximal
    # limb values (fast tier; the slow tier above crosses the 2^16 cliff)
    n = 1 << 12
    c = R - 2
    row = [(c, i) for i in range(n)]
    m = CooMatrix.from_rows([row], num_rows=1, num_cols=n)
    z_ints = [R - 3] * n
    out = fr.to_ints(spmv(m, fr.from_ints(z_ints)))
    assert out[0] == (n * ((R - 2) * (R - 3) % R)) % R


@pytest.mark.slow
def test_indexer_accepts_row_fanin_past_2_16():
    """A constraint referencing > 2^16 variables used to be rejected by the
    stale per-row gate; it must now index (capacity is total nnz 2^24)."""
    from marlin_tpu.snark.indexer import index_circuit
    from marlin_tpu.snark.r1cs import lc

    fan = (1 << 16) + 1

    class WideCircuit:
        def generate_constraints(self, cs):
            out = cs.new_input_variable(lambda: fan % R)
            xs = [cs.new_witness_variable(lambda: 1) for _ in range(fan)]
            one = cs.new_witness_variable(lambda: 1)
            cs.enforce_constraint(lc(*xs), lc(one), lc(out))

    idx = index_circuit(WideCircuit())
    assert idx.index_info.num_non_zero > (1 << 16)
