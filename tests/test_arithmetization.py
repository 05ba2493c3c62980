"""Arithmetization unit tests (reference src/ahp/constraint_systems.rs:292-408).

Checks that the six index polynomials encode the transposed joint matrix
with the u_H(j,j)^-1 scaling, exactly as `check_arithmetization` does.
"""

import random

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.ops import fr, ntt, poly
from marlin_tpu.snark.constraint_systems import arithmetize_matrix, num_non_zero, sum_matrices
from marlin_tpu.snark.domains import Radix2Domain

R = P.R_MODULUS
one = 1


def _entry(matrix, row, col):
    for f, i in matrix[row]:
        if i == col:
            return f
    return 0


def test_check_arithmetization():
    # the 8x8 sparse fixture from the reference test
    a = [
        [(one, 1), (one, 2)],
        [(one, 3)],
        [(one, 3)],
        [(one, 0), (one, 1), (one, 5)],
        [(one, 1), (one, 2), (one, 6)],
        [(one, 2), (one, 5), (one, 7)],
        [(one, 3), (one, 4), (one, 6)],
        [(one, 0), (one, 6), (one, 7)],
    ]
    b = [
        [],
        [(one, 1)],
        [(one, 0)],
        [(one, 2)],
        [(one, 3)],
        [(one, 4)],
        [(one, 5)],
        [(one, 6)],
    ]
    c = [
        [],
        [(one, 7)],
        [],
        [],
        [],
        [(one, 3)],
        [],
        [],
    ]
    joint = sum_matrices(a, b, c)
    nnz = num_non_zero(joint)
    domain_k = Radix2Domain.new(nnz)
    domain_h = Radix2Domain.new(8)
    domain_x = Radix2Domain.new(2)

    arith = arithmetize_matrix(joint, a, b, c, domain_k, domain_h, domain_x)

    elements = domain_h.elements()
    inverse_map = {e: i for i, e in enumerate(elements)}
    reindexed_inverse_map = {
        elements[domain_h.reindex_by_subdomain(domain_x, i)]: i for i in range(8)
    }
    # u_H(h, h) over H
    eq_poly_vals = {h: domain_h.eval_unnormalized_bivariate_lagrange_poly(h, h) for h in elements}

    rng = random.Random(0)
    eta_a, eta_b, eta_c = (rng.randrange(R) for _ in range(3))

    row_on_k = fr.to_ints(arith.evals_on_K.row)
    col_on_k = fr.to_ints(arith.evals_on_K.col)
    val_a_on_k = fr.to_ints(arith.evals_on_K.val_a)
    val_b_on_k = fr.to_ints(arith.evals_on_K.val_b)
    val_c_on_k = fr.to_ints(arith.evals_on_K.val_c)
    row_col_on_k = fr.to_ints(arith.evals_on_K.row_col)

    # evals_on_K must agree with evaluating the interpolated polynomials
    for k_index, k_elem in enumerate(domain_k.elements()):
        kd = fr.from_int(k_elem)
        assert fr.to_int(poly.evaluate(arith.row, kd)) == row_on_k[k_index]
        assert fr.to_int(poly.evaluate(arith.col, kd)) == col_on_k[k_index]
        assert fr.to_int(poly.evaluate(arith.val_a, kd)) == val_a_on_k[k_index]
        assert row_col_on_k[k_index] == row_on_k[k_index] * col_on_k[k_index] % R

        if k_index < nnz:
            # transpose land: row poly holds the (reindexed) column element
            col_idx = reindexed_inverse_map[row_on_k[k_index]]
            row_idx = inverse_map[col_on_k[k_index]]
            assert col_idx in joint[row_idx]
            inverse = pow(eq_poly_vals[row_on_k[k_index]], -1, R)
            lhs = (
                eta_a * val_a_on_k[k_index]
                + eta_b * val_b_on_k[k_index]
                + eta_c * val_c_on_k[k_index]
            ) % R
            rhs = (
                inverse
                * (
                    eta_a * _entry(a, row_idx, col_idx)
                    + eta_b * _entry(b, row_idx, col_idx)
                    + eta_c * _entry(c, row_idx, col_idx)
                )
            ) % R
            assert lhs == rhs


def test_bivariate_batch_evals():
    """Batch u_H evaluators vs naive (reference src/ahp/mod.rs:340-366)."""
    from marlin_tpu.snark.prover import _batch_eval_bivariate_diff

    rng = random.Random(1)
    for log in [1, 3, 5]:
        dom = Radix2Domain(1 << log)
        x = rng.randrange(R)
        got = fr.to_ints(_batch_eval_bivariate_diff(dom, x))
        exp = [dom.eval_unnormalized_bivariate_lagrange_poly(x, y) for y in dom.elements()]
        assert got == exp

    # same-inputs diagonal: u_H(h,h) = |H| * h^(|H|-1)
    dom = Radix2Domain(16)
    elems = dom.elements()
    fast = [e * 16 % R for e in elems]
    fast = [fast[0]] + fast[1:][::-1]  # elems * n then reverse tail
    manual = [dom.eval_unnormalized_bivariate_lagrange_poly(e, e) for e in elems]
    assert fast == manual


def test_scatter_survives_single_segment_flood():
    """Overflow regression: 2^18 contributions landing in ONE segment.

    A variable used by every constraint scatters one column index nnz
    times (DummyCircuit's output wire does exactly this), which overflowed
    the uint32 segment accumulation once |H| crossed 2^16 and silently
    corrupted 2^18 proofs; the byte-plane split in ops/sparse.py is the
    fix.  (Reference never hits this: rayon accumulates in full field
    elements — src/ahp/prover.rs:411-428.)
    """
    import random

    import jax.numpy as jnp

    from marlin_tpu.ops import fr, sparse

    rng = random.Random(99)
    n = 1 << 18
    vals_int = [rng.randrange(R) for _ in range(n)]
    got = fr.to_ints(
        sparse.scatter_add_mod(fr.from_ints(vals_int), jnp.zeros((n,), jnp.int32), 2)
    )[0]
    assert got == sum(vals_int) % R
