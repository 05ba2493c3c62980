"""End-to-end integration tests (reference src/test.rs:116-230).

The five matrix-shape tests sweep the padding paths (tall/squat/square);
each runs index -> prove -> verify with fresh witnesses plus the negative
check that a wrong public input rejects.  Every shape soaks 10 fresh-witness
iterations with the debug zero-LC/degree asserts armed (the reference runs
100 per shape, src/test.rs:137; 10 covers the randomized paths — rejection
sampling, bucket-layout skew, spill/doubling-flag fallbacks — at suite-budget
cost).  MARLIN_TPU_SOAK_ITERS=n scales every shape higher on demand.
"""

import os

import pytest
from circuits import Circuit, OutlineTestCircuit

from marlin_tpu import Marlin
from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.utils.rand import ZkRng, test_rng

R = P.R_MODULUS


@pytest.fixture(scope="module")
def srs():
    return Marlin.universal_setup(100, 25, 300, test_rng())


def _test_circuit(srs, num_constraints, num_variables, iterations=1, debug=False):
    iterations = max(iterations, int(os.environ.get("MARLIN_TPU_SOAK_ITERS", "0")))
    rng = test_rng()
    prev = os.environ.get("MARLIN_TPU_DEBUG_CHECKS")
    if debug:
        os.environ["MARLIN_TPU_DEBUG_CHECKS"] = "1"
    try:
        _run_circuit_iters(srs, num_constraints, num_variables, iterations, rng)
    finally:
        if debug:
            if prev is None:
                os.environ.pop("MARLIN_TPU_DEBUG_CHECKS", None)
            else:
                os.environ["MARLIN_TPU_DEBUG_CHECKS"] = prev


def _run_circuit_iters(srs, num_constraints, num_variables, iterations, rng):
    for it in range(iterations):
        a = rng.rand_fr()
        b = rng.rand_fr()
        c = a * b % R
        d = c * b % R
        circ = Circuit(a, b, num_constraints, num_variables)
        pk, vk = Marlin.index(srs, circ)
        proof = Marlin.prove(pk, circ, rng)
        assert Marlin.verify(vk, [c, d], proof, rng)
        assert not Marlin.verify(vk, [a, a], proof, rng)


@pytest.mark.slow
def test_tall_matrix_big(srs):
    _test_circuit(srs, 100, 25, iterations=10, debug=True)


@pytest.mark.slow
def test_tall_matrix_small(srs):
    _test_circuit(srs, 26, 25, iterations=10, debug=True)


@pytest.mark.slow
def test_squat_matrix_big(srs):
    _test_circuit(srs, 25, 100, iterations=10, debug=True)


@pytest.mark.slow
def test_squat_matrix_small(srs):
    _test_circuit(srs, 25, 26, iterations=10, debug=True)


@pytest.mark.slow
def test_square_matrix(srs):
    _test_circuit(srs, 25, 25, iterations=10, debug=True)


@pytest.mark.slow
def test_outlining():
    """OutlineTestCircuit exercises Weight-goal LC outlining
    (reference src/test.rs:206-229)."""
    rng = test_rng()
    srs = Marlin.universal_setup(150, 150, 150, rng)
    circ = OutlineTestCircuit()
    pk, vk = Marlin.index(srs, circ)
    proof = Marlin.prove(pk, circ, rng)
    assert Marlin.verify(vk, list(range(5)), proof, rng)


@pytest.mark.slow
def test_proof_size(srs):
    rng = test_rng()
    a, b = 3, 5
    circ = Circuit(a, b, 100, 25)
    pk, vk = Marlin.index(srs, circ)
    proof = Marlin.prove(pk, circ, rng)
    stats = proof.print_size_info()
    # 13 commitments: 11 unbounded + 2 degree-bounded (g_1, g_2)
    assert stats["num_comms_without_degree_bounds"] == 7
    assert stats["num_comms_with_degree_bounds"] == 2
    assert stats["num_evaluations"] == 4
    assert stats["num_opening_proofs"] == 2
    # same ballpark as the reference's 880-byte MarlinKZG10 proofs
    assert stats["argument_size_bytes"] < 1200


@pytest.mark.slow
def test_square_matrix_soak(srs, monkeypatch):
    """Default-on randomness soak (reference src/test.rs:132-163 runs every
    shape 100x with fresh witnesses): 10 fresh-witness iterations of the
    square shape with the debug zero-LC/degree asserts armed — covering
    rejection sampling, bucket-layout skew, and spill-fallback paths that
    the cached-kernel argument does not.  MARLIN_TPU_SOAK_ITERS still
    scales every shape test higher on demand."""
    monkeypatch.setenv("MARLIN_TPU_DEBUG_CHECKS", "1")
    _test_circuit(srs, 25, 25, iterations=10)
