"""Constraint-system builder tests (ark-relations semantics)."""

from circuits import Circuit, OutlineTestCircuit

from marlin_tpu.snark.constraint_systems import (
    make_matrices_square,
    pad_input_for_indexer_and_prover,
    sum_matrices,
)
from marlin_tpu.snark.r1cs import (
    ConstraintSystem,
    OptimizationGoal,
    SynthesisMode,
    lc,
)

import pytest

pytestmark = pytest.mark.smoke


def _build(circuit, mode=SynthesisMode.PROVE):
    cs = ConstraintSystem(mode=mode, optimization_goal=OptimizationGoal.WEIGHT)
    circuit.generate_constraints(cs)
    pad_input_for_indexer_and_prover(cs)
    cs.finalize()
    make_matrices_square(cs)
    return cs


def test_basic_circuit_satisfied():
    circ = Circuit(3, 5, num_constraints=10, num_variables=8)
    cs = _build(circ)
    assert cs.is_satisfied()
    assert cs.num_instance_variables + cs.num_witness_variables == cs.num_constraints
    # formatted input is a power of two
    n = cs.num_instance_variables
    assert n & (n - 1) == 0


def test_setup_and_prove_counts_agree():
    circ = Circuit(3, 5, num_constraints=10, num_variables=8)
    cs_p = _build(circ)
    cs_s = _build(circ, SynthesisMode.SETUP)
    assert cs_s.num_constraints == cs_p.num_constraints
    assert cs_s.num_instance_variables == cs_p.num_instance_variables
    assert cs_s.num_witness_variables == cs_p.num_witness_variables
    a1, b1, c1 = cs_s.to_matrices()
    a2, b2, c2 = cs_p.to_matrices()
    assert (a1, b1, c1) == (a2, b2, c2)


def test_outlining_satisfied():
    cs = _build(OutlineTestCircuit())
    assert cs.is_satisfied()
    # outlining introduced extra witnesses + constraints (the circuit has
    # reused multi-term LC chains)
    assert cs.num_witness_variables > 50


def test_matrix_shapes():
    # squat: more variables than constraints -> pad with 0*0=0 rows
    circ = Circuit(3, 5, num_constraints=5, num_variables=20)
    cs = _build(circ)
    assert cs.is_satisfied()
    # tall: more constraints than variables -> dummy witnesses
    circ = Circuit(3, 5, num_constraints=30, num_variables=5)
    cs = _build(circ)
    assert cs.is_satisfied()


def test_sum_matrices():
    a = [[(1, 0), (1, 2)], [(1, 1)]]
    b = [[(1, 2)], []]
    c = [[(1, 3)], [(1, 1)]]
    joint = sum_matrices(a, b, c)
    assert joint == [[0, 2, 3], [1]]
