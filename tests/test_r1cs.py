"""Constraint-system builder tests (ark-relations semantics)."""

from circuits import Circuit, OutlineTestCircuit

from marlin_tpu.snark.constraint_systems import (
    make_matrices_square,
    pad_input_for_indexer_and_prover,
    sum_matrices,
)
from marlin_tpu.fields import active as P
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


def test_outlining_golden_counts():
    """Golden counts under ark-relations 0.3's outline_lcs cost rule
    (t*l > t + 2 + l): each input's 10-step bucket chain in
    OutlineTestCircuit (reference src/test.rs:53-114) inlines to lengths
    1..10 and outlines exactly twice (at inlined length 5, resetting the
    chain), so 5 inputs add 10 outline witnesses and 10 equality
    constraints to the base 55 constraints / 50 witnesses."""
    cs = _build(OutlineTestCircuit())
    # pre-padding: 65 constraints (55 + 10 outlines), 60 witnesses (50 + 10),
    # 6 instance; _build then pads the input to 8 and squares 68x68
    assert cs.num_instance_variables == 8
    assert cs.num_witness_variables == 60
    assert cs.num_constraints == 68
    a, b, c = cs.to_matrices()
    assert sum(len(r) for m in (a, b, c) for r in m) == 230


def test_row_lcs_never_outline():
    """An LC used only as a constraint row has t = 1, and 1*l > 3 + l never
    holds — so plain enforce_constraint rows are untouched regardless of
    width (ark semantics: outlining only pays when an LC is reused)."""
    cs = ConstraintSystem(mode=SynthesisMode.PROVE, optimization_goal=OptimizationGoal.WEIGHT)
    xs = [cs.new_witness_variable(lambda: 2) for _ in range(8)]
    out = cs.new_input_variable(lambda: 32)
    one = cs.new_witness_variable(lambda: 1)
    cs.enforce_constraint(lc(*xs), lc(one), lc((2, out)))
    cs.finalize()
    assert cs.num_constraints == 1  # no outline constraint appended
    assert cs.num_witness_variables == 9
    a, _, _ = cs.to_matrices()
    assert len(a[0]) == 8  # the wide row stays inline


def test_outline_threshold_boundary():
    """t = 3 (two LC references + 1): outline iff 3l > l + 5, i.e. l >= 3."""

    def build(nterms):
        cs = ConstraintSystem(
            mode=SynthesisMode.PROVE, optimization_goal=OptimizationGoal.WEIGHT
        )
        xs = [cs.new_witness_variable(lambda: 1) for _ in range(nterms)]
        shared = cs.new_lc(lc(*xs))
        s_val = nterms
        y = cs.new_input_variable(lambda: s_val * s_val % P.R_MODULUS)
        # two uses of `shared` from other LCs
        cs.enforce_constraint(lc(shared), lc(shared), lc(y))
        cs.finalize()
        assert cs.is_satisfied()
        return cs

    cs2 = build(2)  # l = 2: 6 > 7 false -> inline
    assert cs2.num_constraints == 1
    cs3 = build(3)  # l = 3: 9 > 8 true -> outline
    assert cs3.num_constraints == 2
