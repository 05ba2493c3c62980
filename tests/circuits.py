"""Test circuits mirroring the reference's fixtures.

`Circuit` is src/test.rs:8-50 (a*b=c, c*b=d chains); `OutlineTestCircuit` is
src/test.rs:52-114 (range check via bucket LCs, exercising Weight-goal
outlining); `DummyCircuit` is benches/bench.rs:25-67.
"""

from marlin_tpu.fields import active as P
from marlin_tpu.snark.r1cs import VAR_ONE, lc

R = P.R_MODULUS


class Circuit:
    def __init__(self, a, b, num_constraints, num_variables):
        self.a, self.b = a, b
        self.num_constraints = num_constraints
        self.num_variables = num_variables

    def generate_constraints(self, cs):
        a = cs.new_witness_variable(lambda: self.a)
        b = cs.new_witness_variable(lambda: self.b)
        c = cs.new_input_variable(lambda: self.a * self.b % R)
        d = cs.new_input_variable(lambda: self.a * self.b % R * self.b % R)
        for _ in range(self.num_variables - 3):
            cs.new_witness_variable(lambda: self.a)
        for _ in range(self.num_constraints - 1):
            cs.enforce_constraint(lc(a), lc(b), lc(c))
        cs.enforce_constraint(lc(c), lc(b), lc(d))


class OutlineTestCircuit:
    def generate_constraints(self, cs):
        inputs = [cs.new_input_variable(lambda i=i: i) for i in range(5)]
        for i in range(5):
            total_count = cs.new_lc(lc())
            for bucket in range(10):
                inc = cs.new_witness_variable(lambda i=i, b=bucket: int(i == b))
                total_count = cs.new_lc(lc((1, total_count), (1, inc)))
                cs.enforce_constraint(
                    lc((1, inputs[i]), ((-bucket) % R, VAR_ONE)),
                    lc((1, inc)),
                    lc(),
                )
            cs.enforce_constraint(
                lc(), lc(), lc((1, total_count), ((-1) % R, VAR_ONE))
            )


class DummyCircuit:
    def __init__(self, a, b, num_variables, num_constraints):
        self.a, self.b = a, b
        self.num_variables = num_variables
        self.num_constraints = num_constraints

    def generate_constraints(self, cs):
        a = cs.new_witness_variable(lambda: self.a)
        b = cs.new_witness_variable(lambda: self.b)
        c = cs.new_input_variable(lambda: self.a * self.b % R)
        for _ in range(self.num_variables - 3):
            cs.new_witness_variable(lambda: self.a)
        for _ in range(self.num_constraints - 1):
            cs.enforce_constraint(lc(a), lc(b), lc(c))
        cs.enforce_constraint(lc(), lc(), lc())
