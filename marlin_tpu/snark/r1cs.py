"""R1CS constraint-system builder with ark-relations semantics.

Host-side circuit synthesis (the reference also synthesizes on the CPU —
`generate_constraints` at src/ahp/indexer.rs:158 / src/ahp/prover.rs:223);
the output is static COO sparse matrices plus assignment vectors that the
device AHP kernels consume.

Reproduced surface (SURVEY.md §2b row 5):
  * instance/witness variables with the implicit leading One
    (instance_assignment[0] = 1),
  * symbolic linear combinations (`new_lc`) and `enforce_constraint`,
  * `SynthesisMode::{Setup, Prove}`,
  * `finalize()` with inlining (Constraints goal) and outlining (Weight
    goal — the mode Marlin uses, src/ahp/indexer.rs:156),
  * `to_matrices()` -> sparse rows of (coeff, col) sorted by column.

Outlining semantics: symbolic LCs are outlined into a fresh witness w plus a
constraint `lc * 1 = w` when reused (>=2 references) or when a multi-term LC
feeds another LC (the chain shape ark-relations' OutlineTestCircuit —
reference src/test.rs:53-114 — is designed to trigger).  The exact
heuristic threshold is framework-defined; both indexer and prover run the
same deterministic pass, which is the invariant Marlin needs
(num_constraints / num_non_zero must agree between index and prove).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from ..fields import active as P

R = P.R_MODULUS

# Variable encoding: (kind, index).  Kind order defines term sort order,
# matching ark-relations' `Variable` Ord (One < Instance < Witness < SymbolicLc).
ONE = 0
INSTANCE = 1
WITNESS = 2
SYMBOLIC = 3

Variable = tuple[int, int]
VAR_ONE: Variable = (ONE, 0)


def lc(*terms) -> list:
    """Build a linear combination: lc((coeff, var), var2, ...).

    Bare variables get coefficient 1 (like the reference's `lc!() + a`).
    """
    out = []
    for t in terms:
        if isinstance(t, tuple) and len(t) == 2 and isinstance(t[0], int) and isinstance(t[1], tuple):
            out.append((t[0] % R, t[1]))
        else:
            out.append((1, t))
    return _merge(out)


def _merge(terms: list) -> list:
    """Sort by variable and merge duplicates (LinearCombination semantics)."""
    terms = sorted(terms, key=lambda t: t[1])
    out = []
    for c, v in terms:
        if out and out[-1][1] == v:
            out[-1] = ((out[-1][0] + c) % R, v)
        else:
            out.append((c % R, v))
    return [(c, v) for c, v in out if c != 0]


def lc_add(a: list, b: list) -> list:
    return _merge(list(a) + list(b))


def lc_scale(a: list, s: int) -> list:
    s %= R
    return [(c * s % R, v) for c, v in a if c * s % R != 0]


class SynthesisMode(Enum):
    SETUP = "setup"
    PROVE = "prove"


class OptimizationGoal(Enum):
    CONSTRAINTS = "constraints"  # inline all LCs
    WEIGHT = "weight"  # outline reused LCs (Marlin's choice)


@dataclass
class ConstraintSystem:
    mode: SynthesisMode = SynthesisMode.PROVE
    optimization_goal: OptimizationGoal = OptimizationGoal.WEIGHT

    num_instance_variables: int = 1
    num_witness_variables: int = 0
    instance_assignment: list = field(default_factory=lambda: [1])
    witness_assignment: list = field(default_factory=list)

    # lc_map[i] = term list; rows reference LCs by index
    lc_map: list = field(default_factory=list)
    a_rows: list = field(default_factory=list)
    b_rows: list = field(default_factory=list)
    c_rows: list = field(default_factory=list)

    finalized: bool = False

    # ---- variable allocation -------------------------------------------------

    @property
    def num_constraints(self) -> int:
        return len(self.a_rows)

    @property
    def is_setup(self) -> bool:
        return self.mode == SynthesisMode.SETUP

    def new_input_variable(self, value_fn=None) -> Variable:
        idx = self.num_instance_variables
        self.num_instance_variables += 1
        if not self.is_setup:
            assert value_fn is not None, "prove mode needs assignments"
            self.instance_assignment.append(int(value_fn()) % R)
        return (INSTANCE, idx)

    def new_witness_variable(self, value_fn=None) -> Variable:
        idx = self.num_witness_variables
        self.num_witness_variables += 1
        if not self.is_setup:
            assert value_fn is not None, "prove mode needs assignments"
            self.witness_assignment.append(int(value_fn()) % R)
        return (WITNESS, idx)

    def new_lc(self, terms: list) -> Variable:
        self.lc_map.append(list(terms))
        return (SYMBOLIC, len(self.lc_map) - 1)

    def enforce_constraint(self, a: list, b: list, c: list) -> None:
        ai = self.new_lc(a)[1]
        bi = self.new_lc(b)[1]
        ci = self.new_lc(c)[1]
        self.a_rows.append(ai)
        self.b_rows.append(bi)
        self.c_rows.append(ci)

    # ---- finalize ------------------------------------------------------------

    def _eval_lc_terms(self, terms: list) -> int:
        acc = 0
        for coeff, (kind, idx) in terms:
            if kind == ONE:
                val = 1
            elif kind == INSTANCE:
                val = self.instance_assignment[idx]
            elif kind == WITNESS:
                val = self.witness_assignment[idx]
            else:
                raise ValueError("unexpanded symbolic LC in evaluation")
            acc = (acc + coeff * val) % R
        return acc

    def finalize(self) -> None:
        """Expand symbolic LC references (inlining or Weight-goal outlining)."""
        if self.finalized:
            return
        self.finalized = True
        outline = self.optimization_goal == OptimizationGoal.WEIGHT

        # usage count of each symbolic LC: references from constraint rows
        # and from other LCs' terms
        uses = [0] * len(self.lc_map)
        for rows in (self.a_rows, self.b_rows, self.c_rows):
            for i in rows:
                uses[i] += 1
        referenced_by_lc = [False] * len(self.lc_map)
        for terms in self.lc_map:
            for _, (kind, idx) in terms:
                if kind == SYMBOLIC:
                    uses[idx] += 1
                    referenced_by_lc[idx] = True

        expanded: list = [None] * len(self.lc_map)
        extra_constraints: list = []  # (expanded_lc_terms, witness_var)
        for i, terms in enumerate(self.lc_map):
            flat: list = []
            for coeff, var in terms:
                kind, idx = var
                if kind == SYMBOLIC:
                    flat.extend((coeff * c2 % R, v2) for c2, v2 in expanded[idx])
                else:
                    flat.append((coeff, var))
            flat = _merge(flat)
            should_outline = outline and (
                uses[i] >= 2 or (referenced_by_lc[i] and len(flat) >= 3)
            )
            if should_outline:
                idx_w = self.num_witness_variables
                self.num_witness_variables += 1
                if not self.is_setup:
                    self.witness_assignment.append(self._eval_lc_terms(flat))
                w_var = (WITNESS, idx_w)
                extra_constraints.append((flat, w_var))
                expanded[i] = [(1, w_var)]
            else:
                expanded[i] = flat

        self.lc_map = expanded
        # append outlining constraints: lc * 1 = w
        for flat, w_var in extra_constraints:
            self.lc_map.append(flat)
            ai = len(self.lc_map) - 1
            self.lc_map.append([(1, VAR_ONE)])
            bi = len(self.lc_map) - 1
            self.lc_map.append([(1, w_var)])
            ci = len(self.lc_map) - 1
            self.a_rows.append(ai)
            self.b_rows.append(bi)
            self.c_rows.append(ci)

    # ---- matrices ------------------------------------------------------------

    def _col(self, var: Variable) -> int:
        kind, idx = var
        if kind == ONE:
            return 0
        if kind == INSTANCE:
            return idx
        if kind == WITNESS:
            return self.num_instance_variables + idx
        raise ValueError("symbolic variable after finalize")

    def _make_row(self, lc_index: int) -> list:
        row = [(c, self._col(v)) for c, v in self.lc_map[lc_index]]
        return sorted(row, key=lambda t: t[1])

    def to_matrices(self):
        """-> (a, b, c) with rows of (coeff, col), cols ascending."""
        assert self.finalized, "call finalize() first"
        a = [self._make_row(i) for i in self.a_rows]
        b = [self._make_row(i) for i in self.b_rows]
        c = [self._make_row(i) for i in self.c_rows]
        return a, b, c

    def full_assignment(self) -> list:
        return list(self.instance_assignment) + list(self.witness_assignment)

    def is_satisfied(self) -> bool:
        """Debug check: Az ∘ Bz == Cz."""
        a, b, c = self.to_matrices()
        z = self.full_assignment()

        def dot(row):
            return sum(coeff * z[col] for coeff, col in row) % R

        return all(dot(ra) * dot(rb) % R == dot(rc) for ra, rb, rc in zip(a, b, c))
