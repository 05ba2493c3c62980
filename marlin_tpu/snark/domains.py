"""Radix-2 multiplicative evaluation domains over Fr.

Host-side mirror of `ark-poly`'s `GeneralEvaluationDomain` (radix-2 branch)
— the slice the reference pins (SURVEY.md §1 row 7): size computation,
generator powers, vanishing-polynomial evaluation, and the protocol-critical
`reindex_by_subdomain` interleaving (reference src/ahp/prover.rs:329-348,
src/ahp/constraint_systems.rs:180).

The heavy per-element work (NTT, batched Lagrange/bivariate evals) lives on
device in ops/ntt.py and ops/domain_kernels.py; this class only holds the
scalar metadata those kernels are parameterized by.

The MixedRadix fallback for low-2-adicity fields (MNT4/6-753) is not
implemented; BLS12-381's Fr (2-adicity 32) covers every power-of-2 domain
the protocol can request.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

from ..fields import active as P

R = P.R_MODULUS


def compute_size_of_domain(num_coeffs: int) -> int | None:
    """Next power of two, if representable in the 2-adic subgroup.

    Mirrors GeneralEvaluationDomain::compute_size_of_domain
    (used at reference src/ahp/mod.rs:79-82,100-101).
    """
    size = max(1, num_coeffs)
    size = 1 << (size - 1).bit_length()
    if size.bit_length() - 1 > P.FR_TWO_ADICITY:
        return None
    return size


@dataclass(frozen=True)
class Radix2Domain:
    """Multiplicative subgroup of Fr of power-of-two order."""

    size: int

    @staticmethod
    def new(num_coeffs: int) -> "Radix2Domain":
        size = compute_size_of_domain(num_coeffs)
        if size is None:
            raise ValueError(f"domain of size {num_coeffs} not constructible")
        return Radix2Domain(size)

    @property
    def log_size(self) -> int:
        return self.size.bit_length() - 1

    @functools.cached_property
    def group_gen(self) -> int:
        # TWO_ADIC_ROOT ^ (2^(adicity - log_size)); same element arkworks uses.
        return pow(P.FR_TWO_ADIC_ROOT_OF_UNITY, 1 << (P.FR_TWO_ADICITY - self.log_size), R)

    @functools.cached_property
    def group_gen_inv(self) -> int:
        return pow(self.group_gen, -1, R)

    @functools.cached_property
    def size_inv(self) -> int:
        return pow(self.size, -1, R)

    def size_as_field_element(self) -> int:
        return self.size % R

    def element(self, i: int) -> int:
        return pow(self.group_gen, i, R)

    def elements(self) -> list[int]:
        out = [1]
        g = self.group_gen
        for _ in range(self.size - 1):
            out.append(out[-1] * g % R)
        return out

    def evaluate_vanishing_polynomial(self, x: int) -> int:
        """v_D(x) = x^|D| - 1."""
        return (pow(x, self.size, R) - 1) % R

    def eval_unnormalized_bivariate_lagrange_poly(self, x: int, y: int) -> int:
        """u_D(x, y) = (v_D(x) - v_D(y)) / (x - y); diagonal |D| * x^(|D|-1).

        Reference: src/ahp/mod.rs:302-309.
        """
        if x != y:
            num = (self.evaluate_vanishing_polynomial(x) - self.evaluate_vanishing_polynomial(y)) % R
            return num * pow((x - y) % R, -1, R) % R
        return self.size * pow(x, self.size - 1, R) % R

    def evaluate_all_lagrange_coefficients(self, tau: int) -> list[int]:
        """L_i(tau) for all i — used by the succinct verifier on domain X only
        (reference src/ahp/mod.rs:154-159), so a host loop is fine.
        """
        n = self.size
        v = self.evaluate_vanishing_polynomial(tau)
        if v == 0:
            # tau inside the domain: indicator vector
            out = [0] * n
            g = 1
            for i in range(n):
                if g == tau % R:
                    out[i] = 1
                g = g * self.group_gen % R
            return out
        # L_i(tau) = (g^i * v) / (n * (tau - g^i))
        out = []
        g_i = 1
        v_over_n = v * self.size_inv % R
        for _ in range(n):
            out.append(v_over_n * g_i % R * pow((tau - g_i) % R, -1, R) % R)
            g_i = g_i * self.group_gen % R
        return out

    def reindex_by_subdomain(self, other: "Radix2Domain", index: int) -> int:
        """Position of `other`'s element `index` inside `self`'s ordering.

        `other` (size m) embeds in `self` (size n) at stride n/m; remaining
        indices are renumbered around those slots.  This interleaving is
        protocol-critical for the w/x packing — reference
        src/ahp/prover.rs:340-348 and ark-poly's reindex_by_subdomain.
        """
        assert self.size >= other.size
        period = self.size // other.size
        if index < other.size:
            return index * period
        i = index - other.size
        return i + i // (period - 1) + 1

    def sample_element_outside_domain(self, rand_fr) -> int:
        """rand_fr: callable returning a random Fr int (the FS rng)."""
        t = rand_fr()
        while self.evaluate_vanishing_polynomial(t) == 0:
            t = rand_fr()
        return t
