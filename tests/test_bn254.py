"""BN254 parameter verification from first principles + generic pairing tests.

The BN254 constants (marlin_tpu/fields/bn254.py) are the framework's second
curve config (reference pattern: curve-config crates, Cargo.toml:37-41).
Nothing in that file is trusted: this suite re-derives

* primality of q and r (Miller-Rabin, fixed-seed witnesses),
* the BN polynomial identities binding q, r, and the trace to the single
  generator parameter x (so a typo in any constant is structurally
  impossible to miss),
* the full factorization of r - 1 (anchors FR_GENERATOR, the 2-adicity,
  and the 3^2 small subgroup used by mixed-radix domains),
* generator/subgroup facts for G1 and G2,
* bilinearity + non-degeneracy of the generic ate pairing
  (marlin_tpu/fields/pairing_generic.py).
"""

import random

import pytest

from marlin_tpu.fields import bn254 as B
from marlin_tpu.fields.curve_generic import GenericCurve
from marlin_tpu.fields.pairing_generic import GenericPairing

R_MINUS_1_FACTORS = {
    2: 28,
    3: 2,
    13: 1,
    29: 1,
    983: 1,
    11003: 1,
    237073: 1,
    405928799: 1,
    1670836401704629: 1,
    13818364434197438864469338081: 1,
}


def _is_prime(n: int, rounds: int = 40) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rng = random.Random(0xB254)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def test_bn_polynomial_identities():
    x = B.BN_X
    assert B.Q_MODULUS == 36 * x**4 + 36 * x**3 + 24 * x**2 + 6 * x + 1
    assert B.R_MODULUS == 36 * x**4 + 36 * x**3 + 18 * x**2 + 6 * x + 1
    assert B.TRACE == 6 * x**2 + 1
    # #E(Fq) = q + 1 - t = r  (prime-order G1, cofactor 1)
    assert B.R_MODULUS == B.Q_MODULUS + 1 - B.TRACE


def test_moduli_prime():
    assert _is_prime(B.Q_MODULUS)
    assert _is_prime(B.R_MODULUS)


def test_r_minus_1_factorization():
    prod = 1
    for p, e in R_MINUS_1_FACTORS.items():
        assert _is_prime(p), p
        prod *= p**e
    assert prod == B.R_MODULUS - 1
    assert R_MINUS_1_FACTORS[2] == B.FR_TWO_ADICITY
    assert R_MINUS_1_FACTORS[B.FR_SMALL_SUBGROUP_BASE] == B.FR_SMALL_SUBGROUP_ADICITY


def test_fr_generator_is_primitive():
    r = B.R_MODULUS
    for p in R_MINUS_1_FACTORS:
        assert pow(B.FR_GENERATOR, (r - 1) // p, r) != 1, p


def test_roots_of_unity():
    r = B.R_MODULUS
    w = B.FR_TWO_ADIC_ROOT_OF_UNITY
    assert pow(w, 1 << B.FR_TWO_ADICITY, r) == 1
    assert pow(w, 1 << (B.FR_TWO_ADICITY - 1), r) != 1
    g = B.FR_LARGE_SUBGROUP_ROOT_OF_UNITY
    order = (1 << B.FR_TWO_ADICITY) * B.FR_SMALL_SUBGROUP_BASE**B.FR_SMALL_SUBGROUP_ADICITY
    assert pow(g, order, r) == 1
    assert pow(g, order // 2, r) != 1
    assert pow(g, order // 3, r) != 1


def test_g1_generator_and_order():
    cur = GenericCurve(B)
    g = cur.g1_gen
    assert cur.g1_is_on_curve(g)
    assert cur.g1_mul(g, B.R_MODULUS) is None
    assert cur.g1_mul(g, 2) == cur.g1_add(g, g)


def test_g2_generator_and_order():
    cur = GenericCurve(B)
    g = cur.g2_gen
    assert cur.g2_is_on_curve(g)
    assert cur.g2_mul(g, B.R_MODULUS) is None


@pytest.mark.slow
def test_pairing_bilinear_nondegenerate():
    cur = GenericCurve(B)
    e = GenericPairing(B)
    P, Q = cur.g1_gen, cur.g2_gen
    a, b = 22, 37
    lhs = e.pairing(cur.g1_mul(P, a), cur.g2_mul(Q, b))
    base = e.pairing(P, Q)
    assert base != e.tw.ONE
    assert pow_check(e, base, a * b) == lhs
    # e(P, Q)^r = 1: image has order dividing r
    assert pow_check(e, base, B.R_MODULUS) == e.tw.ONE


def pow_check(e, f, n):
    return e.tw.pow(f, n)
