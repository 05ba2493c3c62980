"""BLS12-377 constants re-derived from the family parameter x.

Every value in marlin_tpu/fields/bls12_377.py must follow from
x = 0x8508C00000000001 via the BLS12 family polynomials and numerical
search; this suite redoes the derivation so no constant is trusted:

* r = x^4 - x^2 + 1 and q = (x-1)^2 r/3 + x, both prime, with the
  published 2-adicities (47 / 46),
* full factorization of r - 1 = x^2 (x-1)(x+1) anchoring FR_GENERATOR,
* -5 is the least quadratic non-residue (so Fq2 = Fq[u]/(u^2+5)),
* the G1 generator is on-curve with order r (cofactor (x-1)^2/3),
* the configured twist is the sextic twist whose order
  q^2 + 1 - (t_2 - 3 f_2)/2 is divisible by r; G2 is on it with order r,
* the generic ate pairing is bilinear and non-degenerate.
"""

import math
import random

import pytest

from marlin_tpu.fields import bls12_377 as B
from marlin_tpu.fields.curve_generic import GenericCurve
from marlin_tpu.fields.pairing_generic import GenericPairing

X = B.BLS_X


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
    rng = random.Random(0x377)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        t = pow(a, d, n)
        if t in (1, n - 1):
            continue
        for _ in range(s - 1):
            t = t * t % n
            if t == n - 1:
                break
        else:
            return False
    return True


def test_family_polynomials_and_primality():
    r = X**4 - X**2 + 1
    assert B.R_MODULUS == r
    assert B.Q_MODULUS == ((X - 1) ** 2 * r) // 3 + X
    assert _is_prime(B.Q_MODULUS) and _is_prime(B.R_MODULUS)
    assert B.TRACE == X + 1
    # #E(Fq) = q - x = cofactor * r
    assert B.Q_MODULUS - X == ((X - 1) ** 2 // 3) * r


def test_two_adicity_and_generator():
    r = B.R_MODULUS
    # r - 1 = x^2 (x-1)(x+1); factors of the 64-bit pieces
    fx1 = {2: 46, 3: 1, 7: 1, 13: 1, 499: 1}
    fx2 = {2: 1, 5: 1, 958612291309063373: 1}
    prod = X**2
    for f in (fx1, fx2):
        for p, e in f.items():
            assert _is_prime(p)
            prod *= p**e
    assert _is_prime(X)  # x itself is prime
    assert prod == r - 1
    adic = 0
    m = r - 1
    while m % 2 == 0:
        m //= 2
        adic += 1
    assert adic == B.FR_TWO_ADICITY == 47
    for p in set(fx1) | set(fx2) | {X}:
        assert pow(B.FR_GENERATOR, (r - 1) // p, r) != 1
    w = B.FR_TWO_ADIC_ROOT_OF_UNITY
    assert pow(w, 1 << 47, r) == 1 and pow(w, 1 << 46, r) != 1


def test_fq2_nonresidue_minimal():
    q = B.Q_MODULUS
    leg = lambda a: pow(a % q, (q - 1) // 2, q)
    # -1..-4 are all residues; -5 is not
    for a in (-1, -2, -3, -4):
        assert leg(a) == 1, a
    assert leg(-5) != 1
    assert B.FQ2_NONRESIDUE == -5


def test_g1_generator():
    cur = GenericCurve(B)
    g = cur.g1_gen
    assert cur.g1_is_on_curve(g)
    assert cur.g1_mul(g, B.R_MODULUS) is None


def test_twist_order_and_g2():
    q, t = B.Q_MODULUS, B.TRACE
    q2 = q * q
    t2 = t * t - 2 * q
    f2 = math.isqrt((4 * q2 - t2 * t2) // 3)
    assert 3 * f2 * f2 == 4 * q2 - t2 * t2
    n_twist = q2 + 1 - (t2 - 3 * f2) // 2
    assert n_twist % B.R_MODULUS == 0
    cur = GenericCurve(B)
    g2 = cur.g2_gen
    assert cur.g2_is_on_curve(g2)
    assert cur.g2_mul(g2, B.R_MODULUS) is None
    # b_twist = b / xi (D twist)
    tw = cur.tw
    assert tw.fq2_mul(B.CURVE_B_TWIST, B.FQ6_NONRESIDUE) == (B.CURVE_B % q, 0)


@pytest.mark.slow
def test_pairing_bilinear():
    cur = GenericCurve(B)
    e = GenericPairing(B)
    base = e.pairing(cur.g1_gen, cur.g2_gen)
    assert base != e.tw.ONE
    lhs = e.pairing(cur.g1_mul(cur.g1_gen, 29), cur.g2_mul(cur.g2_gen, 31))
    assert e.tw.pow(base, 29 * 31) == lhs
    assert e.tw.pow(base, B.R_MODULUS) == e.tw.ONE
