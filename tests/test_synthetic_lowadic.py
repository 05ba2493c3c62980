"""Synthetic low-2-adicity curve constants re-derived from x.

Every value in marlin_tpu/fields/synthetic_lowadic.py must follow from
x = 0xD20100001F68B001 via the BLS12 family polynomials and numerical
search (the same derivation discipline as tests/test_bls12_377.py):

* r = x^4 - x^2 + 1 and q = (x-1)^2 r/3 + x, both prime, with the
  DEFINING low adicities v2(r-1) = 13 and v3(r-1) = 3 (the MNT-753
  capability analog: any domain > 2^13 must take the mixed-radix path;
  reference benches/bench.rs:5-11),
* full factorization of r - 1 = x^2 (x-1)(x+1) anchoring FR_GENERATOR,
* -5 is the least quadratic non-residue (q ≡ 1 mod 4 so -1 is a square),
* the G1 generator is on-curve with order r (cofactor (x-1)^2/3),
* the configured twist is the M-type sextic twist whose order
  q^2 + 1 - (t_2 - 3 f_2)/2 is divisible by r; G2 is on it with order r,
* the generic ate pairing is bilinear and non-degenerate.
"""

import math
import random

import pytest

from marlin_tpu.fields import synthetic_lowadic as B
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
    rng = random.Random(0x10AD1C)
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
    assert B.Q_MODULUS - X == ((X - 1) ** 2 // 3) * r
    assert B.R_MODULUS.bit_length() == B.FR_BITS == 255
    assert B.Q_MODULUS.bit_length() == B.FQ_BITS == 381


def test_low_adicities_and_generator():
    r = B.R_MODULUS
    # r - 1 = x^2 (x-1)(x+1); full factorizations of the 64-bit pieces
    fx = {7: 1, 19: 1, 337: 1, 6491: 1, 52013248583: 1}
    fx1 = {2: 12, 3: 3, 23: 1, 547: 1, 9871: 1, 1101811: 1}
    fx2 = {2: 1, 31: 1, 244070584249492447: 1}
    prod = 1
    for f, mult in ((fx, 2), (fx1, 1), (fx2, 1)):
        for p, e in f.items():
            assert _is_prime(p)
            prod *= p ** (e * mult)
    assert prod == r - 1
    # the DEFINING property: v2 = 12 + 1 = 13, v3 = 3 (from x ≡ 1 mod 27)
    for base, adic in ((2, 13), (3, 3)):
        k, m = 0, r - 1
        while m % base == 0:
            m //= base
            k += 1
        assert k == adic
    assert B.FR_TWO_ADICITY == 13
    assert B.FR_SMALL_SUBGROUP_BASE == 3 and B.FR_SMALL_SUBGROUP_ADICITY == 3
    for p in set(fx) | set(fx1) | set(fx2):
        assert pow(B.FR_GENERATOR, (r - 1) // p, r) != 1
    w = B.FR_TWO_ADIC_ROOT_OF_UNITY
    assert pow(w, 1 << 13, r) == 1 and pow(w, 1 << 12, r) != 1
    wl = B.FR_LARGE_SUBGROUP_ROOT_OF_UNITY
    full = (1 << 13) * 27
    assert pow(wl, full, r) == 1
    assert pow(wl, full // 2, r) != 1 and pow(wl, full // 3, r) != 1


def test_fq2_nonresidue_minimal():
    q = B.Q_MODULUS
    assert q % 4 == 1  # x ≡ 1 mod 4096 forces this; -1 is a square
    leg = lambda a: pow(a % q, (q - 1) // 2, q)
    for a in (-1, -2, -3, -4):
        assert leg(a) == 1, a
    assert leg(-5) == q - 1
    assert B.FQ2_NONRESIDUE == -5


def test_montgomery_constants():
    for mod, R_, r2, inv, width in (
        (B.R_MODULUS, B.FR_MONT_R, B.FR_MONT_R2, B.FR_MONT_INV, 256),
        (B.Q_MODULUS, B.FQ_MONT_R, B.FQ_MONT_R2, B.FQ_MONT_INV, 384),
    ):
        assert R_ == (1 << width) % mod
        assert r2 == R_ * R_ % mod
        assert inv * (-mod) % (1 << width) == 1


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
    # b_twist = b * xi (M twist)
    tw = cur.tw
    assert B.TWIST_TYPE == "M"
    assert tuple(B.CURVE_B_TWIST) == tw.fq2_mul((B.CURVE_B % q, 0), B.FQ6_NONRESIDUE)


@pytest.mark.slow
def test_pairing_bilinear():
    cur = GenericCurve(B)
    e = GenericPairing(B)
    base = e.pairing(cur.g1_gen, cur.g2_gen)
    assert base != e.tw.ONE
    lhs = e.pairing(cur.g1_mul(cur.g1_gen, 29), cur.g2_mul(cur.g2_gen, 31))
    assert e.tw.pow(base, 29 * 31) == lhs
    assert e.tw.pow(base, B.R_MODULUS) == e.tw.ONE
