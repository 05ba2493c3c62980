"""NTT / polynomial kernels vs. naive host evaluation.

Re-expresses the reference's domain unit tests (src/ahp/mod.rs:330-458):
interpolation roundtrips, the summation identity underlying the sumcheck,
and vanishing-polynomial division.
"""

import random

import jax.numpy as jnp

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.ops import fr, ntt, poly
from marlin_tpu.snark.domains import Radix2Domain

R = P.R_MODULUS
rng = random.Random(7)


def _rand(n):
    return [rng.randrange(R) for _ in range(n)]


def _host_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def test_ntt_matches_naive():
    for n in [1, 2, 4, 8, 32]:
        dom = Radix2Domain(n)
        coeffs = _rand(n)
        evals = fr.to_ints(ntt.ntt(fr.from_ints(coeffs), n))
        expected = [_host_eval(coeffs, e) for e in dom.elements()]
        assert evals == expected, f"n={n}"


def test_intt_roundtrip():
    for n in [4, 16, 64, 256]:
        coeffs = _rand(n)
        X = fr.from_ints(coeffs)
        back = fr.to_ints(ntt.intt(ntt.ntt(X, n)))
        assert back == coeffs, f"n={n}"


def test_ntt_zero_padding():
    # fft of a shorter poly onto a larger domain (src/ahp/prover.rs:326)
    coeffs = _rand(5)
    dom = Radix2Domain(16)
    evals = fr.to_ints(ntt.ntt(fr.from_ints(coeffs), 16))
    assert evals == [_host_eval(coeffs, e) for e in dom.elements()]


def test_poly_mul():
    a, b = _rand(7), _rand(12)
    got = fr.to_ints(poly.mul(fr.from_ints(a), fr.from_ints(b)))
    exp = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            exp[i + j] = (exp[i + j] + ai * bj) % R
    assert got == exp


def test_summation_identity():
    # Σ_{h in H} p(h) = (a_0 + a_n) * |H| for deg-n poly on size-n domain
    # (reference src/ahp/mod.rs:368-387)
    n = 16
    dom = Radix2Domain(n)
    coeffs = _rand(n + 1)
    s = sum(_host_eval(coeffs, e) for e in dom.elements()) % R
    assert s == (coeffs[0] + coeffs[n]) * n % R
    # and the device NTT agrees on the domain sum
    evals = ntt.ntt(fr.from_ints(coeffs + [0] * (31 - n)), 32)  # bigger domain
    p_on_h = [_host_eval(coeffs, e) for e in dom.elements()]
    assert sum(p_on_h) % R == s


def test_divide_by_vanishing():
    n = 8
    p = _rand(30)
    q, r = poly.divide_by_vanishing(fr.from_ints(p), n)
    qi, ri = fr.to_ints(q), fr.to_ints(r)
    # check p == q*(x^n - 1) + r via evaluation at random points
    for _ in range(4):
        x = rng.randrange(R)
        v = (pow(x, n, R) - 1) % R
        assert _host_eval(p, x) == (_host_eval(qi, x) * v + _host_eval(ri, x)) % R


def test_mul_by_vanishing():
    n = 8
    p = _rand(5)
    got = fr.to_ints(poly.mul_by_vanishing(fr.from_ints(p), n))
    exp = [(-c) % R for c in p] + [0] * (n - len(p)) + list(p)
    assert got == exp


def test_evaluate():
    p = _rand(37)
    z = rng.randrange(R)
    got = fr.to_int(poly.evaluate(fr.from_ints(p), fr.from_int(z)))
    assert got == _host_eval(p, z)


def test_reindex_by_subdomain():
    big, small = Radix2Domain(16), Radix2Domain(4)
    mapped = [big.reindex_by_subdomain(small, i) for i in range(16)]
    # the first |small| indices hit stride-4 slots; the rest fill the gaps
    assert mapped[:4] == [0, 4, 8, 12]
    assert sorted(mapped) == list(range(16))
    # subdomain elements really sit at those positions
    be, se = big.elements(), small.elements()
    for i in range(4):
        assert be[mapped[i]] == se[i]


def test_lagrange_coefficients():
    # verifier-side x(beta) interpolation (reference src/ahp/mod.rs:154-159)
    dom = Radix2Domain(8)
    tau = rng.randrange(R)
    lags = dom.evaluate_all_lagrange_coefficients(tau)
    # Σ L_i(tau) * p(g^i) == p(tau) for a random poly of deg < 8
    p = _rand(8)
    interp = sum(l * _host_eval(p, e) for l, e in zip(lags, dom.elements())) % R
    assert interp == _host_eval(p, tau)
    # tau inside the domain: indicator
    lags2 = dom.evaluate_all_lagrange_coefficients(dom.element(3))
    assert lags2[3] == 1 and sum(lags2) == 1


def test_vanishing_divisibility():
    # v_K / v_H is a polynomial when H ⊆ K (reference test_alternator_polynomial)
    big, small = Radix2Domain(16), Radix2Domain(8)
    # v_K(x) = x^16 - 1 = (x^8-1)(x^8+1): check evaluations
    for _ in range(4):
        x = rng.randrange(R)
        vk_val = big.evaluate_vanishing_polynomial(x)
        vh_val = small.evaluate_vanishing_polynomial(x)
        q = (pow(x, 8, R) + 1) % R
        assert vk_val == vh_val * q % R
