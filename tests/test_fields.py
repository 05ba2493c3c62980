"""Device field kernels vs. the host golden reference; host pairing sanity.

Mirrors the role of arkworks' field unit tests (SURVEY.md §4): the device
limb kernels must agree with Python-int arithmetic on random inputs,
including edge values (0, 1, p-1).
"""

import random

import numpy as np
import pytest

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.fields import host_curve as hc
from marlin_tpu.fields import host_field as hf
from marlin_tpu.fields import host_pairing as hp
from marlin_tpu.ops import fq, fr

import pytest

pytestmark = pytest.mark.smoke

rng = random.Random(1234)


def _rand_fr(n):
    return [rng.randrange(P.R_MODULUS) for _ in range(n)]


def _rand_fq(n):
    return [rng.randrange(P.Q_MODULUS) for _ in range(n)]


class TestFr:
    def test_roundtrip(self):
        xs = _rand_fr(33) + [0, 1, P.R_MODULUS - 1]
        assert fr.to_ints(fr.from_ints(xs)) == xs

    def test_add_sub_mul(self):
        r = P.R_MODULUS
        xs, ys = _rand_fr(65), _rand_fr(65)
        xs[:3] = [0, r - 1, r - 1]
        ys[:3] = [0, r - 1, 1]
        X, Y = fr.from_ints(xs), fr.from_ints(ys)
        assert fr.to_ints(fr.add(X, Y)) == [(a + b) % r for a, b in zip(xs, ys)]
        assert fr.to_ints(fr.sub(X, Y)) == [(a - b) % r for a, b in zip(xs, ys)]
        assert fr.to_ints(fr.mul(X, Y)) == [a * b % r for a, b in zip(xs, ys)]
        assert fr.to_ints(fr.neg(X)) == [(-a) % r for a in xs]

    def test_inv(self):
        r = P.R_MODULUS
        xs = _rand_fr(16) + [1, r - 1]
        X = fr.from_ints(xs)
        assert fr.to_ints(fr.inv(X)) == [pow(a, -1, r) for a in xs]
        # zero maps to zero (ark_ff::batch_inversion skip-zeros semantics)
        assert fr.to_ints(fr.inv(fr.zeros((2,)))) == [0, 0]

    def test_modsum_and_pow(self):
        r = P.R_MODULUS
        xs = _rand_fr(100)
        X = fr.from_ints(xs)
        assert fr.to_int(fr.modsum(X)) == sum(xs) % r
        assert fr.to_ints(fr.pow_const(X, 5)) == [pow(a, 5, r) for a in xs]


class TestFq:
    def test_mul_inv(self):
        q = P.Q_MODULUS
        xs, ys = _rand_fq(32), _rand_fq(32)
        X, Y = fq.from_ints(xs), fq.from_ints(ys)
        assert fq.to_ints(fq.mul(X, Y)) == [a * b % q for a, b in zip(xs, ys)]
        assert fq.to_ints(fq.inv(X)) == [pow(a, -1, q) for a in xs]


class TestHostField:
    def test_batch_inversion(self):
        xs = _rand_fr(20)
        xs[3] = 0
        xs[11] = 0
        out = hf.batch_inversion(xs)
        for x, o in zip(xs, out):
            assert o == (0 if x == 0 else pow(x, -1, P.R_MODULUS))


class TestHostCurve:
    def test_g1_group(self):
        g = hc.G1_GEN
        assert hc.g1_is_on_curve(g)
        assert hc.g1_mul(g, P.R_MODULUS) is None
        a, b = rng.randrange(P.R_MODULUS), rng.randrange(P.R_MODULUS)
        lhs = hc.g1_mul(g, (a + b) % P.R_MODULUS)
        rhs = hc.g1_add(hc.g1_mul(g, a), hc.g1_mul(g, b))
        assert lhs == rhs

    def test_g1_compress_roundtrip(self):
        for s in [1, 2, 12345, P.R_MODULUS - 1]:
            p = hc.g1_mul(hc.G1_GEN, s)
            assert hc.g1_decompress(hc.g1_compress(p)) == p
        assert hc.g1_decompress(hc.g1_compress(None)) is None


@pytest.mark.slow
class TestPairing:
    def test_bilinearity(self):
        e = hp.pairing(hc.G1_GEN, hc.G2_GEN)
        assert e != hp.FQ12_ONE
        a, b = 987654321, 123456789
        lhs = hp.pairing(hc.g1_mul(hc.G1_GEN, a), hc.g2_mul(hc.G2_GEN, b))
        assert lhs == hp.fq12_pow(e, a * b % P.R_MODULUS)

    def test_multi_pairing(self):
        a = 424242
        ok = hp.multi_pairing(
            [
                (hc.g1_mul(hc.G1_GEN, a), hc.G2_GEN),
                (hc.g1_neg(hc.G1_GEN), hc.g2_mul(hc.G2_GEN, a)),
            ]
        )
        assert ok
