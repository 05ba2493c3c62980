"""Native C pairing engine vs the pure-Python tower (parity oracle).

The C engine (csrc/marlin_curve.c) mirrors fields/host_pairing.py op-for-op
— same tower construction, same sparse twist-coordinate Miller loop, same
base-q digit final exponentiation — so the raw Fq12 values must be
bit-identical, not merely both-accepting.  Reference capability:
ark-ec pairings reached through PC::check_combinations
(reference src/lib.rs:413-423).
"""

import pytest

from marlin_tpu.fields import active as P

pytestmark = pytest.mark.skipif(
    getattr(P, "CURVE_NAME", "bls12_381") != "bls12_381",
    reason="native pairing runtime is BLS12-381-only",
)

from marlin_tpu.fields import host_curve as hc  # noqa: E402
from marlin_tpu.fields import host_pairing as hp  # noqa: E402
from marlin_tpu.fields import native_curve as nc  # noqa: E402


@pytest.fixture(scope="module")
def points():
    if not nc.available():
        pytest.skip("native curve runtime unavailable")
    p1 = hc.g1_mul(hc.G1_GEN, 0x1234567890ABCDEF)
    p2 = hc.g1_mul(hc.G1_GEN, 987654321987654321)
    q1 = hc.g2_mul(hc.G2_GEN, 0xFEDCBA0987654321)
    q2 = hc.g2_mul(hc.G2_GEN, 1357924680)
    return p1, p2, q1, q2


def test_miller_loop_bit_identical(points):
    p1, p2, q1, q2 = points
    assert nc.miller_loop(p1, q1) == hp.miller_loop(p1, q1)
    assert nc.miller_loop(p2, q2) == hp.miller_loop(p2, q2)
    assert nc.miller_loop(None, q1) == hp.FQ12_ONE
    assert nc.miller_loop(p1, None) == hp.FQ12_ONE


def test_final_exp_bit_identical(points):
    p1, _, q1, _ = points
    f = hp.miller_loop(p1, q1)
    assert nc.final_exponentiation(f) == hp.final_exponentiation(f)


def test_pairing_bilinearity_native(points):
    # e(aP, Q) == e(P, aQ): both sides entirely through the C engine
    a = 73
    p, q = hc.G1_GEN, hc.G2_GEN
    lhs = nc.final_exponentiation(nc.miller_loop(hc.g1_mul(p, a), q))
    rhs = nc.final_exponentiation(nc.miller_loop(p, hc.g2_mul(q, a)))
    assert lhs == rhs


def test_multi_pairing_native_accepts_and_rejects(points):
    p1, _, q1, _ = points
    s = 424242
    # e(sP, Q) * e(-P, sQ) == 1
    pairs_good = [(hc.g1_mul(p1, s), q1), (hc.g1_neg(p1), hc.g2_mul(q1, s))]
    assert nc.multi_pairing(pairs_good)
    pairs_bad = [(hc.g1_mul(p1, s + 1), q1), (hc.g1_neg(p1), hc.g2_mul(q1, s))]
    assert not nc.multi_pairing(pairs_bad)
    # identity slots are skipped, matching the Python semantics
    assert nc.multi_pairing([(None, q1), (p1, None)])


def test_scalar_mul_native_matches_python(points):
    if not nc.available():
        pytest.skip("native curve runtime unavailable")
    k = 0xDEADBEEFCAFE
    base_jac = hc._jac_from_affine(hc.G1_GEN)
    acc = (0, 1, 0)
    kk = k
    base = base_jac
    while kk:
        if kk & 1:
            acc = hc._jac_add(acc, base)
        base = hc._jac_double(base)
        kk >>= 1
    assert nc.g1_mul(hc.G1_GEN, k) == hc._jac_to_affine(acc)
    assert nc.g2_mul(hc.G2_GEN, k) == hc._scalar_mul(hc.FQ2_OPS, hc.G2_GEN, k)
    assert nc.g1_mul(None, 5) is None
    assert nc.g2_mul(None, 5) is None


def test_prepared_multi_pairing_matches_raw(points):
    p1, p2, q1, q2 = points
    s = 31337
    good = [(hc.g1_mul(p1, s), q1), (hc.g1_neg(p1), hc.g2_mul(q1, s))]
    bad = [(hc.g1_mul(p1, s + 1), q1), (hc.g1_neg(p1), hc.g2_mul(q1, s))]
    assert nc.multi_pairing_raw(good) and nc.multi_pairing(good)
    assert not nc.multi_pairing_raw(bad) and not nc.multi_pairing(bad)
    # identity handling matches (skipped pairs contribute 1)
    assert nc.multi_pairing([(None, q1), (p2, None)])
    # table is cached per point
    t1 = nc.g2_prepare(q1)
    assert nc.g2_prepare(q1) is t1


def test_prepared_three_pairs(points):
    # sonic-style 3-slot product: e(aP, Q)·e(bP, Q)·e(-(a+b)P, Q) == 1
    p1, _, q1, _ = points
    a, b = 7777, 2222
    pairs = [
        (hc.g1_mul(p1, a), q1),
        (hc.g1_mul(p1, b), q1),
        (hc.g1_neg(hc.g1_mul(p1, a + b)), q1),
    ]
    assert nc.multi_pairing(pairs)


def test_final_exp_x_chain_matches_digit_chain(points):
    """The BLS12-381 x-chain hard part (h = u(x+q)(x²+q²-1)+1, u=(x-1)²/3)
    must equal the generic 4-digit base-q shared chain bit-for-bit."""
    p1, p2, q1, q2 = points
    for p, q in ((p1, q1), (p2, q2), (p1, q2)):
        f = nc.miller_loop(p, q)
        assert nc.final_exponentiation(f) == nc.final_exponentiation_digits(f)
