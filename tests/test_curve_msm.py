"""Device curve/MSM kernels vs. the host golden reference."""

import random

import jax.numpy as jnp

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.fields import host_curve as hc
from marlin_tpu.ops import curve_device as cd
from marlin_tpu.ops import fr, msm

rng = random.Random(99)


def _rand_points(n):
    return [hc.g1_mul(hc.G1_GEN, rng.randrange(1, P.R_MODULUS)) for _ in range(n)]


def test_add_double_roundtrip():
    pts = _rand_points(8)
    dev = cd.from_affine_ints(pts)
    assert cd.to_affine_ints(dev) == pts
    # P + P == double(P) == host 2P
    doubled = cd.to_affine_ints(cd.double(dev))
    assert doubled == [hc.g1_add(p, p) for p in pts]
    added = cd.to_affine_ints(cd.add(dev, dev))
    assert added == doubled


def test_add_mixed_cases():
    p = _rand_points(1)[0]
    q = _rand_points(1)[0]
    cases = [
        (p, q),  # generic
        (p, p),  # equal -> double
        (p, hc.g1_neg(p)),  # inverse -> identity
        (None, q),  # identity lhs
        (p, None),  # identity rhs
        (None, None),
    ]
    a = cd.from_affine_ints([x for x, _ in cases])
    b = cd.from_affine_ints([y for _, y in cases])
    got = cd.to_affine_ints(cd.add(a, b))
    exp = [hc.g1_add(x, y) for x, y in cases]
    assert got == exp


def test_tree_reduce():
    pts = _rand_points(7)
    dev = cd.from_affine_ints(pts)
    got = cd.to_affine_ints(cd.tree_reduce_add(dev))[0]
    exp = None
    for p in pts:
        exp = hc.g1_add(exp, p)
    assert got == exp


def test_scalar_mul_batch():
    pts = _rand_points(4)
    scalars = [rng.randrange(P.R_MODULUS) for _ in range(4)] + [0, 1]
    pts += _rand_points(2)
    from marlin_tpu.ops.limbs import ints_to_limbs

    dev = cd.from_affine_ints(pts)
    got = cd.to_affine_ints(cd.scalar_mul_batch(dev, jnp.asarray(ints_to_limbs(scalars, 16))))
    exp = [hc.g1_mul(p, s) for p, s in zip(pts, scalars)]
    assert got == exp


def test_msm_small():
    n = 30
    pts = _rand_points(n)
    scalars = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    scalars[0] = 0  # zero scalar
    scalars[1] = scalars[2]  # repeated digits
    dev_pts = cd.from_affine_ints(pts)
    got = cd.to_affine_ints(msm.msm(dev_pts, fr.from_ints(scalars)))[0]
    exp = hc.g1_msm(pts, scalars)
    assert got == exp


def test_msm_default_window():
    n = 12
    pts = _rand_points(n)
    scalars = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    dev_pts = cd.from_affine_ints(pts)
    got = cd.to_affine_ints(msm.msm(dev_pts, fr.from_ints(scalars)))[0]
    assert got == hc.g1_msm(pts, scalars)


def test_msm_pippenger_direct():
    n = 64
    pts = _rand_points(n)
    scalars = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    scalars[0] = 0
    dev_pts = cd.from_affine_ints(pts)
    got = cd.to_affine_ints(msm.msm_pippenger(dev_pts, fr.from_ints(scalars), c=6))[0]
    assert got == hc.g1_msm(pts, scalars)


def test_msm_pippenger_skewed_digits():
    # repeated scalars overflow every bucket -> masked-reduction fallback
    n = 64
    pts = _rand_points(n)
    s = rng.randrange(P.R_MODULUS)
    scalars = [s] * n
    dev_pts = cd.from_affine_ints(pts)
    got = cd.to_affine_ints(msm.msm_pippenger(dev_pts, fr.from_ints(scalars), c=4))[0]
    assert got == hc.g1_msm(pts, scalars)


def test_signed_digits_reconstruct():
    import numpy as np

    from marlin_tpu.ops import bigint as bi

    for c in (8, 10, 12, 13, 16):
        W = -(-256 // c)
        scalars = [0, 1, P.R_MODULUS - 1] + [
            rng.randrange(P.R_MODULUS) for _ in range(29)
        ]
        scal16 = np.asarray(
            jnp.asarray(bi.from_mont(fr.CTX, fr.from_ints(scalars)))
        )
        digits = msm._signed_digits_np(scal16, c, W)
        half = 1 << (c - 1)
        assert digits.max() <= half and digits.min() >= -(half - 1)
        for i, s in enumerate(scalars):
            rec = sum(int(digits[w, i]) << (c * w) for w in range(W))
            assert rec == s, (c, i)


def test_msm_fixed_table_matches_host():
    """Single-window fixed-base table path (the TPU commit route) vs the
    host golden MSM, including a shifted-offset job and a tiny ladder job.
    Runs the XLA fold (no pallas on CPU) — the kernels differ but the
    layout/sign/scan logic is shared with the TPU path."""
    n = 700
    pts = _rand_points(n)
    dev_pts = cd.from_affine_ints(pts)
    c = 10
    table = msm.build_fixed_table(dev_pts, c)
    assert table.num_windows == 26

    jobs = []
    expected = []
    # full-range job (>= 512 -> table path)
    s1 = [rng.randrange(P.R_MODULUS) for _ in range(600)]
    s1[0] = 0
    jobs.append((0, fr.from_ints(s1)))
    expected.append(hc.g1_msm(pts[:600], s1))
    # shifted-offset job
    s2 = [rng.randrange(P.R_MODULUS) for _ in range(520)]
    jobs.append((100, fr.from_ints(s2)))
    expected.append(hc.g1_msm(pts[100:620], s2))
    # tiny job -> ladder fallback
    s3 = [rng.randrange(P.R_MODULUS) for _ in range(5)]
    jobs.append((3, fr.from_ints(s3)))
    expected.append(hc.g1_msm(pts[3:8], s3))

    msm.fold_flags_fired()  # drain flags left by earlier tests' classic MSMs
    out = msm.msm_fixed_many(table, jobs)
    assert not msm.fold_flags_fired()  # random scalars: no spill/degeneracy
    for got, exp in zip(out, expected):
        assert cd.to_affine_ints(got)[0] == exp


def test_msm_fixed_table_top_window_no_spill():
    """Round-4 regression: at production c (12) the top window spans only
    ~4 modulus bits, so its digits land in buckets 1..8 — pooled into the
    merged layout they overflowed the capacity model for EVERY honest
    scalar set, firing the exact-rerun flag on each commit (2x prover
    cost).  The split top-window fold must stay flag-free and exact."""
    n = 1100
    pts = _rand_points(n)
    dev_pts = cd.from_affine_ints(pts)
    table = msm.build_fixed_table(dev_pts, 12)
    s = [rng.randrange(P.R_MODULUS) for _ in range(1024)]
    jobs = [(0, fr.from_ints(s))]
    msm.fold_flags_fired()  # drain
    out = msm.msm_fixed_many(table, jobs)
    assert not msm.fold_flags_fired()
    assert cd.to_affine_ints(out[0])[0] == hc.g1_msm(pts[:1024], s)


def test_msm_fixed_table_overflow_flags():
    """Repeated scalars overflow the capacity model: the deferred flag
    must fire, and the classic-exact rerun (what kzg._run_msm_jobs does on
    a fired flag) must produce the true sum."""
    n = 600
    pts = _rand_points(n)
    dev_pts = cd.from_affine_ints(pts)
    table = msm.build_fixed_table(dev_pts, 10)
    s = rng.randrange(P.R_MODULUS)
    scalars = [s] * n
    jobs = [(0, fr.from_ints(scalars))]
    msm.fold_flags_fired()  # clear
    msm.msm_fixed_many(table, jobs)
    assert msm.fold_flags_fired()
    out = msm.msm_many(dev_pts, jobs, exact=True)
    assert cd.to_affine_ints(out[0])[0] == hc.g1_msm(pts, scalars)
