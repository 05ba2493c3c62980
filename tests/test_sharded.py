"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The distributed dimension the reference never had to test
(SURVEY.md §4 "Implication"): sharded NTT/MSM must be bitwise identical to
the single-chip kernels.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.fields import host_curve as hc
from marlin_tpu.ops import curve_device as cd
from marlin_tpu.ops import fr, msm, ntt
from marlin_tpu.parallel.msm_sharded import msm_sharded
from marlin_tpu.parallel.ntt_sharded import ntt_4step

rng = random.Random(5)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("x",))


def test_ntt_4step_matches_single_chip(mesh):
    n = 1 << 10  # n1 = n2 = 32, divisible by 8
    coeffs = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    X = fr.from_ints(coeffs)
    single = ntt.ntt(X, n)
    multi = ntt_4step(X, mesh)
    assert jnp.array_equal(single, multi), "sharded NTT differs from single-chip"


def test_intt_4step_roundtrip(mesh):
    n = 1 << 10
    coeffs = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    X = fr.from_ints(coeffs)
    evals = ntt_4step(X, mesh)
    back = ntt_4step(evals, mesh, inverse=True)
    assert fr.to_ints(back) == coeffs


def test_msm_sharded_matches_single_chip(mesh):
    n = 16
    pts = [hc.g1_mul(hc.G1_GEN, rng.randrange(1, P.R_MODULUS)) for _ in range(n)]
    scal = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    dev = cd.from_affine_ints(pts)
    sm = fr.from_ints(scal)
    single = cd.to_affine_ints(msm.msm(dev, sm))[0]
    multi = cd.to_affine_ints(msm_sharded(dev, sm, mesh))[0]
    assert single == multi == hc.g1_msm(pts, scal)


def _powers_fixture(n):
    """n distinct points (powers of the generator) + random scalars."""
    base_scal = [rng.randrange(1, P.R_MODULUS) for _ in range(n)]
    pts = hc.g1_fixed_base_powers(hc.G1_GEN, base_scal)
    scal = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    return pts, scal


@pytest.mark.slow
def test_msm_sharded_pippenger_matches_single_chip(mesh):
    """Large enough that every shard takes the in-jit Pippenger path
    (n/8 >= _PIPPENGER_MIN): the distributed fast algorithm, not the
    ladder, must be bitwise-equal to the host-orchestrated kernel."""
    n = 8 * msm._PIPPENGER_MIN
    pts, scal = _powers_fixture(n)
    dev = cd.from_affine_ints(pts)
    sm = fr.from_ints(scal)
    single = cd.to_affine_ints(msm.msm(dev, sm))[0]
    multi = cd.to_affine_ints(msm_sharded(dev, sm, mesh))[0]
    assert single == multi == hc.g1_msm(pts, scal)


@pytest.mark.slow
def test_msm_sharded_spill_fallback(mesh):
    """All-identical scalars overflow the statically-capped buckets in
    every window; the spill counter must trigger the exact fallback."""
    n = 8 * msm._PIPPENGER_MIN
    pts, _ = _powers_fixture(n)
    s = rng.randrange(1, P.R_MODULUS)
    scal = [s] * n
    dev = cd.from_affine_ints(pts)
    sm = fr.from_ints(scal)
    multi = cd.to_affine_ints(msm_sharded(dev, sm, mesh))[0]
    assert multi == hc.g1_msm(pts, scal)


def test_ntt_4step_resident_matches_and_stays_sharded(mesh):
    """Resident 4-step: bitwise-equal to single-chip AND both boundaries
    flat-block-sharded — no per-device replication (SURVEY §5.7; the
    building block for prover-resident polynomial storage)."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from marlin_tpu.parallel.ntt_sharded import block_sharding, ntt_4step_resident

    n = 1 << 10
    coeffs = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    X = jax.device_put(fr.from_ints(coeffs), block_sharding(mesh))
    single = ntt.ntt(fr.from_ints(coeffs), n)
    multi = ntt_4step_resident(X, mesh)
    assert jnp.array_equal(single, multi), "resident NTT differs from single-chip"
    # output must be block-sharded (each device holds n/8 rows), not replicated
    shards = multi.addressable_shards
    assert len({s.device for s in shards}) == 8
    rows = {s.data.shape[0] for s in shards}
    assert rows == {n // 8}, rows
    # and it chains: inverse transform straight off the sharded output
    back = ntt_4step_resident(multi, mesh, inverse=True)
    assert fr.to_ints(back) == coeffs
    bshards = back.addressable_shards
    assert {s.data.shape[0] for s in bshards} == {n // 8}


def test_resident_elementwise_stays_sharded(mesh):
    """Field elementwise kernels preserve the block sharding — the glue
    that keeps vectors resident between NTT/MSM calls."""
    from marlin_tpu.parallel.ntt_sharded import block_sharding

    n = 1 << 9
    a = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    b = [rng.randrange(P.R_MODULUS) for _ in range(n)]
    A = jax.device_put(fr.from_ints(a), block_sharding(mesh))
    B = jax.device_put(fr.from_ints(b), block_sharding(mesh))
    C = fr.mul(A, B)
    assert fr.to_ints(C) == [x * y % P.R_MODULUS for x, y in zip(a, b)]
    assert {s.data.shape[0] for s in C.addressable_shards} == {n // 8}
