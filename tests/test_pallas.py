"""Pallas kernel tests (interpreter mode on the CPU mesh)."""

import random

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
