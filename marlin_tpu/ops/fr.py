"""Batched BLS12-381 scalar-field (Fr) arithmetic on device.

Everything the AHP touches is Fr (the reference's layer 2 never sees curve
points — SURVEY.md §1 row 2); these wrappers bind the generic limb machinery
in :mod:`marlin_tpu.ops.bigint` to the Fr modulus.  Elements are `[.., 16]`
uint32 limb vectors in Montgomery form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bls12_381 as P
from . import bigint as bi
from .limbs import int_to_limbs, ints_to_limbs, limbs_to_ints

CTX = bi.ModCtx("fr", P.R_MODULUS, 16)
L = CTX.L

# Jitted at module level: callers may use these eagerly (cached per shape) or
# inside larger jitted programs (inlined).
add = jax.jit(lambda a, b: bi.add_mod(CTX, a, b))
sub = jax.jit(lambda a, b: bi.sub_mod(CTX, a, b))
neg = jax.jit(lambda a: bi.neg_mod(CTX, a))
mul = jax.jit(lambda a, b: bi.mont_mul(CTX, a, b))
sqr = jax.jit(lambda a: bi.mont_sqr(CTX, a))
inv = jax.jit(lambda a: bi.inv_mod(CTX, a))
is_zero = jax.jit(lambda a: bi.is_zero(CTX, a))
eq = jax.jit(lambda a, b: bi.eq(CTX, a, b))
select = jax.jit(lambda c, a, b: bi.select(c, a, b))
modsum = jax.jit(lambda a: bi.modsum(CTX, a))
reduce_wide = jax.jit(lambda t: bi.reduce_wide(CTX, t))


def zeros(shape=()):
    return bi.zeros(CTX, shape)


def ones(shape=()):
    return jnp.broadcast_to(jnp.asarray(CTX.one_limbs), (*shape, L))


def pow_const(x, e: int):
    nbits = max(e.bit_length(), 1)
    bits = np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)
    return _pow_bits(x, tuple(bits.tolist()))


@functools.partial(jax.jit, static_argnums=1)
def _pow_bits(x, bits):
    return bi.pow_const(CTX, x, np.array(bits, dtype=np.uint32))


# --- host <-> device conversions (Montgomery form on device) ----------------


def from_ints(xs) -> jnp.ndarray:
    """Canonical ints -> device Montgomery limbs [n, 16]."""
    mont = [x * P.FR_MONT_R % P.R_MODULUS for x in xs]
    return jnp.asarray(ints_to_limbs(mont, L))


def from_int(x: int) -> jnp.ndarray:
    return jnp.asarray(int_to_limbs(x * P.FR_MONT_R % P.R_MODULUS, L))


def to_ints(arr) -> list[int]:
    """Device Montgomery limbs -> canonical ints."""
    rinv = pow(P.FR_MONT_R, -1, P.R_MODULUS)
    return [x * rinv % P.R_MODULUS for x in limbs_to_ints(np.asarray(arr))]


def to_int(arr) -> int:
    return to_ints(arr.reshape(1, -1))[0]
