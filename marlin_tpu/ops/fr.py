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

from ..fields import active as P
from . import bigint as bi
from .limbs import int_to_limbs, ints_to_limbs, limbs_to_ints

# limb count tracks the config's Montgomery radix (R = 2^(8*FR_BYTES))
CTX = bi.ModCtx("fr", P.R_MODULUS, P.FR_BYTES * 8 // 16)
L = CTX.L

# XLA-path jits (CPU production path; TPU fallback via MARLIN_TPU_PALLAS=0).
_add_xla = jax.jit(lambda a, b: bi.add_mod(CTX, a, b))
_sub_xla = jax.jit(lambda a, b: bi.sub_mod(CTX, a, b))
_mul_xla = jax.jit(lambda a, b: bi.mont_mul(CTX, a, b))
_inv_xla = jax.jit(lambda a: bi.inv_mod(CTX, a))

# On TPU the hot elementwise ops route through the fused limb-major Pallas
# kernels (ops/pallas/field.py) — one dispatch each, full lane occupancy;
# inside a larger jit the layout transposes between adjacent ops cancel.
from .pallas import routing as _routing  # noqa: E402


def add(a, b):
    return _routing.binop("add", CTX, a, b) if _routing.use_pallas() else _add_xla(a, b)


def sub(a, b):
    return _routing.binop("sub", CTX, a, b) if _routing.use_pallas() else _sub_xla(a, b)


def mul(a, b):
    return _routing.binop("mul", CTX, a, b) if _routing.use_pallas() else _mul_xla(a, b)


def sqr(a):
    return mul(a, a)


def inv(a):
    return _routing.inv(CTX, a) if _routing.use_pallas() else _inv_xla(a)


def neg(a):
    return sub(jnp.zeros_like(a), a)


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


def from_canonical_limbs(limbs) -> jnp.ndarray:
    """[n, 16] canonical uint32 limb rows (e.g. ZkRng.rand_fr_limbs) ->
    device Montgomery limbs, with the R-multiplication on DEVICE — the
    host-int from_ints path costs ~175 ms per 3h-length mask polynomial
    in Python bigint arithmetic on the prove hot path."""
    from . import bigint as bi

    return bi.to_mont(CTX, jnp.asarray(limbs))


def from_ints_via_device(xs) -> jnp.ndarray:
    """Like from_ints but with the Montgomery conversion on device (one
    fused mont-mul by R²) — for hot-path bulk conversions (witness/z
    vectors in prover_init) where the per-int Python `x*R % r` dominates."""
    return from_canonical_limbs(ints_to_limbs([x % P.R_MODULUS for x in xs], L))


def from_int(x: int) -> jnp.ndarray:
    return jnp.asarray(int_to_limbs(x * P.FR_MONT_R % P.R_MODULUS, L))


def to_ints(arr) -> list[int]:
    """Device Montgomery limbs -> canonical ints."""
    rinv = pow(P.FR_MONT_R, -1, P.R_MODULUS)
    return [x * rinv % P.R_MODULUS for x in limbs_to_ints(np.asarray(arr))]


def to_int(arr) -> int:
    return to_ints(arr.reshape(1, -1))[0]
