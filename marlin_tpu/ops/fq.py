"""Batched BLS12-381 base-field (Fq) arithmetic on device.

Used by the curve kernels (ops/curve_device.py, ops/msm.py) — the only
consumers of Fq, mirroring how the reference isolates curve math inside the
polynomial-commitment layer (SURVEY.md §1 row 6).  Elements are `[.., 24]`
uint32 limb vectors in Montgomery form (R = 2^384).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import active as P
from . import bigint as bi
from .limbs import int_to_limbs, ints_to_limbs, limbs_to_ints

# limb count tracks the config's Montgomery radix (R = 2^(8*FQ_BYTES)):
# 24 x 16-bit limbs for BLS12-381's 381-bit Fq, 16 for BN254's 254-bit Fq.
CTX = bi.ModCtx("fq", P.Q_MODULUS, P.FQ_BYTES * 8 // 16)
L = CTX.L

_add_xla = jax.jit(lambda a, b: bi.add_mod(CTX, a, b))
_sub_xla = jax.jit(lambda a, b: bi.sub_mod(CTX, a, b))
_mul_xla = jax.jit(lambda a, b: bi.mont_mul(CTX, a, b))
_inv_xla = jax.jit(lambda a: bi.inv_mod(CTX, a))

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


def zeros(shape=()):
    return bi.zeros(CTX, shape)


def ones(shape=()):
    return jnp.broadcast_to(jnp.asarray(CTX.one_limbs), (*shape, L))


def from_ints(xs) -> jnp.ndarray:
    mont = [x * P.FQ_MONT_R % P.Q_MODULUS for x in xs]
    return jnp.asarray(ints_to_limbs(mont, L))


def from_int(x: int) -> jnp.ndarray:
    return jnp.asarray(int_to_limbs(x * P.FQ_MONT_R % P.Q_MODULUS, L))


def to_ints(arr) -> list[int]:
    rinv = pow(P.FQ_MONT_R, -1, P.Q_MODULUS)
    return [x * rinv % P.Q_MODULUS for x in limbs_to_ints(np.asarray(arr))]


def to_int(arr) -> int:
    return to_ints(arr.reshape(1, -1))[0]
