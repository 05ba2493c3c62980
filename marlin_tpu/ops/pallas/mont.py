"""Pallas TPU kernel: batched Fr Montgomery multiplication.

The innermost field op of every NTT butterfly / Hadamard combine
(SURVEY.md §7 "Montgomery bigint on TPU" is the ranked-hardest kernel).
The XLA path (ops/bigint.py) emits the same CIOS schedule as fused
elementwise HLO; this kernel pins the whole product in VMEM explicitly —
one grid step processes a tile of elements with all limb traffic on-chip,
no HBM round-trips between the partial-product layers.

Used opportunistically: `available()` gates on a TPU backend; callers fall
back to the XLA path elsewhere (tests exercise the kernel in interpreter
mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...fields import active as P
from ..limbs import LIMB_BITS, LIMB_MASK, int_to_limbs

L = 16


def _cios_body(a, b, n_tuple, np0):
    """Unrolled CIOS over [T, 16] uint32 tiles (same math as ops/bigint.py).

    n_tuple / np0 are Python-int constants baked into the kernel (pallas
    kernels cannot capture traced arrays)."""
    shape = a.shape[:-1]
    acc = [jnp.zeros(shape, jnp.uint32) for _ in range(L + 1)]
    for i in range(L):
        ai = a[..., i]
        for j in range(L):
            p = ai * b[..., j]
            acc[j] = acc[j] + (p & 0xFFFF)
            acc[j + 1] = acc[j + 1] + (p >> LIMB_BITS)
        m = (acc[0] * jnp.uint32(np0)) & 0xFFFF
        for j in range(L):
            mn = m * jnp.uint32(n_tuple[j])
            acc[j] = acc[j] + (mn & 0xFFFF)
            acc[j + 1] = acc[j + 1] + (mn >> LIMB_BITS)
        carry0 = acc[0] >> LIMB_BITS
        acc = acc[1:] + [jnp.zeros(shape, jnp.uint32)]
        acc[0] = acc[0] + carry0
    # finalize: carry propagation + conditional subtract
    carry = jnp.zeros(shape, jnp.uint32)
    borrow = jnp.zeros(shape, jnp.int32)
    limbs_l, diffs_l = [], []
    n_pad = tuple(n_tuple) + (0,)
    for i in range(L + 1):
        s = acc[i] + carry
        limb = s & 0xFFFF
        carry = s >> LIMB_BITS
        d = limb.astype(jnp.int32) - jnp.int32(n_pad[i]) - borrow
        borrow = (d < 0).astype(jnp.int32)
        limbs_l.append(limb)
        diffs_l.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    limbs = jnp.stack(limbs_l, axis=-1)
    diffs = jnp.stack(diffs_l, axis=-1)
    return jnp.where((borrow != 0)[..., None], limbs, diffs)[..., :L]


def _kernel(a_ref, b_ref, out_ref, *, n_const, np0):
    out_ref[:] = _cios_body(a_ref[:], b_ref[:], n_const, np0)


@functools.partial(jax.jit, static_argnums=(2,))
def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Elementwise Fr Montgomery product of [n, 16] limb tensors."""
    from jax.experimental import pallas as pl

    n = a.shape[0]
    tile = min(64, n)
    assert n % tile == 0, "pallas path expects tile-aligned batches"
    n_const = tuple(int(x) for x in int_to_limbs(P.R_MODULUS, L))
    np0 = pow(-P.R_MODULUS, -1, 1 << 256) & LIMB_MASK

    kernel = functools.partial(_kernel, n_const=n_const, np0=np0)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.uint32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, L), lambda i: (i, 0)),
        interpret=interpret,
    )(a, b)


def available() -> bool:
    return jax.default_backend() not in ("cpu",)
