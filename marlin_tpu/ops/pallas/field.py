"""Elementwise Pallas TPU field kernels (Fr and Fq via bigint.ModCtx).

Public entry points take the repo-wide `[.., L]` limb layout, transform to
the limb-major `[L, rows, 128]` compute layout (core.py) at the jit
boundary, and run one fused kernel per op — the production TPU path for
`ops.fr` / `ops.fq` (round-1's XLA CIOS chains spent ~85% of their time in
per-op dispatch + lane waste; see BASELINE.md).

All kernels are shape-stable: batches are padded to power-of-two tile
counts, so at most ~log2(max_batch) kernels per op ever compile — remote
TPU compiles cost minutes each (see memory: axon-tpu-compile-constraints),
making the shape-class set the dominant cold-start cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import core

LANE = 128
# rows per grid step; rt=8 measured fastest on v5e for the CIOS kernel
_RT = 8
_TILE = LANE * _RT


def to_lm(x: jnp.ndarray) -> jnp.ndarray:
    """[n, L] (n % TILE == 0) -> [L, n/128, 128]."""
    n, L = x.shape
    return jnp.moveaxis(x.reshape(n // LANE, LANE, L), -1, 0)


def from_lm(x: jnp.ndarray) -> jnp.ndarray:
    """[L, rows, 128] -> [rows*128, L]."""
    L = x.shape[0]
    return jnp.moveaxis(x, 0, -1).reshape(-1, L)


def _pad_flat(x: jnp.ndarray, n: int, pad_to: int) -> jnp.ndarray:
    if n == pad_to:
        return x
    return jnp.pad(x, ((0, pad_to - n), (0, 0)))


def pad_target(n: int) -> int:
    """Smallest power-of-two multiple of one tile that fits n (bounds the
    number of distinct compiled kernel shapes to ~log2(max batch))."""
    t = _TILE
    while t < n:
        t *= 2
    return t


def _mul_kernel(a_ref, b_ref, o_ref, *, n_tuple, np0):
    o_ref[:] = core.mm_mul(a_ref[:], b_ref[:], n_tuple, np0)


def _add_kernel(a_ref, b_ref, o_ref, *, n_tuple):
    o_ref[:] = core.mm_add(a_ref[:], b_ref[:], n_tuple)


def _sub_kernel(a_ref, b_ref, o_ref, *, n_tuple):
    o_ref[:] = core.mm_sub(a_ref[:], b_ref[:], n_tuple)


def _inv_kernel(bits_ref, x_ref, o_ref, *, n_tuple, np0, nbits, one_tuple):
    """Fermat x^(N-2): fori over static exponent bits (MSB-first, SMEM)."""
    x = x_ref[:]
    L = len(n_tuple)
    shape = x.shape[1:]
    one = jnp.stack(
        [jnp.full(shape, w, jnp.uint32) for w in one_tuple], axis=0
    )

    def body(i, acc):
        acc = core.mm_mul(acc, acc, n_tuple, np0)
        mul = core.mm_mul(acc, x, n_tuple, np0)
        return jnp.where(bits_ref[i] == 1, mul, acc)

    o_ref[:] = jax.lax.fori_loop(0, nbits, body, one)


@functools.lru_cache(maxsize=None)
def _build_binop(kind: str, ctx, rows: int, interpret: bool):
    from jax.experimental import pallas as pl

    n_tuple, np0 = core.mod_consts(ctx)
    L = ctx.L
    if kind == "mul":
        kernel = functools.partial(_mul_kernel, n_tuple=n_tuple, np0=np0)
    elif kind == "add":
        kernel = functools.partial(_add_kernel, n_tuple=n_tuple)
    else:
        kernel = functools.partial(_sub_kernel, n_tuple=n_tuple)
    grid = rows // _RT
    spec = pl.BlockSpec((L, _RT, LANE), lambda i: (0, i, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANE), jnp.uint32),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_inv(ctx, rows: int, interpret: bool):
    from jax.experimental import pallas as pl

    n_tuple, np0 = core.mod_consts(ctx)
    L = ctx.L
    bits = np.asarray(ctx.inv_exp_bits, dtype=np.int32)
    one_tuple = tuple(int(w) for w in ctx.one_limbs)
    kernel = functools.partial(
        _inv_kernel, n_tuple=n_tuple, np0=np0, nbits=len(bits), one_tuple=one_tuple
    )
    grid = rows // _RT
    spec = pl.BlockSpec((L, _RT, LANE), lambda i: (0, i, 0))
    from jax.experimental.pallas import tpu as pltpu

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANE), jnp.uint32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec,
        ],
        out_specs=spec,
        interpret=interpret,
    )
    return lambda x: call(jnp.asarray(bits), x)


def _prep(ctx, arrs):
    """Broadcast to a common batch, flatten, pad to a whole tile count.

    -> (list of [L, rows, 128] arrays, batch_shape, true n)
    """
    L = ctx.L
    shape = jnp.broadcast_shapes(*(a.shape[:-1] for a in arrs))
    n = int(np.prod(shape)) if shape else 1
    pad_to = pad_target(n)
    out = []
    for a in arrs:
        flat = jnp.broadcast_to(a, (*shape, L)).reshape(n, L)
        out.append(to_lm(_pad_flat(flat, n, pad_to)))
    return out, shape, n


def _post(y_lm, shape, n, L):
    return from_lm(y_lm)[:n].reshape(*shape, L)


@functools.lru_cache(maxsize=None)
def _binop_jit(kind: str, ctx, interpret: bool):
    """End-to-end jitted op (layout transform + kernel + untransform) so an
    eager call is exactly one device dispatch."""

    def f(a, b):
        (a_lm, b_lm), shape, n = _prep(ctx, (a, b))
        call = _build_binop(kind, ctx, a_lm.shape[1], interpret)
        return _post(call(a_lm, b_lm), shape, n, ctx.L)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _inv_jit(ctx, interpret: bool):
    def f(x):
        (x_lm,), shape, n = _prep(ctx, (x,))
        call = _build_inv(ctx, x_lm.shape[1], interpret)
        return _post(call(x_lm), shape, n, ctx.L)

    return jax.jit(f)


def binop(kind: str, ctx, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Elementwise mul/add/sub over any broadcastable [.., L] operands."""
    return _binop_jit(kind, ctx, interpret)(a, b)


def inv(ctx, x: jnp.ndarray, interpret: bool = False):
    """Elementwise Fermat inversion (0 -> 0), any [.., L] batch."""
    return _inv_jit(ctx, interpret)(x)


def available() -> bool:
    return jax.default_backend() == "tpu"
