"""Vectorized Montgomery arithmetic over 16-bit limbs (the TPU field core).

This is the re-implementation of `ark-ff`'s Montgomery bigint layer
(SURVEY.md §2b row 1, §7 step 1) as batched JAX array programs: every
operation maps elementwise over arbitrary leading batch dimensions, so the
VPU sees wide, regular uint32 lanes.  The same machinery instantiates Fr
(L=16 limbs) and Fq (L=24 limbs) via a :class:`ModCtx`.

Design notes
------------
* Products: schoolbook accumulation with per-step lo/hi 16-bit splitting.
  Each accumulator position receives at most 2L terms < 2^16, i.e. stays
  < 2^21 — comfortably inside uint32.
* Carry normalization: an exact base-2^16 renormalization done with a
  `lax.scan` over the limb axis (sequential over <=2L tiny steps, fully
  batched over elements).  The Pallas kernels replace this with in-register
  unrolled chains (ops/pallas/).
* Montgomery reduction: SOS — m = (T mod R) * N' mod R; U = (T + m*N) / R;
  conditional subtract.  R = 2^(16 L).
* Inversion: Fermat (x^(N-2)) under `lax.fori_loop`; maps zero to zero,
  matching `ark_ff::batch_inversion`'s skip-zeros semantics.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, int_to_limbs

_U32 = jnp.uint32
_MASK = jnp.uint32(LIMB_MASK)


def _unroll_carries() -> bool:
    """Pick the carry-propagation style for the current backend.

    The TPU toolchain compiles deep `lax.scan` nests orders of magnitude
    slower than straight-line vector code (measured: 477 s vs 3 s for the
    same scalar-mul ladder) and pays per-iteration overhead at runtime, so
    on TPU every carry chain is unrolled.  XLA:CPU prefers the compact scan
    form.  Both compute identical functions; override with
    MARLIN_TPU_CARRY=scan|unroll.
    """
    mode = os.environ.get("MARLIN_TPU_CARRY", "auto")
    if mode != "auto":
        return mode == "unroll"
    return jax.default_backend() != "cpu"


@dataclass(frozen=True)
class ModCtx:
    """Static per-modulus context; hashable so it can be a jit static arg."""

    name: str
    modulus: int
    L: int  # number of 16-bit limbs; R = 2^(16 L)

    @property
    def R(self) -> int:
        return 1 << (LIMB_BITS * self.L)

    @functools.cached_property
    def mont_one(self) -> int:
        return self.R % self.modulus

    @functools.cached_property
    def r2(self) -> int:
        return self.R * self.R % self.modulus

    @functools.cached_property
    def nprime(self) -> int:
        # -N^{-1} mod R
        return pow(-self.modulus, -1, self.R)

    # numpy constants (hashable ctx, so keep them as cached numpy arrays)
    @functools.cached_property
    def n_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.L)

    @functools.cached_property
    def nprime_limbs(self) -> np.ndarray:
        return int_to_limbs(self.nprime, self.L)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.r2, self.L)

    @functools.cached_property
    def one_limbs(self) -> np.ndarray:
        return int_to_limbs(self.mont_one, self.L)

    @functools.cached_property
    def inv_exp_bits(self) -> np.ndarray:
        """Bits of N-2 (MSB first) for Fermat inversion."""
        e = self.modulus - 2
        nbits = e.bit_length()
        return np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)


def zeros(ctx: ModCtx, shape=()) -> jnp.ndarray:
    return jnp.zeros((*shape, ctx.L), dtype=_U32)


def normalize(t: jnp.ndarray, out_len: int | None = None) -> jnp.ndarray:
    """Exact carry propagation: redundant uint32 limbs -> 16-bit limbs.

    Input limbs must be < 2^32 - 2^16 so `limb + carry` cannot wrap.
    Carries past the last position are discarded (callers size buffers so
    the true value fits).
    """
    if out_len is not None and out_len > t.shape[-1]:
        pad = [(0, 0)] * (t.ndim - 1) + [(0, out_len - t.shape[-1])]
        t = jnp.pad(t, pad)

    if _unroll_carries():
        carry = jnp.zeros(t.shape[:-1], _U32)
        outs = []
        for i in range(t.shape[-1]):
            s = t[..., i] + carry
            outs.append(s & _MASK)
            carry = s >> LIMB_BITS
        return jnp.stack(outs, axis=-1)

    def step(carry, limb):
        s = limb + carry
        return s >> LIMB_BITS, s & _MASK

    _, limbs = jax.lax.scan(step, jnp.zeros(t.shape[:-1], _U32), jnp.moveaxis(t, -1, 0))
    return jnp.moveaxis(limbs, 0, -1)


def mul_wide(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product of normalized [.., L] limbs -> redundant [.., 2L].

    Output limbs are < 2L * 2^16 < 2^21 (safe for further uint32 adds).
    """
    L = x.shape[-1]
    assert y.shape[-1] == L
    shape = jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
    acc = jnp.zeros((*shape, 2 * L), dtype=_U32)
    for i in range(L):
        p = x[..., i : i + 1] * y  # full 32-bit products of 16-bit limbs
        acc = acc.at[..., i : i + L].add(p & _MASK)
        acc = acc.at[..., i + 1 : i + L + 1].add(p >> LIMB_BITS)
    return acc


def _usub(a: jnp.ndarray, b: jnp.ndarray):
    """a - b over normalized limbs; returns (diff_limbs, borrow in {0,1})."""
    b = jnp.broadcast_to(b, a.shape)
    if _unroll_carries():
        borrow = jnp.zeros(a.shape[:-1], jnp.int32)
        outs = []
        for i in range(a.shape[-1]):
            s = a[..., i].astype(jnp.int32) - b[..., i].astype(jnp.int32) - borrow
            borrow = (s < 0).astype(jnp.int32)
            outs.append((s + (borrow << LIMB_BITS)).astype(_U32))
        return jnp.stack(outs, axis=-1), borrow

    def step(borrow, ab):
        ai, bi = ab
        s = ai.astype(jnp.int32) - bi.astype(jnp.int32) - borrow
        new_borrow = (s < 0).astype(jnp.int32)
        return new_borrow, (s + (new_borrow << LIMB_BITS)).astype(_U32)

    a_s = jnp.moveaxis(a, -1, 0)
    b_s = jnp.moveaxis(b, -1, 0)
    borrow, limbs = jax.lax.scan(step, jnp.zeros(a.shape[:-1], jnp.int32), (a_s, b_s))
    return jnp.moveaxis(limbs, 0, -1), borrow


def cond_sub_modulus(ctx: ModCtx, r: jnp.ndarray) -> jnp.ndarray:
    """r in [0, 2N) -> r mod N (normalized limbs in, normalized out)."""
    n = jnp.asarray(ctx.n_limbs)
    if r.shape[-1] > ctx.L:
        n = jnp.pad(n, (0, r.shape[-1] - ctx.L))
    diff, borrow = _usub(r, n)
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, r, diff)


def add_mod(ctx: ModCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = normalize(a + b, ctx.L + 1)  # one headroom limb for the carry
    return cond_sub_modulus(ctx, s)[..., : ctx.L]


def sub_mod(ctx: ModCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    b = jnp.broadcast_to(b, jnp.broadcast_shapes(a.shape, b.shape))
    a = jnp.broadcast_to(a, b.shape)
    diff, borrow = _usub(a, b)
    plus_n = normalize(diff + jnp.asarray(ctx.n_limbs), ctx.L)
    return jnp.where((borrow != 0)[..., None], plus_n, diff)


def neg_mod(ctx: ModCtx, a: jnp.ndarray) -> jnp.ndarray:
    return sub_mod(ctx, jnp.zeros_like(a), a)


def mont_reduce(ctx: ModCtx, t: jnp.ndarray) -> jnp.ndarray:
    """SOS Montgomery reduction: T (normalized [.., 2L], T < N*R) -> T R^-1 mod N."""
    L = ctx.L
    nprime = jnp.asarray(ctx.nprime_limbs)
    n = jnp.asarray(ctx.n_limbs)
    m = normalize(mul_wide(t[..., :L], nprime))[..., :L]  # (T mod R) * N' mod R
    u = mul_wide(m, n)
    u = u.at[..., : 2 * L].add(t)
    u = normalize(u)  # exact; low L limbs are zero
    return cond_sub_modulus(ctx, u[..., L:])


def _finalize_cios(ctx: ModCtx, acc: jnp.ndarray) -> jnp.ndarray:
    """Fused carry-propagate + conditional-subtract-N over redundant limbs.

    acc: [.., L+1] redundant (value < 2N).  One pass computes both the
    normalized limbs and the borrow chain of (value - N); a final select
    picks the reduced representative.
    """
    L = ctx.L
    n_ext = np.concatenate([ctx.n_limbs, np.zeros(1, np.uint32)])

    if _unroll_carries():
        carry = jnp.zeros(acc.shape[:-1], _U32)
        borrow = jnp.zeros(acc.shape[:-1], jnp.int32)
        limbs_l, diffs_l = [], []
        for i in range(L + 1):
            s = acc[..., i] + carry
            limb = s & _MASK
            carry = s >> LIMB_BITS
            d = limb.astype(jnp.int32) - int(n_ext[i]) - borrow
            borrow = (d < 0).astype(jnp.int32)
            limbs_l.append(limb)
            diffs_l.append((d + (borrow << LIMB_BITS)).astype(_U32))
        limbs = jnp.stack(limbs_l, axis=-1)
        diffs = jnp.stack(diffs_l, axis=-1)
        keep = (borrow != 0)[..., None]
        return jnp.where(keep, limbs, diffs)[..., :L]

    def step(state, inp):
        carry, borrow = state
        limb_red, n_i = inp
        s = limb_red + carry
        limb = s & _MASK
        d = limb.astype(jnp.int32) - n_i.astype(jnp.int32) - borrow
        new_borrow = (d < 0).astype(jnp.int32)
        return (s >> LIMB_BITS, new_borrow), (limb, (d + (new_borrow << LIMB_BITS)).astype(_U32))

    init = (jnp.zeros(acc.shape[:-1], _U32), jnp.zeros(acc.shape[:-1], jnp.int32))
    n_b = jnp.broadcast_to(
        jnp.asarray(n_ext).reshape((L + 1,) + (1,) * (acc.ndim - 1)), (L + 1, *acc.shape[:-1])
    )
    xs = (jnp.moveaxis(acc, -1, 0), n_b)
    (carry, borrow), (limbs, diffs) = jax.lax.scan(step, init, xs)
    limbs = jnp.moveaxis(limbs, 0, -1)
    diffs = jnp.moveaxis(diffs, 0, -1)
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, limbs, diffs)[..., :L]


def mont_mul(ctx: ModCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """CIOS Montgomery product as a single fused scan over a's limbs.

    Operands are normalized [.., L] Montgomery limbs.  The interleaved
    accumulator keeps redundant uint32 limbs bounded by ~2^22 (at most four
    sub-2^16 contributions per position per step plus the running shift),
    so no inner carry propagation is needed — one scan for the L reduction
    steps plus one fused finalize scan.
    """
    L = ctx.L
    n = jnp.asarray(ctx.n_limbs)
    np0 = jnp.uint32(int(ctx.nprime) & LIMB_MASK)
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*shape, L))
    b = jnp.broadcast_to(b, (*shape, L))

    def step(acc, a_i):
        # acc: [.., L+1] redundant; a_i: [..] one limb of a
        p = a_i[..., None] * b  # [.., L] full 32-bit products
        acc = acc.at[..., :L].add(p & _MASK)
        acc = acc.at[..., 1 : L + 1].add(p >> LIMB_BITS)
        m = (acc[..., 0] * np0) & _MASK
        mn = m[..., None] * n
        acc = acc.at[..., :L].add(mn & _MASK)
        acc = acc.at[..., 1 : L + 1].add(mn >> LIMB_BITS)
        # divide by 2^16: shift down one limb, propagating the carry of limb 0
        carry0 = acc[..., 0] >> LIMB_BITS
        acc = jnp.concatenate(
            [acc[..., 1:], jnp.zeros((*acc.shape[:-1], 1), _U32)], axis=-1
        )
        acc = acc.at[..., 0].add(carry0)
        return acc, None

    acc0 = jnp.zeros((*shape, L + 1), dtype=_U32)
    if _unroll_carries():
        # same body, Python-unrolled: straight-line tensor-slice ops
        acc = acc0
        for i in range(L):
            acc, _ = step(acc, a[..., i])
        return _finalize_cios(ctx, acc)
    acc, _ = jax.lax.scan(step, acc0, jnp.moveaxis(a, -1, 0))
    return _finalize_cios(ctx, acc)


def mont_sqr(ctx: ModCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


def reduce_wide(ctx: ModCtx, t: jnp.ndarray) -> jnp.ndarray:
    """Redundant [.., M] limbs (M <= 2L, value < N*R, limbs < 2^32-2^16)
    -> value mod N.

    Used after redundant accumulations (segment sums, dot products).
    """
    L = ctx.L
    t = normalize(t, 2 * L)
    low = mont_reduce(ctx, t)  # t * R^-1 mod N
    return mont_mul(ctx, low, jnp.asarray(ctx.r2_limbs))  # * R^2 * R^-1 = t mod N


def to_mont(ctx: ModCtx, x: jnp.ndarray) -> jnp.ndarray:
    from .pallas import routing as _routing

    if _routing.use_pallas():
        # one fused Pallas mont-mul by R^2 — the XLA CIOS chain below costs
        # minutes of remote compile per shape on TPU
        return _routing.binop("mul", ctx, x, jnp.asarray(ctx.r2_limbs)[None, :])
    return mont_mul(ctx, x, jnp.asarray(ctx.r2_limbs))


def from_mont(ctx: ModCtx, x: jnp.ndarray) -> jnp.ndarray:
    from .pallas import routing as _routing

    if _routing.use_pallas():
        # mont_mul(x, 1) = x * R^-1 = canonical form, as one fused kernel
        one = np.zeros(ctx.L, dtype=np.uint32)
        one[0] = 1
        return _routing.binop("mul", ctx, x, jnp.asarray(one)[None, :])
    return mont_reduce(ctx, normalize(x, 2 * ctx.L))


def pow_const(ctx: ModCtx, x: jnp.ndarray, exp_bits: np.ndarray) -> jnp.ndarray:
    """x^e (Montgomery in/out) for a static exponent given as MSB-first bits."""
    bits = jnp.asarray(exp_bits)
    one = jnp.broadcast_to(jnp.asarray(ctx.one_limbs), x.shape)

    def body(i, acc):
        acc = mont_sqr(ctx, acc)
        mul = mont_mul(ctx, acc, x)
        return jnp.where((bits[i] == 1), mul, acc)

    return jax.lax.fori_loop(0, bits.shape[0], body, one)


def inv_mod(ctx: ModCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Fermat inversion (Montgomery in/out); maps 0 -> 0 like batch_inversion."""
    return pow_const(ctx, x, ctx.inv_exp_bits)


def is_zero(ctx: ModCtx, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(x == 0, axis=-1)


def eq(ctx: ModCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field select; cond has the batch shape (no limb axis)."""
    return jnp.where(cond[..., None], a, b)


def modsum(ctx: ModCtx, x: jnp.ndarray, chunk: int = 1 << 12) -> jnp.ndarray:
    """Sum over axis 0 of [n, L] normalized limbs -> [L] canonical limbs."""
    n = x.shape[0]
    if n == 0:
        return zeros(ctx)
    while n > 1:
        c = min(chunk, n)
        pad = (-n) % c
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            n += pad
        x = x.reshape(n // c, c, ctx.L).sum(axis=1)  # limbs < c * 2^16 <= 2^28
        x = normalize(x, ctx.L + 2)
        x = reduce_wide(ctx, x)
        n = x.shape[0]
    return x[0]
