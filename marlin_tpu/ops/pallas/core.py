"""In-kernel Montgomery limb arithmetic for Pallas TPU kernels.

The compute layout every marlin_tpu Pallas kernel uses is **limb-major**:
an element batch is a `[L, rows, 128]` uint32 array, so each limb plane
`x[i]` is a `(rows, 128)` tile that fills the VPU's sublane x lane grid.
(The public `[n, L]` layout puts the 16-limb axis in the 128-wide lane
dimension — measured 8-12x slower on v5e for the same CIOS schedule.)

These are plain traced functions meant to be *composed inside* kernels
(NTT stages, Jacobian adds), not pallas_calls themselves; the callable
kernels live in field.py / ntt.py / curve.py.

Functional equivalence target: ops/bigint.py (the XLA path) — both
implement the CIOS Montgomery schedule of ark-ff's MontBackend
(reference arkworks dependency, SURVEY.md §2b row 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..limbs import LIMB_BITS, LIMB_MASK


def mod_consts(ctx):
    """Static (n_limbs tuple, np0) for a bigint.ModCtx — bake into kernels."""
    n_tuple = tuple(int(x) for x in ctx.n_limbs)
    np0 = int(ctx.nprime) & LIMB_MASK
    return n_tuple, np0


def mm_mul_cios(a, b, n_tuple, np0):
    """Montgomery product of [L, ...] stacked limb planes — interleaved
    CIOS as a fori_loop with a tuple-of-tiles carry.

    This is the round-4 production form.  The tensorized variant below
    (mm_mul_tensor) traces fast but its shear-reshape diagonal sums and
    per-step concatenates compile to heavy Mosaic data movement (~25x the
    ALU floor at runtime).  Here each loop step is pure elementwise tile
    arithmetic on a rotating tuple of [...]-shaped u32 accumulators: the
    body traces once (~10L ops), Mosaic emits a real loop (small code,
    fast compile), and runtime op count sits at the schoolbook floor
    (~10L² lane-ops per element).

    Column-overflow analysis: each physical column receives ≤ 4 sub-2^16
    contributions per step over ≤ L steps plus retired-column carries —
    < 2^23 per u32 accumulator for L ≤ 48, so no inner carry passes are
    needed; _finalize propagates once and applies the conditional
    subtract.  Reduced output < N for canonical inputs (ark-ff MontBackend
    CIOS parity, same as ops/bigint.py)."""
    import jax

    L = len(n_tuple)
    shape = a.shape[1:]
    zero = jnp.zeros(shape, jnp.uint32)
    bs = tuple(b[j] for j in range(L))

    # Mosaic cannot dynamic-slice VALUES inside the loop, so the a-limbs
    # ride in the carry and rotate one position per step (a static pytree
    # permutation — free at runtime).
    def body(_, carry):
        arot, acc = carry
        ai = arot[0]
        acc = list(acc)
        for j in range(L):
            p = ai * bs[j]
            acc[j] = acc[j] + (p & LIMB_MASK)
            acc[j + 1] = acc[j + 1] + (p >> LIMB_BITS)
        m = ((acc[0] & LIMB_MASK) * jnp.uint32(np0)) & LIMB_MASK
        for j in range(L):
            q = m * jnp.uint32(n_tuple[j])
            acc[j] = acc[j] + (q & LIMB_MASK)
            acc[j + 1] = acc[j + 1] + (q >> LIMB_BITS)
        acc[1] = acc[1] + (acc[0] >> LIMB_BITS)
        return arot[1:] + (arot[0],), tuple(acc[1:]) + (zero,)

    a0 = tuple(a[i] for i in range(L))
    _, acc = jax.lax.fori_loop(
        0, L, body, (a0, tuple(zero for _ in range(L + 1)))
    )
    return _finalize(list(acc), n_tuple)


def mm_mul_tensor(a, b, n_tuple, np0):
    """Montgomery product of [L, ...] stacked limb planes.

    Tensorized schoolbook + separated Montgomery reduction (same math as
    the classic CIOS schedule — identical reduced outputs).  The fully
    unrolled per-(i,j) form traced ~200 jnp ops per CIOS step (~4.8k per
    mul, ~170 s to trace ONE bucket-fold kernel); here the partial-product
    grid is one broadcast multiply and the diagonal spreads are L sliced
    adds, ~25x fewer traced ops for the same arithmetic.

    Bounds: column sums take ≤ 2L sub-2^16 contributions from the product
    grid plus ≤ L+2 from the reduction — < 2^23 per u32 position, no inner
    carry pass needed; one fused finalize handles carries + the
    conditional subtract.
    """
    import jax

    L = len(n_tuple)
    shape = a.shape[1:]
    nb = len(shape)
    # partial-product grid: P[i, j] = a_i * b_j  (one broadcast multiply)
    p = a[:, None] * b[None]
    lo = p & LIMB_MASK
    hi = p >> LIMB_BITS

    # anti-diagonal sums W[k] = Σ_{i+j=k} m[i, j] via the shear trick:
    # pad rows to 2L, drop the last L entries of the joint flatten, and
    # reshape [L, 2L-1] — element (i, j) lands in column i+j; one sum.
    def diag_sum(m):
        mp = jnp.pad(m, ((0, 0), (0, L)) + ((0, 0),) * nb)
        flat = mp.reshape((2 * L * L,) + shape)[: 2 * L * L - L]
        sheared = flat.reshape((L, 2 * L - 1) + shape)
        # Mosaic lacks unsigned reductions; values < 2^22 fit int32 exactly
        return sheared.astype(jnp.int32).sum(axis=0).astype(jnp.uint32)

    w = jnp.pad(diag_sum(lo), ((0, 2),) + ((0, 0),) * nb)  # [2L+1, ...]
    w = w + jnp.pad(diag_sum(hi), ((1, 1),) + ((0, 0),) * nb)

    # Montgomery reduction: clear one low position per step.  The modulus
    # limb plane is built from an iota + scalar selects — COMPUTED values,
    # not a captured array constant (which pallas_call rejects); XLA folds
    # it to a constant at compile time.
    idx = jax.lax.broadcasted_iota(jnp.uint32, (L,) + (1,) * nb, 0)
    n_arr = jnp.zeros_like(idx)
    for j, v in enumerate(n_tuple):
        n_arr = jnp.where(idx == j, jnp.uint32(v), n_arr)
    zero1 = jnp.zeros((1,) + shape, jnp.uint32)
    for s in range(L):
        m = ((w[s] & LIMB_MASK) * jnp.uint32(np0)) & LIMB_MASK
        mn = m[None] * n_arr
        add = jnp.concatenate([mn & LIMB_MASK, zero1]) + jnp.concatenate(
            [zero1, mn >> LIMB_BITS]
        )
        win = w[s : s + L + 1] + add
        # position s is now ≡ 0 mod 2^16; push its carry up and retire it
        win = jnp.concatenate(
            [win[:1], win[1:2] + (win[0] >> LIMB_BITS)[None], win[2:]]
        )
        # Mosaic rejects zero-size concat operands: drop the empty head at s=0
        parts = ([w[:s]] if s > 0 else []) + [win, w[s + L + 1 :]]
        w = jnp.concatenate(parts)
    acc = [w[L + i] for i in range(L)] + [w[2 * L]]
    return _finalize(acc, n_tuple)


# production selector: the fori-CIOS form (MARLIN_TPU_MULV=tensor reverts)
def mm_mul(a, b, n_tuple, np0):
    import os

    if os.environ.get("MARLIN_TPU_MULV") == "tensor":
        return mm_mul_tensor(a, b, n_tuple, np0)
    return mm_mul_cios(a, b, n_tuple, np0)


def _finalize(acc, n_tuple):
    """Redundant [L+1] accumulator (< 2N) -> normalized reduced [L] planes.

    One pass computes the carry-propagated limbs and the borrow chain of
    (value - N); a final select picks the representative < N.
    """
    L = len(n_tuple)
    acc = list(acc) if isinstance(acc, (list, tuple)) else [acc[i] for i in range(acc.shape[0])]
    shape = acc[0].shape
    n_pad = tuple(n_tuple) + (0,)
    carry = jnp.zeros(shape, jnp.uint32)
    borrow = jnp.zeros(shape, jnp.int32)
    limbs_l, diffs_l = [], []
    for i in range(L + 1):
        s = acc[i] + carry
        limb = s & LIMB_MASK
        carry = s >> LIMB_BITS
        d = limb.astype(jnp.int32) - jnp.int32(n_pad[i]) - borrow
        borrow = (d < 0).astype(jnp.int32)
        limbs_l.append(limb)
        diffs_l.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    limbs = jnp.stack(limbs_l, axis=0)
    diffs = jnp.stack(diffs_l, axis=0)
    return jnp.where((borrow != 0)[None], limbs, diffs)[:L]


def mm_sqr(a, n_tuple, np0):
    return mm_mul(a, a, n_tuple, np0)


def mm_add(a, b, n_tuple):
    """(a + b) mod N over [L, ...] planes."""
    s = a + b
    acc = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], jnp.uint32)], axis=0)
    return _finalize(acc, n_tuple)


def mm_sub(a, b, n_tuple):
    """(a - b) mod N over [L, ...] planes."""
    L = len(n_tuple)
    shape = a.shape[1:]
    borrow = jnp.zeros(shape, jnp.int32)
    diffs = []
    for i in range(L):
        d = a[i].astype(jnp.int32) - b[i].astype(jnp.int32) - borrow
        borrow = (d < 0).astype(jnp.int32)
        diffs.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    # if borrowed, add N back (cannot re-borrow: diff + N < 2^(16L))
    carry = jnp.zeros(shape, jnp.uint32)
    underflow = borrow != 0
    outs = []
    for i in range(L):
        s = diffs[i] + jnp.where(underflow, jnp.uint32(n_tuple[i]), jnp.uint32(0)) + carry
        outs.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(outs, axis=0)


def mm_dbl(a, n_tuple):
    return mm_add(a, a, n_tuple)


def mm_select(cond, a, b):
    """cond has the batch shape (no limb axis); selects per element."""
    return jnp.where(cond[None], a, b)


def mm_is_zero(a):
    return jnp.all(a == 0, axis=0)
